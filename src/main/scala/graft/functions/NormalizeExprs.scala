package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as native codegen'd expressions.
  *
  * Every text-dedup pipeline normalizes before hashing: the precomposed
  * `é` (U+00E9) and the decomposed `e`+U+0301 are the SAME document to a
  * reader but different bytes to md5/minhash/simhash, so un-normalized
  * corpora leak visually-identical near-dups straight through every
  * hash-keyed operator in [[graft.operators.Dedup]]. Spark ships no
  * Unicode-normalization function (collation support normalizes for
  * COMPARISON, but no expression exposes the normalized STRING), so this
  * is tier (b) of the Catalyst ladder: a scalar `UnaryExpression` with
  * `doGenCode`, not a UDF.
  *
  * Scale shape: the hot path is the ASCII fast-scan — real pretraining
  * corpora are overwhelmingly ASCII, and an all-ASCII string is already
  * normalized under all four forms (and accent-free), so the common row
  * costs one branchy byte loop and ZERO allocation (the input
  * `UTF8String` is returned as-is). Non-ASCII rows pay
  * `Normalizer.isNormalized` (cheap quick-check pass) before the
  * allocating `normalize` call.
  *
  * Oracle parity: `nfc_normalize` matches DuckDB's `nfc_normalize()` —
  * both implement UAX#15 NFC, so byte-identical on ALL inputs.
  * `strip_accents` (NFD + drop combining marks U+0300..U+036F and the
  * general-category Mn set, no recompose) matches DuckDB's
  * `strip_accents()` on Latin/Greek/Cyrillic accent marks; scripts where
  * utf8proc's STRIPMARK diverges from Java's Mn classification (rare
  * historic marks) are outside the gated envelope — q142 constrains its
  * input accordingly.
  */
object UnicodeNorm {
  private def allAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) { if ((s.getByte(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  private def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (allAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKD)

  /** NFD-decompose, then drop every nonspacing mark (category Mn). The
    * base letters keep their decomposed form only where a mark was
    * removed between them and nothing recomposes — for accent-folding
    * (é→e, ñ→n, ü→u) the result is plain letters, matching DuckDB. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (allAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val out = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) out.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}

private[functions] abstract class UnicodeNormBase extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING")
  protected def method: String
  override def nullSafeEval(s: Any): Any = evalUtf8(s.asInstanceOf[UTF8String])
  protected def evalUtf8(s: UTF8String): UTF8String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.$method($c)")
}

/** SQL `nfc_normalize(str)` — Unicode NFC (canonical compose). */
case class NfcNormalize(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "nfc_normalize"
  override protected def method: String = "nfc"
  override protected def evalUtf8(s: UTF8String): UTF8String = UnicodeNorm.nfc(s)
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** SQL `nfkc_normalize(str)` — compatibility compose (ﬁ→fi, ①→1). */
case class NfkcNormalize(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "nfkc_normalize"
  override protected def method: String = "nfkc"
  override protected def evalUtf8(s: UTF8String): UTF8String = UnicodeNorm.nfkc(s)
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

/** SQL `strip_accents(str)` — accent folding (é→e, ü→u, ñ→n). */
case class StripAccents(child: Expression) extends UnicodeNormBase {
  override def prettyName: String = "strip_accents"
  override protected def method: String = "stripAccents"
  override protected def evalUtf8(s: UTF8String): UTF8String = UnicodeNorm.stripAccents(s)
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
