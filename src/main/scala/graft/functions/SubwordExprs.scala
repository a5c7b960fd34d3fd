package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled wordpiece vocabulary for [[SubwordStats]]: pieces bucketed by
  * first character, longest-first within a bucket, so the inner loop's
  * FIRST prefix match is the greedy longest match. Built once per task
  * (codegen reference object), reused across all rows.
  */
final class SubwordVocab(pieces: Array[String], val maxWordLen: Int) extends Serializable {
  require(pieces.nonEmpty && pieces.forall(p => p.nonEmpty && p.forall(c => c >= 'a' && c <= 'z')),
    "SubwordVocab: lowercase-ASCII pieces only")
  private val byChar: Array[Array[String]] = {
    val m = new Array[Array[String]](26)
    pieces.groupBy(_.charAt(0)).foreach { case (c, ps) =>
      m(c - 'a') = ps.sortBy(-_.length)
    }
    m
  }

  /** [n_words, n_subwords, n_unk] for one document's word array — the
    * same greedy longest-match walk as the dialect-template HOF fold
    * (TextAnalysis.subwordTokExpr), as one fused JVM loop.
    *
    * NULL array elements are IGNORED entirely (a NULL word is no word —
    * it counts toward none of the three outputs); the pipeline's own
    * split-of-coalesced-text input never produces one, but the function
    * is a public session SQL function, so arbitrary arrays must not NPE
    * (round-5 advice).
    *
    * The walk is CODE-POINT based — truncation, UNK stepping, and
    * position arithmetic all advance by code point, not UTF-16 unit —
    * matching the dialect template's substr/length semantics (both
    * engines' substr/length count code points), so words containing
    * supplementary-plane characters produce identical counts on the
    * Spark and DuckDB sides (round-5 advice). Vocab pieces are
    * lowercase-ASCII (class contract), so an ASCII prefix match at a
    * code-point boundary never straddles a surrogate pair. */
  def stats(words: ArrayData): ArrayData = {
    val n = words.numElements()
    var nWords = 0L
    var cnt = 0L
    var unk = 0L
    var i = 0
    while (i < n) {
      val u = words.getUTF8String(i) // null when the array slot is NULL
      if (u != null) {
        nWords += 1
        var w = u.toString
        if (w.codePointCount(0, w.length) > maxWordLen)
          w = w.substring(0, w.offsetByCodePoints(0, maxWordLen))
        var pos = 0
        while (pos < w.length) {
          val c = w.charAt(pos)
          var bestLen = 0
          if (c >= 'a' && c <= 'z') {
            val cands = byChar(c - 'a')
            if (cands != null) {
              var j = 0
              while (j < cands.length && bestLen == 0) {
                if (w.startsWith(cands(j), pos)) bestLen = cands(j).length
                j += 1
              }
            }
          }
          cnt += 1
          if (bestLen == 0) { unk += 1; pos += Character.charCount(w.codePointAt(pos)) }
          else pos += bestLen
        }
      }
      i += 1
    }
    new GenericArrayData(Array(nWords, cnt, unk))
  }
}

/** SQL `subword_stats(words, vocab, max_word_len)` →
  * ARRAY<BIGINT>[n_words, n_subwords, n_unk].
  *
  * The native twin of TextAnalysis.subwordTokExpr's HOF fold: identical
  * greedy longest-match semantics (SubwordSpec proves equivalence on the
  * real corpus; the q101 DuckDB gate re-proves it cross-engine every
  * round), but one codegen'd JVM loop per row instead of interpreted
  * lambda steps — the same drop-in-acceleration contract as simhash32.
  * `vocab` and `max_word_len` must be foldable (vocabulary is compiled
  * once, not per row); words is the already-split lowercase token array.
  */
case class SubwordStats(words: Expression, vocab: Expression, maxLen: Expression)
    extends TernaryExpression {
  override def first: Expression = words
  override def second: Expression = vocab
  override def third: Expression = maxLen
  override def prettyName: String = "subword_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, vocab.dataType, maxLen.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType)
          if vocab.foldable && maxLen.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "subword_stats requires (ARRAY<STRING>, foldable ARRAY<STRING>, foldable INT)")
    }

  @transient private lazy val compiled: SubwordVocab = {
    val arr = vocab.eval(null).asInstanceOf[ArrayData]
    val pieces = (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toArray
    new SubwordVocab(pieces, maxLen.eval(null).asInstanceOf[Int])
  }

  override def nullSafeEval(w: Any, v: Any, m: Any): Any =
    compiled.stats(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", compiled, classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) => s"${ev.value} = $ref.stats($w);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SubwordStats =
    copy(words = newFirst, vocab = newSecond, maxLen = newThird)
}
