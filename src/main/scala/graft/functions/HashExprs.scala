package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash expressions for the dedup/fingerprint operators.
  *
  * These are drop-in accelerations of [[graft.queries.SparkSql]]'s
  * generated SQL: same md5-derived values bit-for-bit (the 59-query
  * DuckDB gate would catch any divergence), but one fused JVM loop per
  * row instead of interpreted higher-order-function lambdas — HOF bodies
  * never enter whole-stage codegen, so a per-token md5+parse pipeline
  * pays interpretation overhead per element; these don't.
  */
object HashUtil {
  private val digest = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 — identical rendering to SQL md5(). */
  def md5Hex(bytes: Array[Byte]): Array[Char] = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(h(i) & 0xf)
      i += 1
    }
    out
  }

  private def hexVal(c: Char): Long = if (c <= '9') c - '0' else c - 'a' + 10

  /** First 8 hex digits of md5 as an unsigned 32-bit value. */
  def md5U32(s: UTF8String): Long = {
    val hex = md5Hex(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 4) | hexVal(hex(i)); i += 1 }
    v
  }

  /** 32-bit majority simhash over token md5U32 hashes — mirrors
    * DedupQueries.simhashBound exactly. */
  def simhash32(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = md5U32(tokens.getUTF8String(i))
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 12 minhash signature slots as 8-hex-char strings — mirrors
    * DedupQueries.sigsExpr exactly: slot j = min over shingles of
    * md5(shingle#<j%3>) hex digits [ (j/3)*8, (j/3)*8+8 ). */
  def minhashSigs(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[String](12)
    var i = 0
    while (i < n) {
      val base = shingles.getUTF8String(i).toString
      var seed = 0
      while (seed < 3) {
        val hex = md5Hex(s"$base#$seed".getBytes("UTF-8"))
        var chunk = 0
        while (chunk < 4) {
          val s8 = new String(hex, chunk * 8, 8)
          val j = chunk * 3 + seed // slot with seed=j%3, chunk=j/3
          if (mins(j) == null || s8 < mins(j)) mins(j) = s8
          chunk += 1
        }
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }
}

/** SQL `md5_u32(str)` — the engine's 32-bit string hash. */
case class Md5U32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_u32"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("md5_u32 requires STRING")
  override def nullSafeEval(s: Any): Any = HashUtil.md5U32(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5U32($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5U32 =
    copy(child = newChild)
}

/** SQL `simhash32(array<string>)`. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("simhash32 requires ARRAY<STRING>")
  }
  override def nullSafeEval(a: Any): Any = HashUtil.simhash32(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** SQL `minhash_sigs(array<string>)` → array<string> of 12 slot minima. */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("minhash_sigs requires ARRAY<STRING>")
  }
  override def nullSafeEval(a: Any): Any = HashUtil.minhashSigs(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.minhashSigs($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
