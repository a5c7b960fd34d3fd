package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `heavy_hitters(term, k)` — mergeable Misra-Gries heavy-hitters
  * sketch: at most `k` (term, weight) counters per aggregation buffer,
  * merged across partitions like sum(). Returns ARRAY<STRUCT<term,
  * weight>> sorted by (weight DESC, term) — weights are LOWER BOUNDS on
  * true frequency.
  *
  * Guarantees (Misra-Gries 1982; merge from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): over n rows, every counter undercounts its
  * term by at most n/(k+1), so every term with true frequency >
  * n/(k+1) is PRESENT in the result regardless of partitioning or merge
  * order. Which sub-threshold stragglers also appear (and their exact
  * lower bounds) IS merge-order-dependent — the price of a bounded
  * buffer — so oracle-compared queries must run in the EXACT regime:
  * when a group carries at most k distinct terms, no eviction ever
  * fires, every weight equals the true count, and the output is
  * deterministic (HeavyHittersSpec proves both regimes).
  *
  * Why this aggregate exists: hot-key detection. The skew toolkit
  * ([[graft.operators.SkewJoin]], AQE skew splits) needs the hot keys
  * BEFORE choosing a salt or a broadcast — a full groupBy-count of a
  * 100 TB join column costs a vocabulary-sized shuffle, while this
  * sketch finds every key above a 1/(k+1) share in one pass with k
  * counters per partition and a k-row exchange.
  *
  * Update is O(1) amortized (the decrement-all eviction credits against
  * prior inserts); merge is O(k log k) via the (k+1)-th largest offset.
  * NULL terms are ignored, like count(col).
  */
case class HeavyHittersAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr
  override def prettyName: String = "heavy_hitters"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) if kExpr.foldable =>
        val k = kExpr.eval(null)
        if (k != null && k.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"heavy_hitters: k must be >= 1, got $k")
      case _ => TypeCheckResult.TypeCheckFailure(
        "heavy_hitters requires (STRING, foldable INT k)")
    }

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < k => buf.update(term, 1L)
        case None => // full: decrement every counter, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight from everything, drop <= 0:
      // at most k survive, each reduced by <= the mass a decrement-based
      // eviction would have charged (the PODS'12 merge)
      val weights = b1.values.toArray
      java.util.Arrays.sort(weights)
      val offset = weights(weights.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - offset)
      b1.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHittersAgg =
    copy(child = newLeft, kExpr = newRight)
}
