package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `minhash_agg(sigs)` — the engine's custom mergeable AGGREGATE
  * (the Catalyst tier above scalar expressions): folds per-document
  * minhash signature arrays (from `minhash_sigs`) into one group-level
  * signature by element-wise minimum.
  *
  * Why an aggregate and not an expression: the signature of a UNION of
  * shingle sets is the element-wise min of the members' signatures — so
  * this buffer is a constant-size (12-slot) MERGEABLE sketch. partial
  * states combine associatively on executors exactly like sum();
  * group-level near-dup estimation over 100 TB costs one hash exchange
  * of 12 short strings per group, never re-touching the documents.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] with UnaryLike[Expression] {

  private val Slots = 12

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("minhash_agg requires ARRAY<STRING>")
  }

  override def createAggregationBuffer(): Array[String] = new Array[String](Slots)

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), Slots)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val s = arr.getUTF8String(j).toString
          if (buf(j) == null || s < buf(j)) buf(j) = s
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var j = 0
    while (j < Slots) {
      if (b2(j) != null && (b1(j) == null || b2(j) < b1(j))) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach { s =>
      out.writeBoolean(s != null)
      if (s != null) out.writeUTF(s)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(Slots)(if (in.readBoolean()) in.readUTF() else null)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
