package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Mergeable Bloom filter: the membership sketch that lets an
  * incremental dedup pass test "was this content ever seen before?"
  * against a multi-billion-row history WITHOUT joining the history —
  * only the (tiny, constant-size) filter travels.
  *
  * Layout of the BINARY value (also the shuffle serialization):
  * 4 bytes m (number of bits, big-endian int), 4 bytes k (number of
  * probes), then ⌈m/8⌉ filter bytes; bit i lives at byte `i >>> 3`,
  * mask `1 << (i & 7)`. Probes use Kirsch–Mitzenmacher double hashing
  * (h1 + i·h2 with h2 = murmur3 fmix64(h1)), so the only per-row input
  * is one 64-bit hash — pair with `xxhash64(text)`.
  *
  * Determinism: bit-setting is idempotent and merge is bytewise OR —
  * commutative and associative — so the aggregated filter is
  * BIT-IDENTICAL under any partitioning or merge order (unlike
  * `df.stat.bloomFilter`, which is driver-side and untyped here).
  *
  * 100 TB sizing: the filter is m/8 bytes regardless of input rows —
  * 10⁹ keys at 1% FP need m ≈ 9.6·10⁹ bits ≈ 1.2 GB, at which point
  * one filter still broadcasts but the two-phase collect should become
  * per-key-range partitioned filters (one bloom per bucket of a
  * pre-bucketed history), which this aggregate already supports via
  * groupBy(bucket).
  */
object BloomOps {
  /** murmur3 64-bit finalizer (public-domain constants) — decorrelates
    * the probe stride from the raw hash. */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  def bitPos(hash: Long, probe: Int, m: Int): Long =
    ((hash + probe.toLong * fmix64(hash)) & Long.MaxValue) % m.toLong

  def setBit(bytes: Array[Byte], headerOff: Int, pos: Long): Unit = {
    val idx = headerOff + (pos >>> 3).toInt
    bytes(idx) = (bytes(idx) | (1 << (pos & 7).toInt)).toByte
  }

  def getBit(bytes: Array[Byte], headerOff: Int, pos: Long): Boolean = {
    val idx = headerOff + (pos >>> 3).toInt
    (bytes(idx) & (1 << (pos & 7).toInt)) != 0
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  /** The per-row probe: k bit reads on the serialized filter — O(k)
    * regardless of filter size, no deserialization, no allocation. */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    val m = readInt(filter, 0)
    val k = readInt(filter, 4)
    var i = 0
    while (i < k) {
      if (!getBit(filter, 8, bitPos(hash, i, m))) return false
      i += 1
    }
    true
  }
}

/** SQL `bloom_agg(hash, m, k)` — mergeable Bloom-filter aggregate over a
  * BIGINT hash column; `m` (bits) and `k` (probes) must be foldable.
  * Returns the serialized filter (see [[BloomOps]] for the layout). */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numProbes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 8 == 0, s"bloom_agg: m must be a positive multiple of 8, got $numBits")
  require(numProbes > 0 && numProbes <= 32, s"bloom_agg: k must be in [1,32], got $numProbes")

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT hash input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](8 + numBits / 8)
    BloomOps.writeInt(buf, 0, numBits)
    BloomOps.writeInt(buf, 4, numProbes)
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numProbes) {
        BloomOps.setBit(buf, 8, BloomOps.bitPos(h, i, numBits))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 8
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** SQL `bloom_contains(filter, hash)` — k bit probes against a
  * serialized [[BloomAgg]] filter; whole-stage-codegen'd so the
  * incoming-batch pre-filter scan stays fused. No false negatives by
  * construction; false positives at the configured m/k rate. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (BINARY, BIGINT), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(f: Any, h: Any): Any =
    BloomOps.mightContain(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, h) =>
      s"${ev.value} = graft.functions.BloomOps.mightContain($f, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** Driver-side handle table behind `bloom_contains_bcast(id, hash)`.
  *
  * A filter big enough to matter (100 MB-GB for 10⁸-10⁹ history keys)
  * must NOT travel as a plan literal — a literal is serialized into
  * every task binary and re-deserialized per task, while a
  * `Broadcast[Array[Byte]]` ships once per executor over the torrent
  * protocol and is shared by every task on it. SQL function builders
  * can only receive Expressions, so the broadcast is parked here under
  * an INT handle and the handle travels as the (tiny) literal; the
  * builder resolves it back at analysis time, which always runs on the
  * driver.
  *
  * Lifetime: the table holds a STRONG reference from [[register]]
  * until the first [[lookup]] — BroadcastManager/ContextCleaner track
  * a `TorrentBroadcast` only weakly, so without this pin a GC inside
  * the register→analysis window (widest in the bucketed path, whose
  * loop collects GB-scale filters while registering — peak GC
  * pressure) could reclaim the broadcast before the plan ever resolves
  * it. Dataset construction analyzes eagerly, so the first lookup IS
  * plan resolution: from then on the resolved [[BloomContainsBcast]]
  * holds the strong reference and the table downgrades to a weak one,
  * letting the ContextCleaner reclaim executor blocks once every plan
  * referencing the filter is unreferenced — exactly like checkpoint
  * blocks. A per-micro-batch caller (the streaming ingest loop) thus
  * cannot accumulate dead filters — PROVIDED every registered handle is
  * eventually resolved or released: a handle whose plan is never
  * constructed (an exception between register and Dataset construction)
  * stays strongly pinned forever, invisible to the purge loop. The
  * registering operators therefore [[release]] on that error path
  * (try/catch around register→plan-construction); [[release]] also
  * remains for eager, deterministic teardown. */
object BloomBroadcasts {
  private final class Slot(
      @volatile var strong: Broadcast[Array[Byte]],
      val weak: java.lang.ref.WeakReference[Broadcast[Array[Byte]]])
  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)
  private val live = new java.util.concurrent.ConcurrentHashMap[Int, Slot]()

  def register(b: Broadcast[Array[Byte]]): Int = {
    // purge entries whose broadcast has been collected (cheap: table is
    // handles-sized, and register is a per-FILTER event, not per-row)
    live.forEach((k, s) =>
      if (s.strong == null && s.weak.get == null) live.remove(k): Unit)
    val id = ids.incrementAndGet()
    live.put(id, new Slot(b, new java.lang.ref.WeakReference(b)))
    id
  }

  def lookup(id: Int): Broadcast[Array[Byte]] = {
    val slot = live.get(id)
    val b =
      if (slot == null) null
      else { val s = slot.strong; if (s != null) s else slot.weak.get }
    require(b != null, s"bloom_contains_bcast: no filter registered under handle $id")
    // The caller (the resolved expression in an eagerly-analyzed plan)
    // now holds the strong reference; drop ours so abandoned plans can
    // be reclaimed. Re-lookups keep working through the weak ref while
    // any plan is alive.
    slot.strong = null
    b
  }

  /** Test hook: slots still holding the register-time strong pin (i.e.
    * registered but never resolved or released). */
  private[graft] def pinnedCount: Int = {
    var n = 0
    live.forEach((_, s) => if (s.strong != null) n += 1)
    n
  }

  /** Drop the handle AND the executor-side blocks eagerly. Only call
    * once every plan referencing the handle has finished executing. */
  def release(id: Int): Unit = {
    val slot = live.remove(id)
    if (slot != null) {
      val b = { val s = slot.strong; if (s != null) s else slot.weak.get }
      slot.strong = null
      if (b != null) b.destroy()
    }
  }
}

/** `bloom_contains_bcast(handle, hash)` after analysis: the probe of
  * [[BloomContains]] with the filter carried by a broadcast variable
  * instead of a literal. The expression serializes as the broadcast
  * STUB (an id + block manager coordinates, ~100 bytes) regardless of
  * filter size; `.value` on the executor fetches the blocks once and
  * every probe thereafter is the same k bit-reads, whole-stage
  * codegen'd with the bytes cached in a generated-class field. */
case class BloomContainsBcast(bcast: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "bloom_contains_bcast"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_bcast requires a BIGINT hash input, got ${t.simpleString}")
  }

  @transient private lazy val filter: Array[Byte] = bcast.value

  override def nullSafeEval(h: Any): Any =
    BloomOps.mightContain(filter, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBcast", bcast,
      classOf[Broadcast[Array[Byte]]].getName)
    val bytes = ctx.addMutableState("byte[]", "bloomBcastBytes",
      v => s"$v = (byte[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomOps.mightContain($bytes, $h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsBcast =
    copy(child = newChild)
}
