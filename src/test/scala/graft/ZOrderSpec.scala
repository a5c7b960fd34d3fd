package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Measures what Z-ordering is FOR: with per-file min/max ranges (what
  * parquet footers give a scan), a box predicate over two columns must
  * touch far fewer z-ordered files than files sorted by a single column
  * — and a predicate on the NON-sort column of a linear layout touches
  * everything, while the z-layout still skips most files. Correctness:
  * the layout is a pure rewrite (row multiset unchanged).
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private val Files = 16

  // deterministic 2-D uniform data (hash-derived, no RNG)
  private lazy val data = spark.range(20000).selectExpr(
    "id",
    "CAST(pmod(hash(id), 1000) AS BIGINT) AS x",
    "CAST(pmod(hash(id + 7919), 1000) AS BIGINT) AS y")

  /** Per-partition (file) min/max of both columns — the skipping index a
    * parquet reader would get from footers. */
  private def fileRanges(df: DataFrame): Array[(Long, Long, Long, Long)] =
    df.groupBy(spark_partition_id())
      .agg(min("x"), max("x"), min("y"), max("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def touched(ranges: Array[(Long, Long, Long, Long)],
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): Int =
    ranges.count { case (xmn, xmx, ymn, ymx) =>
      xmx >= xLo && xmn <= xHi && ymx >= yLo && ymn <= yHi }

  test("z-layout: box predicates skip most files; linear layout can't on its non-sort column") {
    val zed = ZOrder.layout(data, "x", "y", Files)
    val linear = data.repartitionByRange(Files, col("x")).sortWithinPartitions("x")
    val zRanges = fileRanges(zed)
    val xRanges = fileRanges(linear)
    assert(zRanges.length === Files && xRanges.length === Files)

    // 10%×10% box: z-order must touch a small fraction of files
    val zBox = touched(zRanges, 200, 300, 400, 500)
    assert(zBox <= Files / 2, s"z-order touched $zBox of $Files files")

    // y-only predicate (10% selectivity): x-sorted layout prunes NOTHING,
    // the z-layout still skips
    val linY = touched(xRanges, 0, 999, 400, 500)
    val zY = touched(zRanges, 0, 999, 400, 500)
    assert(linY === Files, s"x-sorted layout unexpectedly pruned on y ($linY)")
    assert(zY < linY, s"z-order must beat linear on the non-sort column: $zY vs $linY")

    // and x-predicates still prune too (z trades a little x-locality)
    val zX = touched(zRanges, 200, 300, 0, 999)
    assert(zX < Files, s"z-order lost all x pruning: $zX of $Files")
  }

  test("layout is a pure rewrite: row multiset unchanged") {
    val zed = ZOrder.layout(data, "x", "y", Files)
    assert(zed.columns.toSeq === data.columns.toSeq)
    val a = data.select("id", "x", "y").collect().map(_.toString).sorted
    val b = zed.select("id", "x", "y").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("interleave: known bit patterns") {
    import spark.implicits._
    // a=0b11, b=0b00 -> even positions set: 0b0101 = 5
    // a=0b00, b=0b11 -> odd positions set: 0b1010 = 10
    val out = Seq((3L, 0L), (0L, 3L), (3L, 3L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(5L, 10L, 15L))
  }

  test("interleaveN: 3-column round-robin bit layout; word-size guard") {
    import spark.implicits._
    // col j's bit i lands at 3i+j: a=1 -> bit0, b=1 -> bit1, c=1 -> bit2,
    // a=0b10 -> bit3, all-ones over 2 bits -> 0b111111 = 63
    val out = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 0L), (3L, 3L, 3L))
      .toDF("a", "b", "c")
      .select(ZOrder.interleaveN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 4L, 8L, 63L))
    intercept[IllegalArgumentException] {
      ZOrder.interleaveN(Seq(col("a")), 8)
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleaveN((1 to 8).map(_ => col("a")), 8) // 64 bits > 63
    }
  }

  test("3-column z-layout prunes on every clustered column") {
    val d3 = spark.range(20000).selectExpr(
      "id",
      "CAST(pmod(hash(id), 1000) AS BIGINT) AS x",
      "CAST(pmod(hash(id + 7919), 1000) AS BIGINT) AS y",
      "CAST(pmod(hash(id + 104729), 1000) AS BIGINT) AS w")
    // 64 files = 6 curve bits = 2 high bits (quarters) per column; a
    // low-corner 25% range sits inside one quarter and must prune
    val files3 = 64
    val zed = ZOrder.layoutN(d3, Seq("x", "y", "w"), files3)
    val ranges = zed.groupBy(spark_partition_id())
      .agg(min("x"), max("x"), min("y"), max("y"), min("w"), max("w"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(ranges.length === files3)
    def touchedOn(lo: Long, hi: Long, sel: ((Long, Long, Long, Long, Long, Long)) => (Long, Long)): Int =
      ranges.count { t => val (mn, mx) = sel(t); mx >= lo && mn <= hi }
    val tx = touchedOn(0, 230, t => (t._1, t._2))
    val ty = touchedOn(0, 230, t => (t._3, t._4))
    val tw = touchedOn(0, 230, t => (t._5, t._6))
    assert(tx < files3, s"x range pruned nothing ($tx)")
    assert(ty < files3, s"y range pruned nothing ($ty)")
    assert(tw < files3, s"w range pruned nothing ($tw)")
    // pure rewrite
    val a = d3.select("id").collect().map(_.getLong(0)).sorted
    val b = zed.select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }
}
