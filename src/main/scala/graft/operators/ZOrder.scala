package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — multi-dimensional data skipping
  * for plain-parquet tables, the capability a lakehouse exposes as
  * `OPTIMIZE ... ZORDER BY (a, b)`.
  *
  * Why it matters at 100 TB: parquet row-group/file pruning works off
  * per-file min/max ranges. A table sorted by ONE column prunes
  * perfectly on that column and not at all on any other; interleaving
  * the bits of several columns' ranks makes every file cover a small
  * HYPER-RECTANGLE of the key space, so selective predicates on ANY
  * z-ordered column skip most files (ZOrderSpec measures it: the same
  * box predicate touches a fraction of the z-ordered partitions vs all
  * of the linearly-sorted ones).
  *
  * Mechanics (all scale-shaped):
  *  1. per column, `QUANT_BITS`-bit quantization cutpoints from
  *     `approxQuantile` — a mergeable-sketch pass, driver receives only
  *     2^QUANT_BITS boundaries per column;
  *  2. rank lookup as a codegen'd `width_bucket`-style expression (the
  *     cutpoints travel as a literal array — no join, no UDF);
  *  3. bit interleave of the ranks into one LONG z-value, again pure
  *     expressions;
  *  4. `repartitionByRange(z)` + `sortWithinPartitions(z)` — one range
  *     shuffle, the same cost as any global sort rewrite.
  *
  * Skew honesty: equal-depth quantiles (not min/max scaling) make the
  * rank space uniform even when the raw values are Zipfian, so hot
  * values cannot concentrate the curve into a few files.
  */
object ZOrder {

  /** Bits per dimension: 8 → 256 equal-depth buckets per column, 65,536
    * z-cells — far more cells than any table has FILES, which is the
    * granularity min/max skipping works at; finer quantization would
    * only inflate the sketch pass and the rank expression. 2 dims × 8
    * bits fit a 16-bit z in a LONG. */
  val QuantBits = 8

  /** Interleave the low `bits` bits of two rank columns (a gets the even
    * bit positions, b the odd ones) — pure shift/and/or expressions,
    * fully codegen'd. */
  def interleave(a: Column, b: Column, bits: Int = QuantBits): Column =
    interleaveN(Seq(a, b), bits)

  /** N-column Morton interleave: column j's bit i lands at position
    * `N·i + j` (round-robin, so every column contributes equally to the
    * high bits — the property that makes per-column pruning symmetric).
    * Still pure shift/and/or, fully codegen'd. `N·bits` must fit a
    * LONG's 63 value bits. */
  def interleaveN(cols: Seq[Column], bits: Int = QuantBits): Column = {
    require(cols.size >= 2, s"interleaveN: at least two columns")
    require(cols.size * bits <= 63,
      s"interleaveN: ${cols.size} cols × $bits bits overflow a LONG")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (z, (c, j)) =>
        z.bitwiseOR(shiftleft(
          shiftrightunsigned(c, i).bitwiseAND(lit(1L)), cols.size * i + j))
      }
    }
  }

  /** Equal-depth rank of `c` against precomputed ascending cutpoints:
    * the count of cutpoints <= c, as a codegen'd literal-array scan
    * (2^QuantBits comparisons folded by filter+size — no join). */
  private def rankExpr(c: Column, cuts: Array[Double]): Column = {
    val arr = array(cuts.map(lit(_)).toIndexedSeq: _*)
    size(filter(arr, x => x <= c.cast("double"))).cast("long")
  }

  /** Z-value column for two numeric columns of `df`, quantized to
    * equal-depth ranks via one approxQuantile sketch pass per column. */
  def zValue(df: DataFrame, colA: String, colB: String): Column =
    zValueN(df, Seq(colA, colB))

  /** N-column z-value: per-column bit budget shrinks to keep the word
    * in a LONG (8 bits up to 7 columns is impossible — 63/N, capped at
    * [[QuantBits]]); one approxQuantile sketch pass per column computes
    * the equal-depth cutpoints. */
  def zValueN(df: DataFrame, colNames: Seq[String]): Column = {
    val bits = math.min(QuantBits, 63 / colNames.size)
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // relativeError 1/2^(bits+2): boundaries land within a quarter-bucket
    val err = 1.0 / (1 << (bits + 2))
    interleaveN(colNames.map { c =>
      rankExpr(col(c), dedupCuts(df.stat.approxQuantile(c, probs, err)))
    }, bits)
  }

  private def dedupCuts(cuts: Array[Double]): Array[Double] = cuts.distinct.sorted

  /** Rewrite `df` into a z-ordered layout: `numFiles` range partitions
    * of the z-value, rows z-sorted within each. Write the result with
    * one file per partition and min/max pruning works on BOTH columns. */
  def layout(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame =
    layoutN(df, Seq(colA, colB), numFiles)

  /** [[layout]] over N ≥ 2 columns: each output file covers a small
    * hyper-rectangle of EVERY clustered column's value space, so a
    * range predicate on any of them prunes (a linear sort only ever
    * prunes its leading column). */
  def layoutN(df: DataFrame, colNames: Seq[String], numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val z = zValueN(df, colNames)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
