package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * runtime skew-join split cannot help (e.g. the skew is in a single key
  * whose partition exceeds every split threshold, or AQE is disabled by
  * an exchange-reuse constraint).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, saltFactor) derived from `saltSrc` (any column that varies within
  * a key — a row id, an event id); the other side is replicated once per
  * salt value. The join key becomes (keys..., salt), so one hot key's
  * rows spread across `saltFactor` reducers instead of one. Replication
  * multiplies the small side by saltFactor — size it like a broadcast
  * times saltFactor, and prefer an actual broadcast when the small side
  * fits (q23); salting is for the middle ground where neither broadcast
  * nor a single reducer works.
  *
  * Result is row-identical to `big.join(small, keys)` (SkewJoinSpec + the
  * q90 oracle prove it).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSrc: Column, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val salted = big.withColumn("__salt", pmod(hash(saltSrc), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
