package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builders — the lakehouse primitive that
  * turns an append-only change log (CDC stream, event feed) into a
  * versioned dimension with validity intervals, the Type 2 pattern of
  * Kimball's dimensional modeling.
  *
  * Everything is keyed-window work (`PARTITION BY key ORDER BY ts,
  * tie`): at 100 TB the shuffle is one exchange on the dimension key —
  * the same partitioning a MERGE-based SCD implementation needs — and
  * no window is ever unpartitioned. Pair with `StreamingUpsert` for the
  * Type 1 (overwrite) variant of the same feed. */
object Scd {

  /** Build a Type 2 dimension from a change log.
    *
    *  - consecutive rows with UNCHANGED tracked attributes collapse into
    *    one version (a CDC feed re-sends full rows; only real changes
    *    open a new version);
    *  - `valid_from` = the change's timestamp; `valid_to` = the next
    *    change's timestamp (half-open intervals, the Kimball
    *    convention) or NULL for the current version;
    *  - `is_current` flags the open version;
    *  - `tieCol` (a unique id) makes same-timestamp updates
    *    deterministic and gives the output a total order.
    *
    * Attribute comparison is NULL-safe (`<=>` on a struct of the tracked
    * columns): a NULL attribute value is a value, not a wildcard.
    * Output: key, tieCol, the tracked attributes, valid_from, valid_to,
    * is_current. */
  def scd2(changeLog: DataFrame, keyCol: String, attrCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2: at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val attrs: Column = struct(attrCols.map(col): _*)
    val changes = changeLog
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(!(col("__prev") <=> attrs))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(keyCol, tieCol) ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }
}
