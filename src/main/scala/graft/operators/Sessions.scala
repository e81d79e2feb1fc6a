package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time sessionization and bounded range (interval) self-join —
  * the two remaining event-analytics shapes a training/eventstream
  * pipeline needs beyond SURVEY.md §2 (which has only block-range
  * "windows").
  */
object Sessions {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapNanos`. Classic
    * lag → boundary flag → running sum; one hash shuffle by key.
    * Adds `session_id` (per-key ordinal, starting at 1). */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String,
      gapNanos: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val boundary = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gapNanos, 1L)
      .otherwise(lit(0L))
    df.withColumn("__b", boundary)
      .withColumn("session_id",
        sum(col("__b")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) + 1L)
      .drop("__b")
  }

  /** Bounded interval self-join: pairs of events of the same key within
    * `windowNanos` of each other (a_ts < b_ts ≤ a_ts + window).
    *
    * Scale shape: instead of a per-key cross join, both sides are bucketed
    * by floor(ts / window); a pair within the window is always in the same
    * or adjacent bucket, so the join key is (key, bucket) with the left
    * side exploded to [bucket, bucket+1] — candidate volume is
    * O(events × density), not O(events²), and the equi-join shuffles on a
    * narrow composite key. The exact predicate then prunes candidates. */
  def intervalSelfJoin(
      df: DataFrame, keyCol: String, idCol: String, tsCol: String,
      windowNanos: Long): DataFrame = {
    // integral division — double division loses integer precision on
    // epoch-nanos magnitudes (~1e18 > 2^53) and would mis-bucket edges
    val a = df.select(col(keyCol), col(idCol).as("id_a"), col(tsCol).as("ts_a"))
      .withColumn("bucket", explode(array(
        expr(s"ts_a div $windowNanos"), expr(s"ts_a div $windowNanos") + 1)))
    val bb = df.select(col(keyCol), col(idCol).as("id_b"), col(tsCol).as("ts_b"))
      .withColumn("bucket", expr(s"ts_b div $windowNanos"))
    a.join(bb, Seq(keyCol, "bucket"))
      .filter(col("ts_b") > col("ts_a") &&
        col("ts_b") <= col("ts_a") + windowNanos)
      .select(col(keyCol), col("id_a"), col("id_b"))
      .dropDuplicates(keyCol, "id_a", "id_b")
  }
}
