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

  /** Cohort retention matrix: users are cohorted by their FIRST active
    * period (first event day, floored to `periodDays`-day periods) and
    * counted once per (cohort, offset) cell they are active in.
    *
    * Scale shape: ONE hash(user) shuffle serves the whole pipeline — the
    * first-touch agg, the join back, and the per-user cell dedup all
    * cluster on `user`, so Catalyst's subset rule (HashPartitioning(user)
    * satisfies ClusteredDistribution(user, cohort, offset)) plans the
    * dedup with zero additional Exchange. Only the final tiny
    * (cohort × offset) agg re-shuffles, and that table is bounded by
    * periods², not events. All-integer day/period arithmetic (`div`,
    * never double division on epoch magnitudes). */
  def cohortRetention(
      df: DataFrame, userCol: String, tsNanosCol: String,
      periodDays: Int = 7): DataFrame = {
    val perNanos = periodDays * 86400L * 1000000000L
    val e = df.select(col(userCol).as("__u"),
      expr(s"$tsNanosCol div $perNanos").as("__p"))
    val first = e.groupBy("__u").agg(min(col("__p")).as("__p0"))
    e.join(first, "__u")
      .select(col("__u"), col("__p0").as("cohort"),
        (col("__p") - col("__p0")).as("offset"))
      .dropDuplicates("__u", "cohort", "offset")
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
