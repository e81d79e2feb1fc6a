package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: keep a per-key aggregate STATE whose
  * components are all algebraic (count, exact decimal sum, min, max), so
  * yesterday's rollup and today's delta combine by re-aggregating the
  * states — never by rescanning history. At 100 TB this is the
  * difference between touching one day of data and touching the table:
  * `merge(state(history), state(delta))` costs O(|keys|), and derived
  * measures (avg) are computed only at `finalizeState` time from the
  * mergeable components (the classic algebraic-aggregate decomposition;
  * a non-mergeable "avg of avgs" is exactly the bug this operator
  * exists to prevent).
  *
  * The sum component stays DECIMAL inside the state — merging exact
  * decimals is associative and engine-independent; the lossy cast to
  * double happens once, in `finalizeState` (same discipline as
  * `Aggregations.exactSum`).
  */
object Incremental {

  private def stateCols = Seq("n", "sum_v", "min_v", "max_v")

  /** Build the mergeable state from raw rows. */
  def state(df: DataFrame, keyCols: Seq[String], valueCol: String,
      scale: Int = 10): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(s"decimal(28,$scale)"))
        .cast(s"decimal(28,$scale)").as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Combine any number of states (old rollup ∪ deltas → new rollup).
    * Input states must share `keyCols` and the state columns. */
  def merge(keyCols: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.foreach(st => require(
      stateCols.forall(st.columns.contains), "not a state frame"))
    val scale = states.head.schema("sum_v").dataType
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).cast(scale).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Derive the user-facing measures; the only lossy step. */
  def finalizeState(st: DataFrame, keyCols: Seq[String]): DataFrame =
    st.select(keyCols.map(col) ++ Seq(
      col("n"),
      col("sum_v").cast("double").as("sum_value"),
      col("min_v").as("min_value"),
      col("max_v").as("max_value"),
      (col("sum_v").cast("double") / col("n")).as("avg_value")): _*)
}
