package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-point detection over grouped ordered series: CUSUM (Page 1954)
  * in exact integer arithmetic.
  *
  * The textbook statistic accumulates deviations from the series mean —
  * a float. Multiplying through by the series length n keeps everything
  * integral: dev = n·value − total (sums to zero over the series by
  * construction, so the running sum telescopes back to 0 at the end),
  * cusum = Σ_{≤ d} dev. A level shift shows up as a sustained drift of
  * the running sum; `breach` flags |cusum| > total·(num/den), i.e. the
  * cumulative deviation exceeding (num/den)·n average days' worth of
  * signal — all comparisons integer, bit-identical across engines.
  *
  * Scale shape: ONE hash shuffle by group; the unordered total/count
  * window and the ordered running-sum window share the partitioning
  * (and the sort is per-group, never global). Series are per-group
  * time-bounded (days, hours), so partitions stay small even when the
  * fact table feeding the pre-aggregation is 100 TB — the expensive
  * reduction happens in the caller's groupBy, which partial-aggregates
  * map-side.
  */
object Anomaly {

  /** @param thresholdNum/`thresholdDen` breach when |cusum| · den >
    *        total · num (default 1/1: one full series-average of drift)
    * @return groupCols* + (orderCol, valueCol, cusum, breach), one row
    *         per input row */
  def cusum(df: DataFrame, groupCols: Seq[String], orderCol: String,
      valueCol: String, thresholdNum: Long = 1L,
      thresholdDen: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "group columns required")
    require(thresholdNum > 0 && thresholdDen > 0, "threshold must be positive")
    val g = groupCols.map(col)
    val wAll = Window.partitionBy(g: _*)
    val wRun = Window.partitionBy(g: _*).orderBy(col(orderCol))
    df.select(g ++ Seq(col(orderCol), col(valueCol).cast("long").as(valueCol)): _*)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__t", sum(col(valueCol)).over(wAll))
      .withColumn("cusum",
        sum(col("__n") * col(valueCol) - col("__t")).over(wRun))
      .withColumn("breach",
        abs(col("cusum")) * thresholdDen > col("__t") * thresholdNum)
      .drop("__n", "__t")
  }
}
