package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 — the reference's `log_index` computation
  * (`clickhouse/v1/operator.py:455-470`): stable multi-column sort, then a
  * per-transaction rank with `method="first"` (row_number semantics, ties
  * broken by the preceding sort order).
  *
  * Spark realization: `row_number().over(Window.partitionBy(part).orderBy(...))`.
  * pandas' rank is deterministic because the sort before it is stable; a
  * Spark window with tying order keys is NOT, so callers must pass
  * `tieBreakers` forming a total order within each partition (SURVEY.md
  * §7.4 risk 1). At scale this is a single hash-partitioned sort per
  * `partitionCol` — no global sort, no driver involvement.
  */
object LogIndex {

  /** Per-column sort direction, mirroring the reference's
    * `{col: asc_bool}` dict form (`operator.py:458-465`). */
  def sortCols(spec: Seq[(String, Boolean)]): Seq[Column] =
    spec.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }

  def addLogIndex(
      df: DataFrame,
      partitionCol: String,
      orderBy: Seq[(String, Boolean)],
      outputCol: String = "log_index"): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(sortCols(orderBy): _*)
    df.withColumn(outputCol, row_number().over(w))
  }
}
