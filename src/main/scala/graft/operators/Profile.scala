package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column row/null/distinct counts and string-form
  * min/max in one aggregation pass — the "what did we just ingest" QA
  * step every training-data pipeline runs before and after each
  * transform (the reference's V1/V2 cross-system checks are the same
  * idea pointed at a single table: `validations/utils.py`).
  *
  * Shape: ONE Aggregate over the input (no per-column scans). The
  * multi-`count(DISTINCT …)` makes Catalyst plan an Expand — input rows
  * are replicated once per profiled column before the partial agg — so
  * the pass costs O(rows·|cols|) compute but still only shuffles the
  * aggregated row. Profile the columns you care about, not `df.columns`
  * wholesale, when the input is 100 TB. The aggregated single row is
  * then exploded into the long (column, stats) form — driver-free.
  *
  * min/max are computed on the STRING form (cast before comparison):
  * one uniform output schema for heterogeneous columns, and the
  * lexicographic semantics are identical in any engine. Cast dates
  * yourself before profiling timestamp columns (date strings agree
  * cross-engine; timestamp rendering does not), and avoid profiling raw
  * doubles when oracle parity matters (scientific-notation rendering
  * differs between engines).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*")
  }
}
