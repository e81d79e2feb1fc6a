package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1/V2 — the reference's data-quality gates (SURVEY.md §2.11).
  * Each returns structured results rather than throwing, so pipelines can
  * route failures to alerting (the reference's Slack callback analog). */
object Validations {

  final case class CheckResult(name: String, passed: Boolean, detail: String)

  /** V1 cross-system row-count equality for a partition predicate
    * (`validate_bt_bq_counts`, `airflow/bitquery.py:354-424`). */
  def countParity(a: DataFrame, b: DataFrame, pred: Column): CheckResult = {
    val ca = a.filter(pred).count()
    val cb = b.filter(pred).count()
    CheckResult("count_parity", ca == cb, s"left=$ca right=$cb")
  }

  /** Functional-dependency audit: does `det → dep` hold? Returns ONE
    * summary row — (fd, n_keys, n_violating, max_card) — so many audits
    * union into a single data-quality report (the profiling complement
    * to V1/V2's cross-system gates).
    *
    * Scale shape: one partial+final hash agg keyed on the determinant
    * (distinct-dep via a two-level agg, never count(DISTINCT) — the
    * Expand-plan trap in CLAUDE.md), then a metrics-sized rollup.
    * Shuffle bytes are O(|det×dep| distinct), not O(rows); nothing is
    * collected. A violated FD at 100 TB surfaces as n_violating > 0
    * with max_card showing how bad the worst key is. */
  def fdAudit(df: DataFrame, name: String,
      det: Seq[String], dep: String): DataFrame = {
    val detCols = det.map(col)
    df.select(detCols :+ col(dep): _*).distinct()
      .groupBy(detCols: _*).agg(count(lit(1)).as("card"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("card") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("card")).as("max_card"))
      .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
        col("max_card"))
  }

  /** V2 price sanity (`check_prices`, `coinprice/pricing_checks.py:76-120`):
    *  - the native token's price must be > 0
    *  - fewer than half the tokens may be zero-priced
    *  - no supported token may be missing from the price table (J5
    *    anti-join). */
  def priceSanity(
      prices: DataFrame, supported: DataFrame,
      symbolCol: String, priceCol: String,
      nativeSymbol: String): Seq[CheckResult] = {
    val native = prices.filter(col(symbolCol) === nativeSymbol &&
      col(priceCol) > 0).count()
    val total = prices.count()
    val zero = prices.filter(col(priceCol) <= 0).count()
    val missing = supported.select(symbolCol).distinct()
      .join(prices.select(symbolCol).distinct(), Seq(symbolCol), "left_anti").count()
    Seq(
      CheckResult("native_price_positive", native > 0, s"rows=$native"),
      CheckResult("zero_price_ratio", total == 0 || zero * 2 < total, s"zero=$zero total=$total"),
      CheckResult("no_missing_tokens", missing == 0, s"missing=$missing"))
  }
}
