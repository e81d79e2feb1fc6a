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
