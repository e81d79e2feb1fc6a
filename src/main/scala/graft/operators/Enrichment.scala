package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship enrichment pipeline (SURVEY.md §3.1; reference
  * `clickhouse/v1/operator.py:440-499`, `tigergraph/v1/streaming_operator.py:77-96`):
  *
  *   1. J1: metadata ⟕ prices on symbol (both dimension-sized → broadcast)
  *   2. J2: transactions ⋈ enriched-metadata on token_address (inner join
  *      doubles as the "supported tokens" semi-filter)
  *   3. P10: fillna(0) — placed BEFORE decimal scaling, exactly as the
  *      reference does (`streaming_operator.py:90`; SURVEY.md §7.4 risk 6)
  *   4. P8: decimals zeroed for types 0/1 (`operator.py:483`)
  *   5. F1: coin_value / 10^decimals; F2: USD = value × price
  *   6. P8-tron: fee zeroed where log_index > 1 (`operator.py:486-487`)
  *
  * Scale notes: the fact table streams through untouched; both dimension
  * inputs are broadcast so the whole enrichment is a narrow, shuffle-free
  * map stage that stays inside one WholeStageCodegen span. At 100 TB the
  * only shuffle in the full pipeline is the log_index window's hash
  * partition by transaction id.
  */
object Enrichment {

  /** J1: left-join token metadata with latest prices on `symbol`. */
  def dims(metadata: DataFrame, prices: DataFrame): DataFrame =
    metadata.join(prices, Seq("symbol"), "left")

  /** Stages 2-6. Column contract mirrors the reference: the fact side has
    * `token_address, coin_value, fee, type, log_index`; the dims side has
    * `token_address, coin_price_usd, decimals`. */
  def enrich(txns: DataFrame, dims: DataFrame, tronFeeRule: Boolean): DataFrame = {
    val joined = txns
      .join(broadcast(dims.select("token_address", "coin_price_usd", "decimals")),
        Seq("token_address"), "inner")
      .na.fill(0, Seq("coin_price_usd", "decimals"))
      .withColumn("decimals",
        when(col("type").isin(0, 1), lit(0)).otherwise(col("decimals")))
      .withColumn("coin_value",
        col("coin_value").cast("double") / pow(lit(10.0), col("decimals")))
      .withColumn("coin_value_usd", col("coin_value") * col("coin_price_usd"))
    // Per-chain fee zeroing happens BEFORE USD derivation: in the
    // reference pipeline the CH-side tron rule (`operator.py:486-487`)
    // runs upstream of the TG-side `fee_usd = fee * price`
    // (`streaming_operator.py:95`), so a zeroed fee has zero USD value.
    val withFee =
      if (tronFeeRule)
        joined.withColumn("fee",
          when(col("log_index") > 1, lit(0.0)).otherwise(col("fee")))
      else joined
    withFee
      .withColumn("fee_usd", col("fee") * col("coin_price_usd"))
      .drop("decimals")
  }

  /** J3 — the Ripple degenerate join (`operator.py:588-595`,
    * `streaming_operator.py:239-251`): both sides get a constant
    * token_address, making the equi-join a broadcast of one price row;
    * outgoing = value + fee, incoming = value, both USD-scaled. */
  def enrichConstantKey(txns: DataFrame, oneRowPrice: DataFrame): DataFrame =
    txns.crossJoin(broadcast(oneRowPrice.select("coin_price_usd")))
      .withColumn("outgoing_value", col("coin_value") + col("fee"))
      .withColumn("incoming_value", col("coin_value"))
      .withColumn("outgoing_value_usd", col("outgoing_value") * col("coin_price_usd"))
      .withColumn("incoming_value_usd", col("incoming_value") * col("coin_price_usd"))
}
