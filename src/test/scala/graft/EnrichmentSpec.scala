package graft

import graft.operators.Enrichment
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("flagship enrichment: joins, fillna ordering, decimal zeroing, tron rule") {
    val txns = Seq(
      // (transaction_id, token_address, coin_value, fee, type, log_index)
      ("t1", "tokA", 1000.0, 10.0, 2, 1),
      ("t1", "tokA", 2000.0, 10.0, 2, 2),  // log_index>1 → tron fee zeroed
      ("t2", "tokA", 500.0, 5.0, 0, 1),    // type 0 → decimals zeroed
      ("t3", "tokB", 100.0, 1.0, 2, 1),    // tokB has no price → usd=0
      ("t4", "tokC", 100.0, 1.0, 2, 1))    // tokC not in metadata → dropped
      .toDF("transaction_id", "token_address", "coin_value", "fee", "type", "log_index")
    val meta = Seq(("tokA", "A", 3), ("tokB", "B", 2))
      .toDF("token_address", "symbol", "decimals")
    val price = Seq(("A", 2.0)).toDF("symbol", "coin_price_usd")

    val out = Enrichment.enrich(txns, Enrichment.dims(meta, price), tronFeeRule = true)
      .orderBy("transaction_id", "log_index").collect()

    assert(out.length == 4)                                  // tokC inner-join dropped
    val r1 = out(0)
    assert(r1.getAs[Double]("coin_value") == 1.0)            // 1000/10^3
    assert(r1.getAs[Double]("coin_value_usd") == 2.0)
    assert(r1.getAs[Double]("fee") == 10.0)                  // log_index=1 keeps fee
    val r2 = out(1)
    assert(r2.getAs[Double]("fee") == 0.0)                   // tron rule
    assert(r2.getAs[Double]("fee_usd") == 0.0)               // zeroed fee → zero USD
    val r3 = out(2)
    assert(r3.getAs[Double]("coin_value") == 500.0)          // type 0 → 10^0
    val r4 = out(3)
    assert(r4.getAs[Double]("coin_value") == 1.0)            // 100/10^2 (decimals kept)
    assert(r4.getAs[Double]("coin_value_usd") == 0.0)        // fillna(0) price
  }

  test("constant-key (Ripple) enrichment: cross join one price row") {
    val txns = Seq(("t1", 10.0, 1.0)).toDF("transaction_id", "coin_value", "fee")
    val price = Seq(2.0).toDF("coin_price_usd")
    val out = Enrichment.enrichConstantKey(txns, price).head()
    assert(out.getAs[Double]("outgoing_value") == 11.0)
    assert(out.getAs[Double]("incoming_value") == 10.0)
    assert(out.getAs[Double]("outgoing_value_usd") == 22.0)
  }
}
