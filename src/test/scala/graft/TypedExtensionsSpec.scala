package graft

import graft.typed.TypedPipeline
import org.apache.spark.sql.functions._

class TypedExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL users reach the codegen expressions via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT cosine_f(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |       dot_f(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       jaccard_sorted(shingle_hashes('a b c d', 2),
        |                      shingle_hashes('a b c x', 2)) AS j,
        |       minhash_overlap(minhash_sig(shingle_hashes('a b c d', 2), 32),
        |                       minhash_sig(shingle_hashes('a b c d', 2), 32)) AS m
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 0.5)  // shingles {ab,bc,cd} vs {ab,bc,cx}: 2/4
    assert(r.getDouble(3) == 1.0)
  }

  test("portable md5 family is reachable from SQL") {
    val r = spark.sql(
      """SELECT simhash_hex('the quick brown fox') AS sh,
        |       jaccard_ge(shingle_hashes31('a b c d', 2),
        |                  shingle_hashes31('a b c x', 2), 0.4D) AS jhit,
        |       jaccard_ge(shingle_hashes31('a b c d', 2),
        |                  shingle_hashes31('x y z w', 2), 0.4D) AS jmiss,
        |       minhash_overlap(
        |         minhash_sig31(shingle_hashes31('a b c d', 2), 64),
        |         minhash_sig31(shingle_hashes31('a b c d', 2), 64)) AS m,
        |       size(rademacher_buckets(array(1.0f, 2.0f), 6, 4)) AS nb
        |""".stripMargin).head()
    assert(r.getString(0).length == 16 &&
      r.getString(0).forall("0123456789abcdef".contains(_)))
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == -1.0) // early-exit marker, filtered by callers
    assert(r.getDouble(3) == 1.0)
    assert(r.getInt(4) == 4)
  }

  test("typed Dataset pipeline: Aggregator equals untyped groupBy") {
    val ev = TypedPipeline.events(spark, sfDir)
    val typed = TypedPipeline.userStats(ev)
      .map { case (uid, s) => (uid, s.n, s.purchases, s.maxValue) }
      .toDF("user_id", "n", "purchases", "maxValue")
    val untyped = ev.toDF().groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
      max(col("value")).as("maxValue"))
    val a = typed.orderBy("user_id").collect().map(_.toSeq)
    val b = untyped.orderBy("user_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("operators tolerate empty inputs (SURVEY §7.4 risk 4)") {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Tables0.docSchema)
    assert(operators.Dedup.exactGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(operators.Dedup.minHashNearDuplicates(emptyDocs, "doc_id", "text",
      shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.5).count() == 0)
    assert(operators.Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text",
      Seq.empty, 0.5, 2).count() == 0)
    val emptyTxns = Seq.empty[(String, Long, Double, Double, Int, Int)]
      .toDF("transaction_id", "token_address", "coin_value", "fee", "type", "log_index")
    val dims = Seq((1L, 1.0, 2)).toDF("token_address", "coin_price_usd", "decimals")
    assert(operators.Enrichment.enrich(emptyTxns, dims, tronFeeRule = true).count() == 0)
  }

  private object Tables0 {
    import org.apache.spark.sql.types._
    val docSchema: StructType = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
  }
}
