package graft

import graft.operators.{Aggregations, Corpus, Dedup, Enrichment, Graph, LogIndex, Skew}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up evidence harness: runs the heavy operator shapes on 1× and
  * N× copies of the sf0.1 data (keys shifted so cardinalities scale too)
  * and prints per-shape runtimes. The point is the RATIO: a shape whose
  * runtime grows ~linearly with input is cluster-ready; superlinear
  * growth exposes a plan that would not survive 100 TB.
  *
  * Usage: runMain graft.Scale [multiplier]  (default 10)
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("scale", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def amplify(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until mult).map { i =>
        keyCols.foldLeft(df) { (d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 100000000L)) }
      }.reduce(_ unionByName _)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val li1 = Tables.lineitem(spark, dir)
    val liN = amplify(li1, Seq("l_orderkey"))
    val ev1 = Tables.events(spark, dir)
    val evN = amplify(ev1, Seq("event_id", "user_id"))

    def enrichShape(li: DataFrame): Long = {
      val txns = LogIndex.addLogIndex(
        li.select(col("l_orderkey").as("transaction_id"), col("l_linenumber"),
          col("l_partkey").as("token_address"),
          col("l_extendedprice").as("coin_value"), col("l_tax").as("fee"),
          (col("l_linenumber") % 3).as("type"), col("l_shipdate")),
        "transaction_id",
        Seq("l_shipdate" -> true, "l_linenumber" -> true,
          "token_address" -> true, "coin_value" -> true, "fee" -> true))
      val part = Tables.part(spark, dir)
      val meta = part.select(col("p_partkey").as("token_address"),
        col("p_brand").as("symbol"), (col("p_size") % 4).as("decimals"))
      val price = part.groupBy(col("p_brand").as("symbol"))
        .agg((max(col("p_retailprice")) / 1000.0).as("coin_price_usd"))
      Enrichment.enrich(txns, Enrichment.dims(meta, price), tronFeeRule = true).count()
    }

    def aggShape(ev: DataFrame): Long =
      Aggregations.transactionsAgg(ev.select(
        col("user_id").as("transaction_id"),
        (col("event_id") % 3).cast("int").as("type"),
        col("value").as("coin_value"), (col("value") * 1.5).as("coin_value_usd"),
        (col("value") * 0.25).as("fee"), (col("value") * 0.375).as("fee_usd"),
        col("ts").cast("date").as("block_date_time"))).count()

    def saltShape(ev: DataFrame): Long =
      Skew.saltedAggregate(ev.select(col("event_type"), col("value")),
        Seq("event_type"),
        Seq(Skew.SaltedAgg(col("value").cast("decimal(28,10)"), "sum", "s"),
          Skew.count_("n")), buckets = 64).count()

    def minhashShape(docs: DataFrame): Long =
      Dedup.minHashNearDuplicates(docs, "doc_id", "text", shingleSize = 2,
        numHashes = 64, bands = 32, threshold = 0.10, exactVerify = false).count()

    val docs1 = Tables.documents(spark, dir)
    val docsN = (0 until mult).map(i =>
      docs1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
        .withColumn("text", concat(col("text"), lit(" tail" + i)))
    ).reduce(_ unionByName _)

    println(s"== multiplier $mult, base $dir ==")
    time("enrich_1x") { enrichShape(li1) }
    time(s"enrich_${mult}x") { enrichShape(liN) }
    time("txnagg_1x") { aggShape(ev1) }
    time(s"txnagg_${mult}x") { aggShape(evN) }
    time("saltagg_1x") { saltShape(ev1) }
    time(s"saltagg_${mult}x") { saltShape(evN) }
    time("minhash_1x") { minhashShape(docs1) }
    time(s"minhash_${mult}x") { minhashShape(docsN) }
    // vocabulary = explode → partial+final agg: shuffle bytes O(|vocab|),
    // so N× corpus at ~constant vocab must scale by scan cost only
    time("vocab_1x") { Corpus.vocabulary(docs1, "text", 1000).count() }
    time(s"vocab_${mult}x") { Corpus.vocabulary(docsN, "text", 1000).count() }
    // pagerank: N× orderkeys share the part-node space, so the amplified
    // graph has 10× edges AND 10× hotter part-node degrees — exercises
    // the iteration loop under skew, not just under volume
    def pagerankShape(li: DataFrame): Long = {
      val pairs = li.select((col("l_orderkey") * 2).as("o"),
        (col("l_partkey") * 2 + 1).as("p")).distinct()
      val edges = pairs.select(col("o").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("o").as("dst")))
      Graph.pageRankFixedPoint(edges, iterations = 3, symmetric = true).count()
    }
    time("pagerank_1x") { pagerankShape(li1) }
    time(s"pagerank_${mult}x") { pagerankShape(liN) }
    time("tfidf_1x") { Corpus.tfIdfTopK(docs1, "doc_id", "text", 5).count() }
    time(s"tfidf_${mult}x") { Corpus.tfIdfTopK(docsN, "doc_id", "text", 5).count() }
    // broadcast as-of: the probe side is amplified N×, the broadcast
    // timeline stays fixed — runtime must scale by probe scan cost only
    // (no exchange, no sort; the window realization would re-sort N×)
    def asofShape(ev: DataFrame): Long = {
      val probes = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts_ns")
      val timeline = ev1.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ns"), col("value").as("pv"))
      operators.AsOfJoin.asofBroadcast(probes, timeline,
        Seq("user_id"), "ts_ns", Seq("pv")).count()
    }
    time("asof_bcast_1x") { asofShape(ev1) }
    time(s"asof_bcast_${mult}x") { asofShape(evN.withColumn("user_id",
      col("user_id") % lit(100000000L))) } // keep probe keys in the timeline key space
    // bounded-heap top-k: group count scales N×, per-group state stays k
    def topkShape(ev: DataFrame): Long =
      ev.filter(col("event_type") === "purchase").groupBy("user_id")
        .agg(expressions.TopKHeap.topKPairs(col("value"), col("event_id"), 3)
          .as("top")).count()
    time("topk_agg_1x") { topkShape(ev1) }
    time(s"topk_agg_${mult}x") { topkShape(evN) }
    // distributed prefix sum: N× rows through the carry pass — must be
    // scan-bound (the offsets stage is P longs regardless of N)
    def prefixShape(ev: DataFrame): Long =
      operators.PrefixSum.globalRunningSum(
        ev.select(col("event_id"), col("value").cast("long").as("v")),
        "event_id", "v", "cum").count()
    time("prefixsum_1x") { prefixShape(ev1) }
    time(s"prefixsum_${mult}x") { prefixShape(evN) }
    spark.stop()
  }
}
