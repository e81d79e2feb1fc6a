package graft

import graft.chains.Chain
import graft.io.{QueryTemplate, Sinks}
import graft.pipelines.Pipelines
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ChainSpec extends SparkSpec {
  test("metadata table routing: first-letter ordinal dispatch (F7)") {
    assert(Chain.Bitcoin.tokensMetadataTable == "bitcoin.tokens_metadata")
    assert(Chain.Solana.tokensMetadataTable == "aal_dictionaries.solana_tokens_metadata")
    // 't' >= 's' → tron routes to the dictionary DB too (coinprice/utils.py:54-58)
    assert(Chain.Tron.tokensMetadataTable == "aal_dictionaries.tron_tokens_metadata")
    assert(Chain.Ethereum.tokensMetadataTable == "ethereum.tokens_metadata")
  }

  test("latest-block table dispatch per chain family") {
    assert(Chain.Bitcoin.latestBlockTable == "bitcoin.txns")
    assert(Chain.Ethereum.latestBlockTable == "ethereum.tld_raw_hot")
    assert(Chain.Tron.latestBlockTable == "tron.master")
  }

  test("per-chain rule flags") {
    assert(Chain.hasTronFeeRule(Chain.Tron) && !Chain.hasTronFeeRule(Chain.Ethereum))
    assert(Chain.hasConstantKeyPricing(Chain.Ripple))
    assert(Chain.smartContractChains.contains(Chain.Polygon))
    assert(!Chain.smartContractChains.contains(Chain.Bitcoin))
    assert(Chain.byName("polygon").contains(Chain.Polygon))
  }
}

class TemplateSpec extends SparkSpec {
  test("jinja {{ }} rendering with whitespace tolerance") {
    val sql = "SELECT * FROM t WHERE block > {{last_synced_block}} AND block <= {{ latest_block }}"
    val out = QueryTemplate.renderJinja(sql,
      Map("last_synced_block" -> "100", "latest_block" -> "200"))
    assert(out == "SELECT * FROM t WHERE block > 100 AND block <= 200")
  }

  test("bracket [[ ]] exact-token rendering does not collide with arrays") {
    val sql = "SELECT arr[[1]] FROM [[ project ]].t"
    val out = QueryTemplate.renderBracket(sql, Map("project" -> "prod"))
    assert(out == "SELECT arr[[1]] FROM prod.t")
  }

  test("folder UNION ALL joins every .sql recursively in path order (U1)") {
    val dir = Files.createTempDirectory("sqls")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.sql"), "SELECT 1")
    Files.writeString(dir.resolve("sub/b.sql"), "SELECT 2")
    Files.writeString(dir.resolve("notsql.txt"), "ignored")
    val joined = QueryTemplate.unionAllFolder(dir.toString)
    assert(joined == "SELECT 1\n \n UNION ALL \n \nSELECT 2")
    // the combined query actually runs
    assert(spark.sql(joined).count() == 2)
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("batched push: batch sizing, csv escaping, stats accumulation (S17/V4)") {
    val df = (1 to 25).map(i => (i.toLong, s"v,$i")).toDF("id", "payload")
      .repartition(2)
    val posted = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    // local-mode poster: count lines, everything valid
    val report = Sinks.batchedPush(df, batchSize = 10, lines => {
      posted.add(lines.size)
      Sinks.LoadStats(lines.size, 0, 0, 0, 0, 0, 0)
    })
    assert(report.rowsSent == 25)
    assert(report.validLines == 25)
    assert(report.allValid)
    assert(report.batchesSent >= 3) // ceil(25/10) per partition layout
    // escaping: commas quoted
    assert(Sinks.toCsvLine(org.apache.spark.sql.Row(1L, "a,b")) == "1,\"a,b\"")
    assert(Sinks.toCsvLine(org.apache.spark.sql.Row(null, "x\"y")) == ",\"x\"\"y\"")
  }

  test("batched push surfaces sink-side errors (V4 classes)") {
    val df = (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    val report = Sinks.batchedPush(df.coalesce(1), batchSize = 10,
      lines => Sinks.LoadStats(lines.size - 1, 1, 0, 0, 0, 0, 0))
    assert(!report.allValid)
    assert(report.errorLines == 1)
  }
}

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("graph projection fans one enriched frame into four outputs (§3.2)") {
    val enriched = Seq(
      ("t1", "a", "x", 0, 10.0, 20.0, 1.0, 2.0, 2.5, "2024-01-01"),
      ("t1", "a", "y", 1, 5.0, 10.0, 0.5, 1.0, 2.5, "2024-01-02"),
      ("t2", "b", "x", 2, 3.0, 6.0, 0.25, 0.5, 2.0, "2024-01-03"))
      .toDF("transaction_id", "sender_address", "receiver_address", "type",
        "coin_value", "coin_value_usd", "fee", "fee_usd", "coin_price_usd",
        "block_date_time")
    val p = Pipelines.graphProjection(enriched, "bitcoin")
    assert(p.transactions.count() == 2)
    assert(p.linkInputs.count() == 2)   // (t1,a), (t2,b)
    assert(p.linkOutputs.count() == 3)  // (t1,x), (t1,y), (t2,x)
    val cs = p.chainState.head()
    assert(cs.getAs[String]("chain") == "bitcoin")
    assert(cs.getAs[Double]("price_usd") == 2.5)
    assert(cs.getAs[String]("block_date_time") == "2024-01-03")
  }
}
