package graft

import graft.pipelines.TrainingData
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: monotone survivors, deterministic, shards cover") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val heldout = docs.filter(col("doc_id") % 97 === 0).select("text")
    val cfg = TrainingData.Config(
      mixtureRates = Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.5)
    val (curated, r) = TrainingData.curate(docs, heldout, cfg)

    // every stage only removes rows
    assert(r.input >= r.afterExactDedup)
    assert(r.afterExactDedup >= r.afterQuality)
    assert(r.afterQuality >= r.afterNearDedup)
    assert(r.afterNearDedup >= r.afterDecontamination)
    assert(r.afterDecontamination >= r.afterMixture)
    assert(r.afterMixture > 0 && r.shards > 0)
    assert(curated.count() == r.afterMixture)

    // heldout overlap is gone: no curated doc shares an 8-gram with heldout
    val curGrams = curated.select(explode(
      graft.expressions.TextHash.shingleHashes31(col("text"), 8)).as("g"))
    val heldGrams = heldout.select(explode(
      graft.expressions.TextHash.shingleHashes31(col("text"), 8)).as("g"))
    assert(curGrams.join(heldGrams, Seq("g"), "left_semi").isEmpty)

    // deterministic: a re-run on a repartitioned input matches exactly
    val (curated2, r2) = TrainingData.curate(docs.repartition(13), heldout, cfg)
    assert(r2 == r)
    assert(curated2.select("doc_id", "split", "shard")
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      curated.select("doc_id", "split", "shard")
        .as[(Long, String, Long)].collect().sorted.toSeq)

    // shard ids are contiguous from 0
    val shards = curated.select("shard").distinct().as[Long].collect().sorted
    assert(shards.head == 0L && shards.last == shards.length - 1)
  }

  test("shard write round-trips with split partitioning") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
      .limit(200)
    val (curated, _) = TrainingData.curate(docs,
      spark.emptyDataFrame.withColumn("text", lit("")).select("text"))
    val out = Files.createTempDirectory("shards").toString
    TrainingData.writeShards(curated, out)
    val back = spark.read.parquet(s"$out/split=train")
    assert(back.count() > 0)
    assert(back.columns.contains("shard"))
    // the whole tree reads as one Hive-partitioned dataset (no duplicate
    // split column in the files)
    val whole = spark.read.parquet(out)
    assert(whole.columns.count(_ == "split") == 1)
    assert(whole.count() == curated.count())
  }
}
