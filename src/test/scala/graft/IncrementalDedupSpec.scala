package graft

import java.nio.file.Files
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental near-dup against a persisted signature store: the store
  * round-trips through parquet (the pipeline's actual medium), a new
  * batch is screened without re-banding the corpus, and the streaming
  * ingest loop (screen → append survivors) catches a duplicate of a doc
  * that itself arrived in an EARLIER micro-batch — the property plain
  * per-batch dedup cannot have. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = "the quick brown fox jumps over the lazy dog"
  private val d2 = "completely different content about spark engines here"
  private val u1 = "totally unrelated text about nothing in particular whatsoever"

  test("signatureStore parquet round-trip; batch screens against the store") {
    val dir = Files.createTempDirectory("sigstore").toString
    val corpus = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    Dedup.signatureStore(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/store")
    val store = spark.read.parquet(s"$dir/store")
    assert(store.columns.toSeq == Seq("id", "sig", "buckets"))
    assert(store.select(size(col("sig")), size(col("buckets")))
      .as[(Int, Int)].collect().forall(_ == ((64, 32))))

    val batch = Seq(
      (10L, d1),                          // exact copy of stored d1
      (11L, u1),                          // genuinely new
      (12L, d1 + " with extra words appended at the tail end")) // near-dup
      .toDF("doc_id", "text")
    val pairs = Dedup.incrementalNearDuplicates(store, batch,
      "doc_id", "text", threshold = 0.10)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val byNew = pairs.groupBy(_._1)
    assert(byNew(10L).toSeq == Seq((10L, 1L, 1.0)), s"got ${byNew.get(10L)}")
    assert(!byNew.contains(11L), s"unique doc flagged: $pairs")
    val near = byNew(12L).filter(_._2 == 1L)
    assert(near.nonEmpty && near.head._3 > 0.1 && near.head._3 < 1.0,
      s"near-dup estimate off: $pairs")
  }

  test("hot store cells above maxBucketSize are dropped; cap=0 disables") {
    // two identical stored docs share EVERY (band, bucket) cell, so with
    // maxBucketSize = 1 all their cells are hot and a probing duplicate
    // finds nothing — the q102 hot-band guard firing. The default cap
    // (64) and the disabled cap (0) both keep the cells.
    val store = Dedup.signatureStore(
      Seq((1L, d1), (2L, d1), (3L, d2)).toDF("doc_id", "text"),
      "doc_id", "text")
    val batch = Seq((10L, d1)).toDF("doc_id", "text")
    def run(cap: Int) = Dedup.incrementalNearDuplicates(store, batch,
      "doc_id", "text", threshold = 0.10, maxBucketSize = cap)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1).forall(p => p._2 != 1L && p._2 != 2L),
      s"capped cells still produced pairs: ${run(1)}")
    assert(run(64).map(p => (p._1, p._2)).toSet == Set((10L, 1L), (10L, 2L)),
      s"default cap over-dropped: ${run(64)}")
    assert(run(0).map(p => (p._1, p._2)).toSet == Set((10L, 1L), (10L, 2L)),
      s"cap=0 should disable: ${run(0)}")
  }

  test("shuffle-band-join regime (batch over budget) matches the broadcast plan") {
    val store = Dedup.signatureStore(
      Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), "doc_id", "text")
    val batch = Seq((10L, d1), (11L, u1),
      (12L, d1 + " with extra words appended at the tail end"))
      .toDF("doc_id", "text")
    def run() = Dedup.incrementalNearDuplicates(store, batch,
      "doc_id", "text", threshold = 0.10)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val bcast = run()
    spark.conf.set("graft.dedup.broadcastBatchBytes", "0")
    try {
      val shuffled = run()
      assert(shuffled == bcast,
        s"regimes disagree: broadcast=$bcast shuffle=$shuffled")
    } finally spark.conf.unset("graft.dedup.broadcastBatchBytes")
  }

  test("bucketCounts metadata: append-maintained == recomputed; probe skips the store-wide bucket scan") {
    val dir = Files.createTempDirectory("bucketstats").toString
    val base = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val appended = Seq((3L, u1), (4L, d1 + " trailing tail")).toDF("doc_id", "text")
    Dedup.signatureStore(base, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/store")
    // append-time maintenance: the batch contributes ONLY its own counts
    val gen0 = Dedup.bucketCounts(spark.read.parquet(s"$dir/store"))
    val appendedSigs = Dedup.signatureStore(appended, "doc_id", "text")
    appendedSigs.write.mode("append").parquet(s"$dir/store")
    val maintained = Dedup.mergeBucketCounts(gen0,
      Dedup.bucketCounts(appendedSigs))
    maintained.write.mode("overwrite").parquet(s"$dir/stats")
    val store = spark.read.parquet(s"$dir/store")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq.sorted
    assert(sorted(maintained) == sorted(Dedup.bucketCounts(store)),
      "append-maintained counts != recomputed counts")
    // stats-path screen == recompute-path screen (purely physical) ...
    val batch = Seq((10L, d1)).toDF("doc_id", "text")
    val stats = spark.read.parquet(s"$dir/stats")
    def run(bs: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.incrementalNearDuplicates(store, batch, "doc_id", "text",
        threshold = 0.10, maxBucketSize = 1, bucketStats = bs)
    assert(run(Some(stats)).as[(Long, Long, Double)].collect().sorted.toSeq ==
      run(None).as[(Long, Long, Double)].collect().sorted.toSeq,
      "bucket-stats hot set differs from the recomputed one")
    // ... and the batch plan reads the STORE parquet exactly once (the
    // candidate explode); the hot-cell list comes from the stats table
    def storeScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Location") && l.contains(s"$dir/store"))
    assert(storeScans(run(None)) == 2,
      "recompute path should scan the store twice (premise)")
    assert(storeScans(run(Some(stats))) == 1,
      "stats path still scans the store for the hot-cell list")
  }

  test("streaming ingest: screen then append survivors; cross-batch dup caught; stateless") {
    val dir = Files.createTempDirectory("incdedup").toString
    val src = s"$dir/src"; val storeDir = s"$dir/store"
    new java.io.File(src).mkdirs()
    Dedup.signatureStore(Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"),
        "doc_id", "text")
      .write.mode("overwrite").parquet(storeDir)

    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)

    var stateless = true
    def runOnce(tag: Int): Unit = {
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: DataFrame, id: Long) =>
          val store = spark.read.parquet(storeDir)
          val flagged = Dedup.incrementalNearDuplicates(store, df,
            "doc_id", "text", threshold = 0.10)
            .localCheckpoint(true) // consumed twice: dump + survivor filter
          flagged.write.mode("overwrite").parquet(s"$dir/out_${tag}_$id")
          // survivors join the store — tomorrow's batches screen
          // against them without the store ever being re-banded
          Dedup.signatureStore(
              df.join(flagged.select(col("new_id").as("doc_id")).distinct(),
                Seq("doc_id"), "left_anti"),
              "doc_id", "text")
            .write.mode("append").parquet(storeDir)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      stateless &&= Option(q.lastProgress)
        .forall(_.stateOperators.isEmpty)
    }

    write(Seq((20L, d1), (21L, u1))); runOnce(0)   // 20 dups stored d1; 21 new
    write(Seq((30L, u1))); runOnce(1)              // dups 21 — a BATCH-1 arrival

    val pairs = spark.read.parquet(
        new java.io.File(dir).listFiles()
          .filter(_.getName.startsWith("out_")).map(_.toString): _*)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.contains((20L, 1L, 1.0)), s"store dup missed: $pairs")
    assert(pairs.contains((30L, 21L, 1.0)),
      s"cross-micro-batch dup missed (survivor not appended?): $pairs")
    assert(!pairs.exists(_._1 == 21L), s"unique doc flagged: $pairs")
    // the store holds exactly the corpus + the survivors, never the dups
    val storedIds = spark.read.parquet(storeDir)
      .select("id").as[Long].collect().toSet
    assert(storedIds == Set(1L, 2L, 21L), s"store ids: $storedIds")
    // no streaming state at all: each micro-batch is a stateless scan +
    // broadcast join against the persisted store
    assert(stateless, "expected a stateless streaming plan")
  }
}
