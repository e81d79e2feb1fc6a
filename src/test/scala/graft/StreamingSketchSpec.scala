package graft

import java.nio.file.Files
import graft.operators.Sketch
import graft.streaming.StreamingSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed KMV == batch KMV, bit-for-bit, across micro-batch
  * boundaries — the mergeability that makes always-on distinct-count
  * streams equivalent to nightly rescans. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming KMV estimate equals the batch estimator over all batches") {
    val dir = Files.createTempDirectory("skmv").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val k = 64

    // two overlapping batches over two groups
    val batch1 = (1L to 800L).map(i => (if (i % 2 == 0) "a" else "b", i))
    val batch2 = (500L to 1500L).map(i => (if (i % 2 == 0) "a" else "b", i))

    def hashed(rows: Seq[(String, Long)]) =
      rows.toDF("group", "key")
        .select(col("group"), Sketch.md5Uniform32(col("key")).as("h"))

    // foreachBatch (checkpoint-recoverable, unlike the memory sink)
    // lands each micro-batch's emissions in its own dir — the shared
    // checkpoint carries the sketch state across restarts
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("group STRING, h LONG")
        .parquet(src).as[StreamingSketch.KeyedHash]
      val q = StreamingSketch.kmvEstimates(stream, k)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSketch.KmvEstimate],
            id: Long) =>
          df.write.mode("overwrite").parquet(s"$dir/out_$id")
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    hashed(batch1).coalesce(1).write.mode("append").parquet(src)
    runOnce()
    hashed(batch2).coalesce(1).write.mode("append").parquet(src)
    runOnce()

    // batch 1 emitted the fold over BOTH source batches: compare
    // against the batch estimator over the union
    val streamed = spark.read.parquet(s"$dir/out_1")
      .select("group", "est_ndv").as[(String, Long)].collect().toMap
    val union = (batch1 ++ batch2).toDF("g", "key")
    val batch = Sketch.kmvDistinct(union, "key", Seq("g"), k)
      .select(col("g"), col("est_ndv")).as[(String, Long)].collect().toMap
    assert(streamed === batch)
    // and the first batch's emission was itself the batch-1 estimate
    val streamed1 = spark.read.parquet(s"$dir/out_0")
      .select("group", "est_ndv").as[(String, Long)].collect().toMap
    val batch1Only = Sketch.kmvDistinct(batch1.toDF("g", "key"), "key", Seq("g"), k)
      .select(col("g"), col("est_ndv")).as[(String, Long)].collect().toMap
    assert(streamed1 === batch1Only)
  }

  test("streaming cell appends: foreachBatch-built sketch store == batch recompute") {
    val dir = Files.createTempDirectory("scells").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"; val store = s"$dir/store"
    new java.io.File(src).mkdirs()
    val batch1 = for (d <- 0L to 4L; i <- 1L to 40L) yield ("a", d, i * (d + 1))
    val batch2 = for (d <- 4L to 7L; i <- 1L to 25L) yield ("a", d, i * 3 + 7)

    // each micro-batch appends ITS OWN cells — the daily-ingest store
    // pattern; the overlap day (4) lands as split cells that the
    // read-side merge re-reduces (sum/min)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("g STRING, d LONG, v LONG")
        .parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          Sketch.logHistCells(df, Seq("g"), "d", "v")
            .write.mode("append").parquet(store)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    batch1.toDF("g", "d", "v").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    batch2.toDF("g", "d", "v").coalesce(1).write.mode("append").parquet(src)
    runOnce()

    val inc = Sketch.logHistQuantilesTrailingFromCells(
      spark.read.parquet(store), Seq("g"), windowDays = 3,
      Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val full = Sketch.logHistQuantilesTrailing(
      (batch1 ++ batch2).toDF("g", "d", "v"), Seq("g"), "d", "v",
      windowDays = 3, Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(inc == full && inc.nonEmpty)
  }
}
