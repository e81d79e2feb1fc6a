package graft

import java.nio.file.Files
import graft.streaming.WindowedAgg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked event-time windows: append emissions are final and
  * once-per-window, late data is dropped by the watermark, and the
  * streamed rollup equals the batch rollup over the on-time events. */
class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("event-time tumbling rollup: windows close at the watermark, late rows drop") {
    val dir = Files.createTempDirectory("winagg").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()

    def write(rows: Seq[(java.sql.Timestamp, String, Double)]): Unit =
      rows.toDF("ts", "k", "v").coalesce(1).write.mode("append").parquet(src)

    def runOnce(tag: Int): Unit = {
      val stream = spark.readStream
        .schema("ts TIMESTAMP, k STRING, v DOUBLE").parquet(src)
      val q = WindowedAgg.eventTimeRollup(stream, "ts",
        watermarkDelay = "0 seconds", windowDuration = "1 minute",
        keyCols = Seq("k"), valueCol = "v")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.write.mode("overwrite").parquet(s"$dir/out_${tag}_$id")
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    val onTime1 = Seq((ts("2026-01-01 10:00:10"), "a", 1.0),
      (ts("2026-01-01 10:00:20"), "b", 2.0))
    val onTime2 = Seq((ts("2026-01-01 10:02:30"), "a", 5.0))
    val late = Seq((ts("2026-01-01 10:00:40"), "a", 100.0)) // behind watermark
    val closer = Seq((ts("2026-01-01 10:05:00"), "b", 7.0)) // advances watermark

    write(onTime1); runOnce(0)         // watermark still at epoch → no emission yet
    write(onTime2); runOnce(1)         // watermark 10:00:20 → [10:00,10:01) closes
    write(late ++ closer); runOnce(2)  // late row dropped; [10:02,10:03) closes

    val emitted = spark.read.option("basePath", dir)
      .parquet(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("out_")).map(_.toString): _*)
      .select(col("window_start").cast("string"), col("k"), col("n"),
        col("total").cast("double"))
      .as[(String, String, Long, Double)].collect().toSet

    // the late 10:00:40 row must NOT appear anywhere; each closed
    // window appears exactly once with the on-time aggregate
    assert(emitted.contains(("2026-01-01 10:00:00", "a", 1L, 1.0)))
    assert(emitted.contains(("2026-01-01 10:00:00", "b", 1L, 2.0)))
    assert(emitted.contains(("2026-01-01 10:02:00", "a", 1L, 5.0)))
    assert(!emitted.exists(_._4 == 100.0), s"late row leaked: $emitted")

    // batch parity: the same call on a batch frame over the ON-TIME
    // events reproduces every emitted row
    val batch = WindowedAgg.eventTimeRollup(
      (onTime1 ++ onTime2 ++ closer).toDF("ts", "k", "v"), "ts",
      "0 seconds", "1 minute", Seq("k"), "v")
      .select(col("window_start").cast("string"), col("k"), col("n"),
        col("total").cast("double"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(emitted.subsetOf(batch), s"emitted=$emitted batch=$batch")
  }
}
