package graft

import java.nio.file.Files
import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark-bounded stream dedup: redeliveries within the horizon are
  * suppressed (even across micro-batches), each key's payload is
  * emitted exactly once, and the streamed output equals the batch
  * dedup over the distinct keys. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark: cross-batch redeliveries collapse, each key emits once") {
    val dir = Files.createTempDirectory("sdedup").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()

    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit =
      rows.toDF("id", "ts", "v").coalesce(1).write.mode("append").parquet(src)

    def runOnce(tag: Int): Unit = {
      val stream = spark.readStream
        .schema("id BIGINT, ts TIMESTAMP, v DOUBLE").parquet(src)
      val q = StreamDedup.dedupWithinWatermark(stream, Seq("id"), "ts",
        delay = "10 minutes")
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

    val batch1 = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (1L, ts("2026-01-01 10:00:00"), 1.0), // same-batch exact redelivery
      (2L, ts("2026-01-01 10:00:30"), 2.0))
    val batch2 = Seq(
      (2L, ts("2026-01-01 10:00:30"), 2.0), // cross-batch redelivery (in horizon)
      (3L, ts("2026-01-01 10:01:00"), 3.0))

    write(batch1); runOnce(0)
    write(batch2); runOnce(1)

    val emitted = spark.read.option("basePath", dir)
      .parquet(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("out_")).map(_.toString): _*)
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq

    // every key exactly once, payload intact
    assert(emitted.map(_._1).sorted == Seq(1L, 2L, 3L),
      s"expected one emission per key, got $emitted")
    assert(emitted.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))

    // batch parity: the batch path collapses to the same distinct set
    val batch = StreamDedup.dedupWithinWatermark(
      (batch1 ++ batch2).toDF("id", "ts", "v"), Seq("id"), "ts", "10 minutes")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    assert(batch.sortBy(_._1) == emitted.sortBy(_._1))
  }

  test("dedupedCounts composes dedup state with a downstream rollup in one plan") {
    val rows = Seq(
      (1L, ts("2026-01-01 10:00:00"), "a", 1.5),
      (1L, ts("2026-01-01 10:00:00"), "a", 1.5),
      (2L, ts("2026-01-01 10:00:10"), "a", 2.0),
      (3L, ts("2026-01-01 10:00:20"), "b", 4.0)).toDF("id", "ts", "t", "v")
    val got = StreamDedup.dedupedCounts(rows, Seq("id"), "ts", "5 minutes",
      groupCol = "t", valueCol = "v")
      .select(col("t"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("a" -> ((2L, 3.5)), "b" -> ((1L, 4.0))))
  }
}
