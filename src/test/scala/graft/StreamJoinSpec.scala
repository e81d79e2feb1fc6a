package graft

import java.nio.file.Files
import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream-stream band join: in-band pairs emit, out-of-band
  * pairs never exist, and the streamed output equals the batch join. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bandedEquiJoin: in-band matches emit, out-of-band and cross-key never") {
    val dir = Files.createTempDirectory("sjoin").toString
    val lsrc = s"$dir/l"; val rsrc = s"$dir/r"; val ckpt = s"$dir/ckpt"
    new java.io.File(lsrc).mkdirs(); new java.io.File(rsrc).mkdirs()

    val views = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 12:00:00")))
    val purchases = Seq(
      (1L, ts("2026-01-01 10:20:00"), 5.0),  // in band of view 1 @10:00
      (1L, ts("2026-01-01 11:00:00"), 7.0),  // out of band (40 min past)
      (2L, ts("2026-01-01 10:30:00"), 9.0),  // in band (inclusive edge)
      (3L, ts("2026-01-01 10:10:00"), 11.0)) // no matching view key
    views.toDF("user_id", "v_ts").coalesce(1)
      .write.mode("append").parquet(lsrc)
    purchases.toDF("user_id", "p_ts", "v").coalesce(1)
      .write.mode("append").parquet(rsrc)

    val l = spark.readStream.schema("user_id BIGINT, v_ts TIMESTAMP")
      .parquet(lsrc)
    val r = spark.readStream
      .schema("user_id BIGINT, p_ts TIMESTAMP, v DOUBLE").parquet(rsrc)
    val q = StreamJoin.bandedEquiJoin(l, r, Seq("user_id"), "v_ts", "p_ts",
        "1 minute", "1 minute", "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$dir/out_$id")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val emitted = spark.read.parquet(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("out_")).map(_.toString): _*)
      .select(col("user_id"), col("v_ts").cast("string"),
        col("p_ts").cast("string"), col("v"))
      .as[(Long, String, String, Double)].collect().toSet

    assert(emitted == Set(
      (1L, "2026-01-01 10:00:00", "2026-01-01 10:20:00", 5.0),
      (2L, "2026-01-01 10:00:00", "2026-01-01 10:30:00", 9.0)),
      s"got $emitted")

    // batch parity: the same call on batch frames gives the same pairs
    val batch = StreamJoin.bandedEquiJoin(
      views.toDF("user_id", "v_ts"), purchases.toDF("user_id", "p_ts", "v"),
      Seq("user_id"), "v_ts", "p_ts", "1 minute", "1 minute", "30 minutes")
      .select(col("user_id"), col("v_ts").cast("string"),
        col("p_ts").cast("string"), col("v"))
      .as[(Long, String, String, Double)].collect().toSet
    assert(batch == emitted)
  }

  test("left_outer band join: unmatched lefts emit nulls once the watermark proves no-match") {
    val dir = Files.createTempDirectory("sjoinlo").toString
    val lsrc = s"$dir/l"; val rsrc = s"$dir/r"; val ckpt = s"$dir/ckpt"
    new java.io.File(lsrc).mkdirs(); new java.io.File(rsrc).mkdirs()

    def runOnce(tag: Int): Unit = {
      val l = spark.readStream.schema("user_id BIGINT, v_ts TIMESTAMP")
        .parquet(lsrc)
      val r = spark.readStream
        .schema("user_id BIGINT, p_ts TIMESTAMP, v DOUBLE").parquet(rsrc)
      val q = StreamJoin.bandedEquiJoin(l, r, Seq("user_id"),
          "v_ts", "p_ts", "0 seconds", "0 seconds", "10 minutes",
          joinType = "left_outer")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.write.mode("overwrite").parquet(s"$dir/out_${tag}_$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // view 1 gets a purchase in band; view 2 never matches
    Seq((1L, ts("2026-01-01 10:00:00")), (2L, ts("2026-01-01 10:00:00")))
      .toDF("user_id", "v_ts").coalesce(1).write.mode("append").parquet(lsrc)
    Seq((1L, ts("2026-01-01 10:05:00"), 5.0))
      .toDF("user_id", "p_ts", "v").coalesce(1)
      .write.mode("append").parquet(rsrc)
    runOnce(0)
    // advance BOTH watermarks far past view 2's band so the runtime can
    // prove no match will ever arrive and must emit the null row
    Seq((99L, ts("2026-01-01 12:00:00"))).toDF("user_id", "v_ts")
      .coalesce(1).write.mode("append").parquet(lsrc)
    Seq((98L, ts("2026-01-01 12:00:00"), 0.5)).toDF("user_id", "p_ts", "v")
      .coalesce(1).write.mode("append").parquet(rsrc)
    runOnce(1)
    runOnce(2) // one more pass: outer results emit a trigger later

    val emitted = spark.read.parquet(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("out_")).map(_.toString): _*)
      .select(col("user_id"), col("p_ts").cast("string"), col("v"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(emitted.contains((1L, Some("2026-01-01 10:05:00"), Some(5.0))))
    assert(emitted.contains((2L, None, None)),
      s"unmatched view must emit with nulls: $emitted")
  }
}
