package graft

import java.nio.file.Files
import graft.streaming.{StreamDedup, StreamJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** State-SIZE evidence for the watermark-bounded streaming operators:
  * the semantic specs (StreamDedupSpec / StreamJoinSpec) prove WHAT is
  * emitted; this one proves the O(keys-per-horizon) state claim in the
  * operators' scaladocs by driving many micro-batches whose event time
  * marches past the horizon and asserting
  * `StreamingQueryProgress.stateOperators.numRowsTotal` stays FLAT —
  * the difference between an operator that survives an eternal stream
  * and one that accretes state until the executors fall over. */
class StreamStateEvictionSpec extends SparkSpec {
  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
  private def tsAt(hours: Int): java.sql.Timestamp =
    new java.sql.Timestamp(base.getTime + hours * 3600L * 1000L)

  /** Last reported total state rows of a finished run (the final
    * progress entry with a state operator — AvailableNow appends a
    * no-data batch after the watermark advances, which is exactly
    * where eviction lands). */
  private def lastStateRows(q: StreamingQuery): Long =
    q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      .lastOption.map(_.numRowsTotal).getOrElse(-1L)

  test("dedup state is evicted once the watermark passes the horizon") {
    val dir = Files.createTempDirectory("sdstate").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    val keysPerBatch = 10

    def writeBatch(b: Int): Unit =
      (0 until keysPerBatch)
        .map(i => (b * 100L + i, tsAt(b), 1.0))
        .toDF("id", "ts", "v").coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Long = {
      val stream = spark.readStream
        .schema("id BIGINT, ts TIMESTAMP, v DOUBLE").parquet(src)
      val q = StreamDedup.dedupWithinWatermark(stream, Seq("id"), "ts",
          delay = "10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.format("noop").mode("overwrite").save(); () }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      lastStateRows(q)
    }

    // 4 batches, each a fresh key set one HOUR later — every batch's
    // keys expire (ts + 10 min) long before the next batch's watermark
    val states = (0 until 4).map { b => writeBatch(b); runOnce() }
    assert(states.forall(_ >= 0), s"no state operator reported: $states")
    // flat, not cumulative: the final state holds at most the last two
    // batches' keys (the newest batch + anything its no-data batch has
    // not yet evicted), while 4x keysPerBatch keys went through
    assert(states.last <= 2L * keysPerBatch,
      s"dedup state grew with the stream: $states")
    assert(states(2) == states(3),
      s"state not flat once watermarks advance: $states")
  }

  test("band-join state is evicted once both watermarks pass the band") {
    val dir = Files.createTempDirectory("sjstate").toString
    val lsrc = s"$dir/l"; val rsrc = s"$dir/r"; val ckpt = s"$dir/ckpt"
    new java.io.File(lsrc).mkdirs(); new java.io.File(rsrc).mkdirs()
    val rowsPerBatch = 10

    def writeBatch(b: Int): Unit = {
      (0 until rowsPerBatch).map(i => (b * 100L + i, tsAt(b)))
        .toDF("user_id", "v_ts").coalesce(1).write.mode("append").parquet(lsrc)
      (0 until rowsPerBatch)
        .map(i => (b * 100L + i,
          new java.sql.Timestamp(tsAt(b).getTime + 60000L), 1.0))
        .toDF("user_id", "p_ts", "v").coalesce(1).write.mode("append").parquet(rsrc)
    }

    def runOnce(): Long = {
      val l = spark.readStream.schema("user_id BIGINT, v_ts TIMESTAMP")
        .parquet(lsrc)
      val r = spark.readStream
        .schema("user_id BIGINT, p_ts TIMESTAMP, v DOUBLE").parquet(rsrc)
      val q = StreamJoin.bandedEquiJoin(l, r, Seq("user_id"),
          "v_ts", "p_ts", "1 minute", "1 minute", "30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.format("noop").mode("overwrite").save(); () }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      lastStateRows(q)
    }

    val states = (0 until 4).map { b => writeBatch(b); runOnce() }
    assert(states.forall(_ >= 0), s"no state operator reported: $states")
    // both sides buffer rows only inside band + watermark; an hour of
    // event time between batches proves every earlier batch evictable
    assert(states.last <= 4L * rowsPerBatch,
      s"join state grew with the stream: $states")
    assert(states(2) == states(3),
      s"state not flat once watermarks advance: $states")
  }
}
