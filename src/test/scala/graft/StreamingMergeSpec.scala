package graft

import java.nio.file.Files
import graft.streaming.StreamingMerge
import org.apache.spark.sql.streaming.Trigger

class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming latest-by-key: out-of-order and replayed changes are inert") {
    val dir = Files.createTempDirectory("smg").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("key LONG, seq LONG, value STRING, op STRING")
        .parquet(src).as[StreamingMerge.Change]
      val q = StreamingMerge.latestByKey(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // batch 1: k1 v1@1 then v2@3 (same batch), k2 v1@2
    Seq((1L, 1L, "a1", "U"), (1L, 3L, "a2", "U"), (2L, 2L, "b1", "U"))
      .toDF("key", "seq", "value", "op")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val e1 = spark.read.parquet(out).as[StreamingMerge.Latest].collect()
    assert(e1.map(l => l.key -> (l.seq, l.value)).toMap ==
      Map(1L -> (3L, "a2"), 2L -> (2L, "b1")))
    assert(e1.length == 2) // intermediate a1 never emitted

    // batch 2: stale seq for k1 (ignored), replay of k2@2 (ignored),
    // delete k2@5, new k3@1
    Seq((1L, 2L, "a-stale", "U"), (2L, 2L, "b1", "U"),
        (2L, 5L, "b-del", "D"), (3L, 1L, "c1", "U"))
      .toDF("key", "seq", "value", "op")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val all = spark.read.parquet(out).as[StreamingMerge.Latest].collect()
    assert(all.length == 4) // 2 from batch 1 + delete(k2) + insert(k3)
    val latest = all.groupBy(_.key).view
      .mapValues(_.maxBy(_.seq)).toMap
    assert(latest(1L) == StreamingMerge.Latest(1L, 3L, "a2", false))
    assert(latest(2L) == StreamingMerge.Latest(2L, 5L, "b-del", true))
    assert(latest(3L) == StreamingMerge.Latest(3L, 1L, "c1", false))
  }
}
