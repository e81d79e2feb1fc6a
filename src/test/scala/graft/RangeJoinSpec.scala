package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("probe inside / between / beyond intervals (keyless)") {
    val probes = Seq(5L, 15L, 25L, 99L).toDF("v")
    val dim = Seq((0L, 9L, "a"), (20L, 29L, "b")).toDF("lo", "hi", "tag")
    val got = RangeJoin.broadcastRangeLookup(probes, dim, "v", "lo", "hi", Seq("tag"))
      .orderBy("v").select("tag").collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a"), None, Some("b"), None))
  }

  test("keyed intervals resolve within their key only") {
    val probes = Seq(("k1", 5L), ("k2", 5L), ("k3", 5L)).toDF("key", "v")
    val dim = Seq(("k1", 0L, 9L, 100L), ("k2", 6L, 9L, 200L))
      .toDF("key", "lo", "hi", "val")
    val got = RangeJoin.broadcastRangeLookup(probes, dim, "v", "lo", "hi",
      Seq("val"), keyCols = Seq("key"))
      .orderBy("key").select("val").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // k1: 5 in [0,9] → 100; k2: 5 < lo 6 → none; k3: no intervals
    assert(got.toSeq == Seq(Some(100L), None, None))
  }

  test("rejects __hi collisions and valueCols overlapping loCol/hiCol") {
    val probes = Seq(5L).toDF("v")
    val dim = Seq((0L, 9L, "a")).toDF("lo", "hi", "tag")
    intercept[IllegalArgumentException](RangeJoin.broadcastRangeLookup(
      probes, dim.withColumnRenamed("tag", "__hi"), "v", "lo", "hi", Seq("__hi")))
    intercept[IllegalArgumentException](RangeJoin.broadcastRangeLookup(
      probes, dim, "v", "lo", "hi", Seq("hi")))
    intercept[IllegalArgumentException](RangeJoin.broadcastRangeLookup(
      probes, dim, "v", "lo", "hi", Seq("lo")))
  }

  test("empty interval dim yields all-null values") {
    val probes = Seq(5L).toDF("v")
    val dim = Seq.empty[(Long, Long, String)].toDF("lo", "hi", "tag")
    val out = RangeJoin.broadcastRangeLookup(probes, dim, "v", "lo", "hi", Seq("tag"))
    assert(out.count() == 1 && out.head().isNullAt(1))
  }

  test("agrees with the BETWEEN-join spelling on events batches") {
    val ev = sources.Tables.events(spark, sfDir).select("event_id")
    val batches = ev.agg(expr("max(event_id) div 100").as("mx"))
      .select(explode(sequence(lit(0L), col("mx"))).as("batch_id"))
      .select(col("batch_id"), (col("batch_id") * 100).as("lo"),
        (col("batch_id") * 100 + 99).as("hi"))
    val viaOp = RangeJoin.broadcastRangeLookup(ev, batches, "event_id",
      "lo", "hi", Seq("batch_id"))
      .select("event_id", "batch_id").as[(Long, Long)].collect().toSet
    val viaBetween = ev.join(batches,
        col("event_id") >= col("lo") && col("event_id") <= col("hi"))
      .select("event_id", "batch_id").as[(Long, Long)].collect().toSet
    assert(viaOp == viaBetween && viaOp.nonEmpty)
  }
}
