package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "tag", "v")

  private lazy val changelog = Seq(
    (2L, "b2", 21.0, 5L, "U"),   // update
    (2L, "b3", 22.0, 9L, "U"),   // later update wins
    (3L, "c", 30.0, 4L, "D"),    // delete
    (4L, "d", 40.0, 2L, "U"),    // insert (key absent from base)
    (5L, "e", 50.0, 3L, "D"),    // delete then...
    (5L, "e2", 51.0, 6L, "U"))   // ...resurrect
    .toDF("k", "tag", "v", "seq", "op")

  test("mergeChangelog applies last-write-wins with deletes and inserts") {
    val out = Merge.mergeChangelog(base, changelog, Seq("k"), "seq", "op")
      .orderBy("k").select("k", "tag", "v", "seq")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0, 0L),
      (2L, "b3", 22.0, 9L),
      (4L, "d", 40.0, 2L),
      (5L, "e2", 51.0, 6L)))
  }

  test("latestByKey resolves duplicate sequences deterministically") {
    val rows = Seq((1L, 7L, "x"), (1L, 7L, "y"), (1L, 3L, "z"))
    val winners = Seq(1, 3, 6).map { parts =>
      val dup = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts).map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)),
        toDfSchema)
      Merge.latestByKey(dup, Seq("k"), "seq")
        .select("k", "seq", "tag").as[(Long, Long, String)].collect().toSeq
    }
    assert(winners.head.head._2 == 7L) // a seq-7 row wins
    assert(winners.distinct.size == 1, // same winner under any partitioning
      s"partitioning changed the winner: $winners")
  }

  private lazy val toDfSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))

  test("merge plans object-hash partial aggregation: no window, no sort-agg") {
    val plan = Merge.mergeChangelog(base, changelog, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("SortAggregate"), plan.take(1500))
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
  }

  test("scdType2 compresses unchanged runs and ranges each version") {
    val ch = Seq(
      (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
      (2L, 5L, "X"))
      .toDF("k", "seq", "state")
    val out = Merge.scdType2(ch, Seq("k"), "seq", Seq("state"))
      .orderBy("k", "version")
      .select("k", "state", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "A", 10L, Some(30L), 1L, false),   // 20L run compressed away
      (1L, "B", 30L, Some(40L), 2L, false),
      (1L, "A", 40L, None, 3L, true),
      (2L, "X", 5L, None, 1L, true)))
  }

  test("scdType2 is null-safe on tracked attributes") {
    val ch = Seq(
      (1L, 1L, None), (1L, 2L, None),          // null run compresses
      (1L, 3L, Some("v")), (1L, 4L, None))     // value→null is a change
      .toDF("k", "seq", "state")
    val out = Merge.scdType2(ch, Seq("k"), "seq", Seq("state"))
      .orderBy("version").select("valid_from", "version")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("scdType2 versions are contiguous: valid_to meets the next valid_from") {
    val ch = (1L to 50L).map(i => (i % 5, i, (i % 3).toString))
      .toDF("k", "seq", "state")
    val rows = Merge.scdType2(ch, Seq("k"), "seq", Seq("state"))
      .orderBy("k", "version")
      .select("k", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSeq
    rows.groupBy(_._1).values.foreach { vs =>
      vs.sliding(2).foreach {
        case Seq((_, _, Some(to), false), (_, from, _, _)) =>
          assert(to == from)
        case Seq((_, _, None, cur)) => assert(cur)
        case _ => ()
      }
      assert(vs.count(_._4) == 1, "exactly one current version per key")
      assert(vs.last._4)
    }
  }

  test("scdType2 plans ONE exchange: compression and ranging share the sort") {
    val ch = Seq((1L, 10L, "A")).toDF("k", "seq", "state")
    val plan = Merge.scdType2(ch, Seq("k"), "seq", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(2000))
  }
}
