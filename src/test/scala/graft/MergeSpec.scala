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
}
