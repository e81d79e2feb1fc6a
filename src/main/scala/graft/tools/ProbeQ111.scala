package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftExtensions, GraftSession}
import graft.operators.Graph
import graft.sources.Tables

/** One-shot diagnostic for the q111 triangle regression (round-4 verdict
  * task #3): prints edge count, degree-orientation out-degree histogram,
  * exact wedge volume, and triangle count for the co-order part graph on
  * a given SF dir, so the regime knobs in Graph.triangleCounts can be
  * tuned against measured volumes rather than guesses. Dev tool — not
  * part of the library surface. */
object ProbeQ111 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val edges = Graph.coOccurrenceEdges(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
      "o", "p", maxGroupSize = 8)

    val canon = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val m = canon.count()
    println(s"[probe] edges m=$m")

    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d")).cache()
    val nNodes = deg.count()
    println(s"[probe] nodes n=$nNodes")
    deg.agg(max("d").as("maxDeg"), avg("d").as("avgDeg"),
        expr("percentile(d, 0.99)").as("p99"))
      .show(false)

    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = canon
      .join(broadcast(deg.select(col("id").as("a"), col("d").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("id").as("b"), col("d").as("db"))), Seq("b"))
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
    val outDeg = oriented.groupBy("u").agg(count(lit(1)).as("od")).cache()
    outDeg.agg(max("od").as("maxOut"), avg("od").as("avgOut"),
        expr("percentile(od, 0.99)").as("p99Out"),
        sum(col("od") * (col("od") - 1) / 2).as("wedges"))
      .show(false)
    println("[probe] top-10 out-degrees:")
    outDeg.orderBy(col("od").desc).show(10, false)

    val t0 = System.nanoTime()
    val tri = Graph.triangleCounts(edges)
    tri.write.format("noop").mode("overwrite").save()
    println(f"[probe] triangleCounts wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
