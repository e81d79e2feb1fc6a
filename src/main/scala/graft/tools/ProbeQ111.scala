package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftExtensions, GraftSession}
import graft.operators.Graph
import graft.sources.Tables

/** One-shot diagnostic for the q111 triangle regression (round-4 verdict
  * task #3): staged timings of each phase of the co-order-part triangle
  * pipeline at a given SF, so the regime knobs in Graph.triangleCounts
  * are tuned against measured volumes. Dev tool — not library surface. */
object ProbeQ111 {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

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

    def edges = Graph.coOccurrenceEdges(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
      "o", "p", maxGroupSize = 8)

    time("cold full q111 (gen+count+sort)") {
      Graph.triangleCounts(edges).orderBy("id")
        .write.format("noop").mode("overwrite").save()
    }
    time("warm full q111") {
      Graph.triangleCounts(edges).orderBy("id")
        .write.format("noop").mode("overwrite").save()
    }

    // staged: reuse triangleCounts' own structure piecewise
    val canon = time("canon distinct + cache fill") {
      val c = edges.select(
          least(col("src"), col("dst")).cast("long").as("a"),
          greatest(col("src"), col("dst")).cast("long").as("b"))
        .filter(col("a") =!= col("b")).distinct().cache()
      c.count()
      c
    }
    val st = time("stats action") {
      canon.agg(count(lit(1)).as("m"),
        min(col("a")).as("lo"), max(col("b")).as("hi"),
        (approx_count_distinct(col("a")) + approx_count_distinct(col("b")))
          .as("nUpper")).first()
    }
    println(s"[probe] m=${st.getLong(0)} nUpper=${st.getLong(3)}")
    val deg = time("deg agg + cache fill") {
      val d = canon.select(col("a").as("id"))
        .unionByName(canon.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d")).cache()
      d.count()
      d
    }
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orientedBase = canon
      .join(broadcast(deg.select(col("id").as("a"), col("d").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("id").as("b"), col("d").as("db"))), Seq("b"))
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
    val adj = orientedBase.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    time("adjacency agg (noop)") {
      adj.write.format("noop").mode("overwrite").save()
    }
    val tris = orientedBase
      .join(broadcast(adj), Seq("u"))
      .join(broadcast(adj.select(col("u").as("v"), col("nbrs").as("nbrs_v"))), Seq("v"))
      .select(col("u"), col("v"),
        explode(graft.expressions.SortedArrays.intersectSorted(
          col("nbrs"), col("nbrs_v"))).as("w"))
    time("tris via intersection (noop)") {
      tris.write.format("noop").mode("overwrite").save()
    }
    val counts = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    time("counts (noop)") {
      counts.write.format("noop").mode("overwrite").save()
    }
    val out = deg.select("id")
      .join(broadcast(counts), Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
    time("final left join + sort (noop)") {
      out.orderBy("id").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
