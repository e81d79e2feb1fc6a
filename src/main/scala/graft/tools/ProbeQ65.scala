package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for q65 (not part of the library API). */
object ProbeQ65 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("probe", 32)
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    SparkEntry.queries("q65_pagerank")(s, "/root/testdata/sf0.001").count()
    s.catalog.clearCache()
    t("whole q65 at sf0.01") { SparkEntry.queries("q65_pagerank")(s, "/root/testdata/sf0.01").count() }
    s.catalog.clearCache()
    t("whole q65 (run A)") { SparkEntry.queries("q65_pagerank")(s, dir).count() }
    s.catalog.clearCache()
    t("whole q65 (run B)") { SparkEntry.queries("q65_pagerank")(s, dir).count() }
    s.catalog.clearCache()
    val pairs = Tables.lineitem(s, dir).select(
      (col("l_orderkey") * 2).as("o"), (col("l_partkey") * 2 + 1).as("p"))
      .distinct()
    t("pairs distinct count") { pairs.count() }
    val edges = pairs.select(col("o").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("o").as("dst")))
    val ew = t("ew window+repart cache") {
      val x = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
        .repartition(col("dst")).cache()
      x.count(); x
    }
    t("approx node count") {
      ew.agg(approx_count_distinct(col("src")).as("n")).first().getLong(0)
    }
    val base = 150000L
    var ranks = t("iter1 (const)") {
      ew.select(col("dst").as("id"), expr("1000000 div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
        .select(col("id"), (lit(base) + expr("(850000 * coalesce(s, CAST(0 AS BIGINT))) div 1000000")).as("rank"))
        .localCheckpoint(true)
    }
    for (i <- 2 to 3) {
      ranks = t(s"iter$i") {
        ew.join(broadcast(ranks.withColumnRenamed("id", "src")), Seq("src"))
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy("id").agg(sum(col("c")).as("s"))
          .select(col("id"), (lit(base) + expr("(850000 * coalesce(s, CAST(0 AS BIGINT))) div 1000000")).as("rank"))
          .localCheckpoint(true)
      }
    }
    t("final orderBy count") { ranks.orderBy("id").count() }
    s.stop()
  }
}
