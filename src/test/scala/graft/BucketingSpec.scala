package graft

import graft.io.Bucketing
import graft.operators.Skew
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  /** The test catalog is in-memory but table data lands on disk; a
    * previous JVM's leftovers make saveAsTable refuse the location. */
  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    dropTable("b_orders"); dropTable("b_lineitem")
    val orders = sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("o_orderkey"), 4,
      sortCols = Seq("o_orderkey"))
    val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
      Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free co-located join, got:\n$plan")
    // and the result is the plain join's result
    val expected = orders.join(lineitem, Seq("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("aggregation on the bucket key needs no exchange either") {
    // self-contained: (re)write the bucketed table rather than relying on
    // the previous test's side effect
    dropTable("b_lineitem")
    Bucketing.writeBucketed(
      sources.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4, sortCols = Seq("o_orderkey"))
    val agg = spark.table("b_lineitem").groupBy("o_orderkey")
      .agg(sum(col("l_quantity")).as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed aggregation, got:\n$plan")
    assert(agg.count() > 0)
  }

  test("salted join spreads a hot key and matches the plain join") {
    val fact = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select("k", "v", "tag")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "tag")
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    assert(salted.count() == plain.count())
  }
}
