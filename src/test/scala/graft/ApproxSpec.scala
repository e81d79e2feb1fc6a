package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches a 100 TB engine reaches for
  * when exact distinct/quantiles would shuffle too much. No SQL oracle
  * (sketch internals are engine-specific by nature); verified against
  * the exact answers instead. */
class ApproxSpec extends SparkSpec {

  private lazy val li = sources.Tables.lineitem(spark, sfDir)

  test("approx_count_distinct within rsd of exact") {
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.08)
  }

  test("approx_percentile brackets the exact percentile") {
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).head.getDouble(0)
    val approx = li.select(expr(
      "approx_percentile(l_quantity, 0.5, 1000)")).head.getDouble(0)
    assert(math.abs(approx - exact) <= 1.0) // quantities are 1..50
  }

  test("grouped HLL merges across partitions consistently") {
    val byFlag = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect()
    byFlag.foreach { r =>
      val a = r.getAs[Long]("a"); val e = r.getAs[Long]("e")
      assert(math.abs(a - e).toDouble / e < 0.08, s"flag ${r.get(0)}: $a vs $e")
    }
  }
}
