package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("cusum: constant series is identically zero, no breach") {
    val df = (1L to 20L).map(d => ("a", d, 50L)).toDF("g", "d", "v")
    val out = Anomaly.cusum(df, Seq("g"), "d", "v")
      .select("cusum", "breach").as[(Long, Boolean)].collect()
    assert(out.forall(_ == ((0L, false))))
  }

  test("cusum: telescopes to zero at the end of every series") {
    val df = (1L to 30L).map(d => (s"g${d % 3}", d, d * 7 % 13))
      .toDF("g", "d", "v")
    val last = Anomaly.cusum(df, Seq("g"), "d", "v")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("d").desc)))
      .filter(col("rn") === 1).select("cusum").as[Long].collect()
    assert(last.length == 3 && last.forall(_ == 0L))
  }

  test("cusum: a planted level shift drifts past the breach threshold") {
    // 30 days at 10, then 30 days at 110: the running sum dives deeply
    // negative through the low regime (mean = 60)
    val df = (1L to 60L).map(d => ("a", d, if (d <= 30) 10L else 110L))
      .toDF("g", "d", "v")
    val out = Anomaly.cusum(df, Seq("g"), "d", "v")
      .orderBy("d").select("cusum", "breach")
      .as[(Long, Boolean)].collect()
    // trough at day 30: 30 days × (60·10 − 3600) = −90000; total = 3600
    assert(out(29)._1 == -90000L && out(29)._2)
    assert(out.last._1 == 0L && !out.last._2)
    assert(out.count(_._2) > 10, "sustained breach through the shift")
  }

  test("cusum: threshold rational tightens/loosens the breach flag") {
    val df = (1L to 10L).map(d => ("a", d, if (d <= 5) 0L else 20L))
      .toDF("g", "d", "v")
    val loose = Anomaly.cusum(df, Seq("g"), "d", "v", 10L, 1L)
      .filter(col("breach")).count()
    val tight = Anomaly.cusum(df, Seq("g"), "d", "v", 1L, 10L)
      .filter(col("breach")).count()
    assert(loose == 0L)
    assert(tight > 0L)
  }

  test("cusum: one Exchange — both windows share the group partitioning") {
    val df = (1L to 20L).map(d => ("a", d, d)).toDF("g", "d", "v")
    val plan = Anomaly.cusum(df, Seq("g"), "d", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(2000))
  }
}
