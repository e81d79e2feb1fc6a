package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the single-partition window spelling") {
    val ev = sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("value").cast("bigint").as("v"))
    val viaWindow = ev.withColumn("cum",
      sum("v").over(Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "cum").as[(Long, Long)].collect().toMap
    val viaOp = PrefixSum.globalRunningSum(ev, "event_id", "v", "cum")
      .select("event_id", "cum").as[(Long, Long)].collect().toMap
    assert(viaOp == viaWindow)
  }

  test("partition-count invariant, null-safe, rejects non-Long values") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
    def run(n: Int) = PrefixSum.globalRunningSum(df, "k", "v", "c", n)
      .select("k", "c").as[(Long, Long)].collect().toMap
    val expect = Map(1L -> 10L, 2L -> 10L, 3L -> 15L) // null contributes 0
    assert(run(1) == expect && run(2) == expect && run(7) == expect)
    intercept[IllegalArgumentException](
      PrefixSum.globalRunningSum(df.withColumn("v", col("v").cast("int")),
        "k", "v", "c"))
  }

  test("plan has no single-partition window exchange") {
    val df = Seq((1L, 1L)).toDF("k", "v")
    val plan = PrefixSum.globalRunningSum(df, "k", "v", "c")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
