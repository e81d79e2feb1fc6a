package graft

import graft.operators.LogIndex
import org.apache.spark.sql.functions._

class LogIndexSpec extends SparkSpec {
  import spark.implicits._

  test("log_index is a permutation of 1..n within each partition key") {
    val df = Seq(
      ("t1", "2024-01-01", 10), ("t1", "2024-01-02", 5), ("t1", "2024-01-01", 7),
      ("t2", "2024-01-03", 1)).toDF("transaction_id", "d", "v")
    val out = LogIndex.addLogIndex(df, "transaction_id",
      Seq("d" -> true, "v" -> true))
    val byKey = out.groupBy("transaction_id")
      .agg(collect_list("log_index").as("ranks"))
      .as[(String, Seq[Int])].collect().toMap
    assert(byKey("t1").sorted == Seq(1, 2, 3))
    assert(byKey("t2") == Seq(1))
  }

  test("rank follows the multi-column sort order with mixed asc/desc") {
    val df = Seq(("t", 1, 100), ("t", 2, 100), ("t", 1, 200))
      .toDF("transaction_id", "a", "b")
    val out = LogIndex.addLogIndex(df, "transaction_id",
      Seq("b" -> false, "a" -> true))
    val got = out.orderBy("log_index").as[(String, Int, Int, Int)].collect()
    // sort: b desc then a asc → (1,200), (1,100), (2,100)
    assert(got.map(r => (r._2, r._3)).toSeq == Seq((1, 200), (1, 100), (2, 100)))
  }

  test("property: ranks are exactly 1..n per group for random inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val rows = List.fill(60)(
        (s"k${rnd.nextInt(5)}", rnd.nextInt(10), rnd.nextInt(1000)))
      val df = rows.toDF("transaction_id", "a", "b")
      val out = LogIndex.addLogIndex(df, "transaction_id",
        Seq("a" -> true, "b" -> false))
      val bad = out.groupBy("transaction_id")
        .agg(sort_array(collect_list("log_index")).as("r"), count(lit(1)).as("n"))
        .filter(expr("r <> sequence(1, cast(n as int))"))
        .count()
      assert(bad == 0)
    }
  }
}
