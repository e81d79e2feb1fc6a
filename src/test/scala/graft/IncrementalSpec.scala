package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1 to 500).map { i =>
    (s"g${i % 3}", i.toLong, i * 0.135 - 20.0)
  }.toDF("g", "id", "v")

  test("merged incremental states equal a full recompute exactly") {
    val old = rows.filter(col("id") % 10 =!= 0)
    val delta = rows.filter(col("id") % 10 === 0)
    val merged = Incremental.finalizeState(
      Incremental.merge(Seq("g"),
        Incremental.state(old, Seq("g"), "v"),
        Incremental.state(delta, Seq("g"), "v")),
      Seq("g")).orderBy("g").collect()
    val direct = Incremental.finalizeState(
      Incremental.state(rows, Seq("g"), "v"), Seq("g"))
      .orderBy("g").collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val parts = Seq(0, 1, 2).map(r =>
      Incremental.state(rows.filter(col("id") % 3 === r), Seq("g"), "v"))
    val left = Incremental.merge(Seq("g"),
      Incremental.merge(Seq("g"), parts(0), parts(1)), parts(2))
    val right = Incremental.merge(Seq("g"), parts(0),
      Incremental.merge(Seq("g"), parts(1), parts(2)))
    assert(Incremental.finalizeState(left, Seq("g")).orderBy("g").collect().toSeq ==
      Incremental.finalizeState(right, Seq("g")).orderBy("g").collect().toSeq)
  }

  test("empty delta is the identity") {
    val st = Incremental.state(rows, Seq("g"), "v")
    val empty = Incremental.state(rows.filter(lit(false)), Seq("g"), "v")
    val m = Incremental.finalizeState(
      Incremental.merge(Seq("g"), st, empty), Seq("g"))
    val d = Incremental.finalizeState(st, Seq("g"))
    assert(m.orderBy("g").collect().toSeq == d.orderBy("g").collect().toSeq)
  }
}
