package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest prior-or-equal right value per key") {
    val left = Seq(
      ("k1", 10L, "a"), ("k1", 20L, "b"), ("k1", 5L, "c"),
      ("k2", 10L, "d")).toDF("key", "ts", "tag")
    val right = Seq(
      ("k1", 8L, 1.0), ("k1", 15L, 2.0), ("k1", 20L, 3.0),
      ("k3", 1L, 9.0)).toDF("key", "ts", "price")
    val out = AsOfJoin.asofBackward(left, right, Seq("key"), "ts", Seq("price"))
      .select("key", "ts", "tag", "price")
      .as[(String, Long, String, Option[Double])].collect()
      .map(r => (r._3, r._4)).toMap
    assert(out("a") == Some(1.0))   // ts=10 → right ts=8
    assert(out("b") == Some(3.0))   // ts=20 → equal-ts right wins (inclusive)
    assert(out("c") == None)        // ts=5 → nothing prior
    assert(out("d") == None)        // k2 has no right rows
  }

  test("forward as-of: earliest at-or-after right value per key") {
    val left = Seq(
      ("k1", 10L, "a"), ("k1", 20L, "b"), ("k1", 25L, "c"),
      ("k2", 10L, "d")).toDF("key", "ts", "tag")
    val right = Seq(
      ("k1", 8L, 1.0), ("k1", 15L, 2.0), ("k1", 20L, 3.0),
      ("k3", 1L, 9.0)).toDF("key", "ts", "price")
    val out = AsOfJoin.asofForward(left, right, Seq("key"), "ts", Seq("price"))
      .select("key", "ts", "tag", "price")
      .as[(String, Long, String, Option[Double])].collect()
      .map(r => (r._3, r._4)).toMap
    assert(out("a") == Some(2.0))   // ts=10 → next right at 15
    assert(out("b") == Some(3.0))   // ts=20 → equal-ts right wins (inclusive)
    assert(out("c") == None)        // ts=25 → nothing after
    assert(out("d") == None)        // k2 has no right rows
  }

  test("a latest right row with NULL value yields NULL, not a stale match") {
    val left = Seq(("k", 25L)).toDF("key", "ts")
    val right = Seq(("k", 10L, Some(5.0)), ("k", 20L, None))
      .toDF("key", "ts", "price")
    val out = AsOfJoin.asofBackward(left, right, Seq("key"), "ts", Seq("price"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.columns.indexOf("price")))
  }

  test("left rows and columns are preserved exactly") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, 7.0)).toDF("key", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, Seq("key"), "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "key", "ts", "v"))
    assert(out.count() == 1)
    assert(out.head().getDouble(3) == 7.0)
  }
}
