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

  // --- broadcast (custom strategy) realization ---

  test("broadcast as-of agrees with the window realization, both directions") {
    val ev = sources.Tables.events(spark, sfDir)
    val left = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ns")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("value").as("pv"),
        col("props").as("pp"))
    for (fwd <- Seq(false, true)) {
      val windowed =
        (if (fwd) AsOfJoin.asofForward(left, right, Seq("user_id"), "ts_ns", Seq("pv", "pp"))
         else AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts_ns", Seq("pv", "pp")))
          .orderBy("event_id").collect()
      val bcast = AsOfJoin.asofBroadcast(left, right, Seq("user_id"), "ts_ns",
        Seq("pv", "pp"), forward = fwd).orderBy("event_id").collect()
      assert(windowed.toSeq == bcast.toSeq, s"forward=$fwd")
    }
  }

  test("broadcast as-of plans with zero exchanges (probe side never moves)") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, 7.0)).toDF("key", "ts", "v")
    val out = AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("broadcast as-of: NULL key / NULL ts / empty timeline probe to NULL") {
    val left = Seq(
      (1L, Option("k"), Option(100L)),
      (2L, None, Option(100L)),          // NULL key never matches
      (3L, Option("k"), None),           // NULL ts never matches
      (4L, Option("z"), Option(100L)))   // key with no timeline
      .toDF("id", "key", "ts")
    val right = Seq(("k", 50L, 7.0)).toDF("key", "ts", "v")
    val got = AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v"))
      .orderBy("id").select("v").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(7.0), None, None, None))
  }

  test("broadcast as-of self-join shape (duplicate exprIds) resolves") {
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 2.0)).toDF("key", "ts", "v")
    val out = AsOfJoin.asofBroadcast(
      df.select("key", "ts"),
      df.select(col("key"), col("ts"), col("v").as("pv")),
      Seq("key"), "ts", Seq("pv"))
    assert(out.orderBy("ts").select("pv").as[Double].collect().toSeq
      == Seq(1.0, 2.0))
  }

  test("broadcast as-of: empty timeline side yields all-null values") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "ts")
    val right = Seq.empty[(String, Long, Double)].toDF("key", "ts", "v")
    val out = AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.columns.indexOf("v")))
  }

  test("cost-based dispatch: small dim broadcasts, large threshold-0 windows") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, 7.0)).toDF("key", "ts", "v")
    val small = AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("v"))
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
    val forced = AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("v"),
      thresholdBytes = Some(-1L))
    assert(!forced.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
    assert(small.collect().toSeq == forced.collect().toSeq)
  }

  test("dispatch honors autoBroadcastJoinThreshold=-1 (broadcast disabled)") {
    val left = Seq((1L, "k", 100L)).toDF("id", "key", "ts")
    val right = Seq(("k", 50L, 7.0)).toDF("key", "ts", "v")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("v"))
      assert(!out.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
      assert(out.head().getDouble(3) == 7.0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("broadcast as-of rejects key dtype mismatch and non-Long ts at plan time") {
    val left = Seq((1, 100L)).toDF("key", "ts")         // key: int
    val right = Seq((1L, 50L, 7.0)).toDF("key", "ts", "v") // key: long
    intercept[IllegalArgumentException](
      AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v")))
    val leftIntTs = Seq((1L, 100)).toDF("key", "ts")    // ts: int
    val rightL = Seq((1L, 50L, 7.0)).toDF("key", "ts", "v")
    intercept[IllegalArgumentException](
      AsOfJoin.asofBroadcast(leftIntTs, rightL, Seq("key"), "ts", Seq("v")))
  }

  test("broadcast as-of rejects float-typed keys at plan time") {
    // UnsafeRow byte equality can't match -0.0/0.0 or NaN bit patterns
    // the way SQL = does; the guard rejects rather than silently missing.
    val left = Seq((1.0d, 100L)).toDF("key", "ts")
    val right = Seq((1.0d, 50L, 7.0)).toDF("key", "ts", "v")
    intercept[IllegalArgumentException](
      AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v")))
  }

  test("duplicate (key, ts) build rows pick a layout-independent winner") {
    val left = Seq(("k", 100L)).toDF("key", "ts")
    val dups = Seq(("k", 50L, "aaa"), ("k", 50L, "zzz"), ("k", 50L, "mmm"))
    def run(layout: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asofBroadcast(left, layout, Seq("key"), "ts", Seq("v"))
        .select("v").as[String].head()
    val r1 = run(dups.toDF("key", "ts", "v").repartition(5))
    val r2 = run(dups.reverse.toDF("key", "ts", "v").coalesce(1))
    assert(r1 == r2)  // byte-order tie-break, not executeCollect order
    val fwd = AsOfJoin.asofBroadcast(left.withColumn("ts", lit(10L)),
      dups.toDF("key", "ts", "v").repartition(3), Seq("key"), "ts",
      Seq("v"), forward = true).select("v").as[String].head()
    assert(fwd == "aaa" && r1 == "zzz")  // forward byte-least, backward byte-greatest
  }

  test("build-side row cap fails fast instead of OOMing the driver") {
    val left = Seq(("k", 100L)).toDF("key", "ts")
    val right = (1L to 10L).map(i => ("k", i, i.toDouble)).toDF("key", "ts", "v")
    val saved = spark.conf.getOption("spark.sql.graft.asofBroadcastMaxRows")
    try {
      spark.conf.set("spark.sql.graft.asofBroadcastMaxRows", "5")
      val ex = intercept[Exception](
        AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("v")).collect())
      assert(ex.getMessage.contains("asofBroadcastMaxRows"), ex.getMessage)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.graft.asofBroadcastMaxRows", v)
        case None => spark.conf.unset("spark.sql.graft.asofBroadcastMaxRows")
      }
    }
  }

  test("binary search: bounds and duplicate-ts ties") {
    import graft.plans.BroadcastAsOfJoinExec.search
    val ts = Array(10L, 20L, 20L, 30L)
    assert(search(ts, 5L, forward = false) == -1)
    assert(search(ts, 10L, forward = false) == 0)
    assert(search(ts, 25L, forward = false) == 2)  // last duplicate wins
    assert(search(ts, 99L, forward = false) == 3)
    assert(search(ts, 99L, forward = true) == -1)
    assert(search(ts, 15L, forward = true) == 1)   // first duplicate wins
    assert(search(ts, 30L, forward = true) == 3)
    assert(search(Array.empty[Long], 1L, forward = false) == -1)
  }
}
