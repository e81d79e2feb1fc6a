package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gaps over the threshold start new sessions per key") {
    val df = Seq(
      ("u1", 1L, 0L), ("u1", 2L, 50L), ("u1", 3L, 200L), ("u1", 4L, 260L),
      ("u2", 5L, 0L)).toDF("user", "id", "ts")
    val out = Sessions.sessionize(df, "user", "ts", gapNanos = 100L)
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("intervalSelfJoin: bucketed join equals the naive inequality join") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => (s"k${rnd.nextInt(5)}", i, rnd.nextLong(100000L).abs))
    val df = rows.toDF("key", "id", "ts")
    val w = 7000L
    val fast = Sessions.intervalSelfJoin(df, "key", "id", "ts", w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = df.select(col("key"), col("id").as("id_a"), col("ts").as("ts_a"))
    val b = df.select(col("key"), col("id").as("id_b"), col("ts").as("ts_b"))
    val naive = a.join(b, Seq("key"))
      .filter(col("ts_b") > col("ts_a") && col("ts_b") <= col("ts_a") + w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(naive.nonEmpty)
  }

  test("cohortRetention: known cohort matrix; diagonal cell counts users once") {
    val day = 86400L * 1000000000L
    // u1 first active day 0 (period 0), active again days 8, 9 (period 1)
    // u2 first active day 7 (period 1), active day 15 (period 2)
    // u3 first active day 0, never again
    val df = Seq(
      (1L, 0L * day), (1L, 8L * day), (1L, 9L * day),
      (2L, 7L * day), (2L, 15L * day),
      (3L, 0L * day)).toDF("user_id", "ts_ns")
    val out = Sessions.cohortRetention(df, "user_id", "ts_ns", periodDays = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("cohortRetention: per-user dedup adds no Exchange beyond the user shuffle") {
    val day = 86400L * 1000000000L
    val df = Seq.tabulate(500)(i => ((i % 40).toLong, (i % 23).toLong * day))
      .toDF("user_id", "ts_ns")
    val ret = Sessions.cohortRetention(df, "user_id", "ts_ns", periodDays = 7)
    ret.collect()
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    val fin = ret.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // hash(user) for first-touch agg + join; dedup rides it (subset rule);
    // final cohort×offset agg re-shuffles: 2 distinct exchanges total.
    val n = fin.collect { case s: ShuffleQueryStageExec => s.plan.canonicalized }
      .distinct.size
    assert(n <= 2, s"expected <=2 distinct shuffles, got $n:\n$fin")
  }
}
