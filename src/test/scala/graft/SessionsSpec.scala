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
}
