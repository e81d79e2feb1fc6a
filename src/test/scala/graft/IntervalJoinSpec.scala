package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random intervals (LCG, no RNG state)
  private def lcg(i: Long): Long = (i * 6364136223846793005L + 1442695040888963407L) >>> 33
  private val leftRows = (1 to 300).map { i =>
    val lo = lcg(i) % 1000
    (i.toLong, (i % 5).toLong, lo, lo + lcg(i + 7000) % 90)
  }
  private val rightRows = (1 to 120).map { i =>
    val lo = lcg(i + 40000) % 1000
    (i.toLong, (i % 5).toLong, lo, lo + lcg(i + 90000) % 150)
  }
  private lazy val L = leftRows.toDF("lid", "k", "ls", "le")
  private lazy val R = rightRows.toDF("rid", "k", "rs", "re")

  private lazy val naive: Set[(Long, Long)] = {
    val rs = rightRows.groupBy(_._2)
    leftRows.flatMap { case (lid, k, ls, le) =>
      rs.getOrElse(k, Nil).collect {
        case (rid, _, s, e) if ls <= e && s <= le => (lid, rid)
      }
    }.toSet
  }

  test("binned overlap join matches the naive cross-filter, exactly once") {
    for (bcast <- Seq(true, false); w <- Seq(16L, 64L, 1024L)) {
      val got = IntervalJoin.overlapJoin(L, R, "ls", "le", "rs", "re",
          keyCols = Seq("k"), binWidth = w, broadcastRight = bcast)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dups at w=$w bcast=$bcast")
      assert(got.toSet == naive, s"mismatch at w=$w bcast=$bcast")
    }
  }

  test("no equi-keys: global overlap; date columns auto-convert") {
    val dl = Seq((1L, "2024-01-01", "2024-01-20"), (2L, "2024-03-01", "2024-03-05"))
      .toDF("lid", "a", "b")
      .select(col("lid"), col("a").cast("date").as("ls"), col("b").cast("date").as("le"))
    val dr = Seq((10L, "2024-01-15", "2024-02-10"), (11L, "2024-02-20", "2024-02-28"))
      .toDF("rid", "a", "b")
      .select(col("rid"), col("a").cast("date").as("rs"), col("b").cast("date").as("re"))
    val got = IntervalJoin.overlapJoin(dl, dr, "ls", "le", "rs", "re")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("touching endpoints overlap (closed intervals); disjoint do not") {
    val a = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val b = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(a, b, "ls", "le", "rs", "re")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("broadcast regime leaves the probe side unshuffled") {
    val plan = IntervalJoin.overlapJoin(L, R, "ls", "le", "rs", "re",
        keyCols = Seq("k"), broadcastRight = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"))
  }
}
