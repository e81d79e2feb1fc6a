package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-point pagerank: symmetric star concentrates rank on the hub") {
    // star: 1 ↔ {2,3,4}
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRankFixedPoint(e, iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L))
    assert(r(2L) == r(3L) && r(3L) == r(4L)) // symmetry is exact (integer math)
  }

  test("fixed-point pagerank is partitioning-independent") {
    val e = Seq.tabulate(200)(i => (i.toLong % 50, (i * 7 % 50).toLong))
      .toDF("src", "dst").filter(col("src") =!= col("dst"))
    val a = Graph.pageRankFixedPoint(e.repartition(1), 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = Graph.pageRankFixedPoint(e.repartition(13), 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("driver-state and distributed regimes agree exactly") {
    val e = Seq.tabulate(300)(i => ((i % 60).toLong, (i * 11 % 60).toLong))
      .toDF("src", "dst").filter(col("src") =!= col("dst"))
    val small = Graph.pageRankFixedPoint(e, 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val big = Graph.pageRankFixedPoint(e, 4, broadcastNodeLimit = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(small == big)
  }

  test("dangling nodes keep the base rank") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // 2 has no out-edges
    val r = Graph.pageRankFixedPoint(e, 2).as[(Long, Long)].collect().toMap
    // node 1 receives nothing → base 150000 after first round
    assert(r(1L) == 150000L)
    assert(r(2L) > r(1L))
  }
}
