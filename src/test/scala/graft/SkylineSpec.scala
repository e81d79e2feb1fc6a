package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2D: hand-computed frontier, dominated and duplicate rows drop") {
    val pts = Seq((1L, 5L), (2L, 3L), (3L, 1L), (2L, 5L), (1L, 9L), (2L, 5L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val out = Skyline.skyline2D(pts, Seq("g"), "x", "y")
      .select("x", "y").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 9L), (2L, 5L), (3L, 1L)))
  }

  test("skyline2D matches brute-force dominance on a pseudo-random set") {
    val raw = (1 to 400).map { i =>
      (s"g${i % 3}", (i * 37 % 53).toLong, (i * 101 % 47).toLong)
    }
    val out = Skyline.skyline2D(raw.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .as[(String, Long, Long)].collect().toSet
    val want = raw.distinct.groupBy(_._1).flatMap { case (_, ps) =>
      val pts = ps.map(p => (p._2, p._3)).distinct
      pts.filterNot(p => pts.exists(q => q != p &&
        q._1 >= p._1 && q._2 >= p._2))
        .map(p => (ps.head._1, p._1, p._2))
    }.toSet
    assert(out == want && out.nonEmpty)
  }

  test("skyline2D frontier is strictly monotone: x up, y down") {
    val raw = (1 to 300).map(i => ("g", (i * 7 % 31).toLong, (i * 13 % 29).toLong))
    val f = Skyline.skyline2D(raw.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .orderBy("x").select("x", "y").as[(Long, Long)].collect()
    f.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) => assert(x1 < x2 && y1 > y2)
      case _ => ()
    }
  }
}
