package graft

import graft.operators.Spectral

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("dominantDirection: single-vector fixed point, exact integers") {
    // A = [(0.3, 0.4)]: the dominant direction IS the vector; max-abs
    // normalization lands on (750000, 1000000) and stays there.
    val e = Seq((1L, Array(0.3f, 0.4f))).toDF("vec_id", "embedding")
    val v1 = Spectral.dominantDirection(e, "vec_id", "embedding", rounds = 1)
      .as[(Int, Long)].collect().toMap
    assert(v1 == Map(0 -> 750000L, 1 -> 1000000L))
    val v3 = Spectral.dominantDirection(e, "vec_id", "embedding", rounds = 3)
      .as[(Int, Long)].collect().toMap
    assert(v3 == v1)
  }

  test("dominantDirection: axis-aligned cloud finds the axis, partition-independent") {
    // strong x-axis spread, weak y noise: leading direction ~ x-axis
    val rows = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(-0.9f, 0.04f)),
      (3L, Array(0.8f, -0.06f)), (4L, Array(-1.0f, -0.03f)),
      (5L, Array(0.95f, 0.02f)))
    val e = rows.toDF("vec_id", "embedding")
    val v = Spectral.dominantDirection(e, "vec_id", "embedding", rounds = 3)
      .as[(Int, Long)].collect().toMap
    assert(math.abs(v(0)) == 1000000L)
    assert(math.abs(v(1)) < 150000L)
    val rep = Spectral.dominantDirection(e.repartition(7), "vec_id",
      "embedding", rounds = 3).as[(Int, Long)].collect().toMap
    assert(rep == v)
  }

  test("dominantDirection: renormalization survives iterates past 64-bit products") {
    // quantScale = 1e9 makes the matvec outputs ~1e16, so the former
    // bigint renorm product (w * normScale ≈ 1e22) wrapped 64 bits and
    // threw under ANSI — the DECIMAL(38,0) route must stay exact. The
    // 1-vector fixed point is still the vector itself.
    val e = Seq((1L, Array(6.0f, 8.0f))).toDF("vec_id", "embedding")
    val v = Spectral.dominantDirection(e, "vec_id", "embedding",
      rounds = 2, quantScale = 1000000000L)
      .as[(Int, Long)].collect().toMap
    assert(v == Map(0 -> 750000L, 1 -> 1000000L))
  }

  test("deflatedDirections: second axis recovered, partition-independent") {
    // dominant x spread + independent weaker y spread: v1 ~ x-axis, and
    // after exact deflation the residual iteration must find ~y
    val rows = Seq(
      (1L, Array(1.0f, 0.3f)), (2L, Array(-1.0f, 0.3f)),
      (3L, Array(0.9f, -0.3f)), (4L, Array(-0.9f, -0.3f)),
      (5L, Array(1.0f, 0.29f)), (6L, Array(-1.0f, -0.29f)))
    val e = rows.toDF("vec_id", "embedding")
    val got = Spectral.deflatedDirections(e, "vec_id", "embedding",
      rounds = 3).as[(Int, Long, Long)].collect().sortBy(_._1)
    val v1 = got.map(_._2); val v2 = got.map(_._3)
    assert(math.abs(v1(0)) == 1000000L && math.abs(v1(1)) < 400000L,
      s"v1 should hug x: ${v1.toSeq}")
    assert(math.abs(v2(1)) == 1000000L && math.abs(v2(0)) < 400000L,
      s"v2 should hug y: ${v2.toSeq}")
    val rep = Spectral.deflatedDirections(e.repartition(5), "vec_id",
      "embedding", rounds = 3).as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == got.toSeq)
  }

  test("labelProjections: drifted label separates, exact integer means") {
    // label 0 sits at +x, label 1 at -x; direction is the x axis, so
    // the mean projections must straddle zero and mirror approximately
    val rows = (1L to 6L).map { i =>
      val s = if (i <= 3) 1.0f else -1.0f
      (i, Array(s * (0.8f + 0.05f * i), 0.01f * i), if (i <= 3) 0 else 1)
    }
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = Spectral.labelProjections(e, "vec_id", "embedding", "label",
      rounds = 2).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L)._1 == 3L && got(1L)._1 == 3L)
    assert(got(0L)._2 * got(1L)._2 < 0)   // opposite sides of the axis
    val rep = Spectral.labelProjections(e.repartition(5), "vec_id",
      "embedding", "label", rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep == got)
  }
}
