package graft

import graft.operators.KMeans
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("round-1 assignment equals brute-force integer argmin") {
    val e = Tables.embeddings(spark, sfDir)
    val got = KMeans.integerLloydAssign(e, "vec_id", "embedding",
      k = 4, rounds = 1).as[(Long, Long, Long)].collect().toSet

    val q = e.select(col("vec_id"),
      KMeans.quantize(col("embedding"), 1000).as("v"))
      .as[(Long, Seq[Long])].collect()
    val cents = q.sortBy(_._1).take(4).map(_._2)
    val want = q.map { case (id, v) =>
      val scored = cents.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i.toLong)
      }
      val (d, i) = scored.min
      (id, i, d)
    }.toSet
    assert(got == want)
  }

  test("Lloyd rounds never increase total within-cluster distance") {
    val e = Tables.embeddings(spark, sfDir)
    val totals = (1 to 3).map { r =>
      KMeans.integerLloydAssign(e, "vec_id", "embedding", k = 8, rounds = r)
        .agg(sum("dist2")).as[Long].head()
    }
    // grid rounding can cost a few units per dim, so allow equality
    // plus the k·dim rounding slack rather than strict monotonicity
    assert(totals(1) <= totals(0) + 8 * 64)
    assert(totals(2) <= totals(1) + 8 * 64)
    assert(totals(2) < totals(0)) // and it genuinely improves here
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // Seeds are the 3 lowest ids. Vectors 1 and 2 are identical, so
    // cluster 1 (seed = id 2) empties after round 1's assignment
    // (ties break toward cluster 0); round 2 must still have 3 valid
    // centroids and assign id 2 back to cluster 0 or 1, not crash.
    val df = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)),
      (3L, Seq(10f, 10f)), (4L, Seq(10.1f, 10.1f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.integerLloydAssign(df, "vec_id", "embedding",
      k = 3, rounds = 3).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 4)
    assert(out(1L)._1 == 0L && out(2L)._1 == 0L)
    assert(out(3L)._1 == out(4L)._1)
  }
  test("farthestPointSample: hand-computed greedy selection and census") {
    // 1-D positions 0, 1, 10, 11, 5 (scale 1000). Seed = id 1 (pos 0);
    // round 1 argmax = id 4 (pos 11, d = 121e6); round 2 min-dists to
    // {0, 11} put id 5 (pos 5) on top at 25e6. Census ties go to the
    // lower ord.
    val df = Seq((1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(10f)),
      (4L, Seq(11f)), (5L, Seq(5f))).toDF("vec_id", "embedding")
    val got = KMeans.farthestPointSample(df, "vec_id", "embedding", k = 3)
      .orderBy("ord").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 2L),
      (1L, 4L, 121000000L, 2L),
      (2L, 5L, 25000000L, 1L)), s"got $got")
  }

  test("farthestPointSample: duplicate-heavy corpus never re-picks a center") {
    // three identical points + one distinct: after the distinct one is
    // taken, every remaining min-dist² is 0 — the selection must move
    // to the lowest UNSELECTED id with radius 0, not loop on the seed
    val df = Seq((1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0f, 0f)),
      (4L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val got = KMeans.farthestPointSample(df, "vec_id", "embedding", k = 3)
      .orderBy("ord").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 4L, 2L), s"got $got")
    assert(got(2)._3 == 0L, s"duplicate center must carry radius 0: $got")
    assert(got.map(_._2).distinct.size == 3)
  }

  test("farthestPointSample equals a driver-side greedy replay; radii non-increasing") {
    val e = Tables.embeddings(spark, sfDir)
    val got = KMeans.farthestPointSample(e, "vec_id", "embedding", k = 6)
      .orderBy("ord").as[(Long, Long, Long, Long)].collect().toSeq

    val q = e.select(col("vec_id"),
        KMeans.quantize(col("embedding"), 1000).as("v"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector((q.head._1, q.head._2, 0L))
    while (sel.size < 6) {
      val selIds = sel.map(_._1).toSet
      val next = q.filterNot(p => selIds(p._1))
        .map { case (id, v) => (id, v, sel.map(c => d2(v, c._2)).min) }
        .maxBy { case (id, _, d) => (d, -id) }
      sel :+= next
    }
    val counts = q.map { case (_, v) =>
      sel.zipWithIndex.map { case ((_, cv, _), i) => (d2(v, cv), i) }.min._2
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = sel.zipWithIndex.map { case ((id, _, r), i) =>
      (i.toLong, id, r, counts(i)) }
    assert(got == want)
    assert(got.drop(2).map(_._3).zip(got.drop(1).map(_._3))
      .forall { case (cur, prev) => cur <= prev },
      s"coverage radii must be non-increasing after ord 1: $got")
    assert(got.map(_._4).sum == q.length)
  }

  test("extendCoreset continues the greedy sequence exactly; drift pulls new centers") {
    val e = Tables.embeddings(spark, sfDir)
    val base = KMeans.farthestPointSample(e, "vec_id", "embedding", k = 6)
      .localCheckpoint(true)
    val centers = base.join(e, Seq("vec_id"))
      .select(col("ord"), col("vec_id"), col("embedding"))
    // prefix stability: extending the stored 6 by 3 over the SAME data
    // reproduces rows 6..8 of a fresh 9-center selection exactly
    val ext = KMeans.extendCoreset(centers, e, "vec_id", "embedding",
      kAdd = 3).as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val full = KMeans.farthestPointSample(e, "vec_id", "embedding", k = 9)
      .select("ord", "vec_id", "radius2")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(ext == full.drop(6), s"ext $ext vs full tail ${full.drop(6)}")
    // drifted data: a far-away cluster must win the first extension pick
    val drift = e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(30.0f)).as("embedding"))
    val pick = KMeans.extendCoreset(centers,
      e.select("vec_id", "embedding").unionByName(drift),
      "vec_id", "embedding", kAdd = 1)
      .as[(Long, Long, Long)].collect().head
    assert(pick._2 >= 1000000L,
      s"extension must reach into the drifted region: $pick")
    assert(pick._1 == 6L)
  }

  test("coresetCoverage is batch-decomposable: streaming micro-batch audits sum to the batch audit") {
    import org.apache.spark.sql.streaming.Trigger
    val e = Tables.embeddings(spark, sfDir).limit(300).localCheckpoint(true)
    val centers = KMeans.farthestPointSample(e, "vec_id", "embedding",
      k = 4).join(e, Seq("vec_id")).select(col("ord"), col("embedding"))
      .localCheckpoint(true) // stable store across micro-batches
    val dir = java.nio.file.Files.createTempDirectory("fpscov").toString
    val src = s"$dir/src"; new java.io.File(src).mkdirs()
    val rows = e.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    rows.grouped(100).foreach(g =>
      g.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(src))
    val acc = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    var nBatches = 0
    val q = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        nBatches += 1
        KMeans.coresetCoverage(centers, batch, maxRadius2 = 2000000L)
          .collect().foreach { r =>
            val (n, mx, ov) = acc.getOrElse(r.getLong(0), (0L, 0L, 0L))
            acc(r.getLong(0)) = (n + r.getLong(1),
              math.max(mx, r.getLong(2)), ov + r.getLong(4))
          }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches >= 2, s"wanted multiple micro-batches, got $nBatches")
    // n/max/over are per-point and additive — the stateless audit over
    // micro-batches reassembles the one-shot batch audit exactly
    val want = KMeans.coresetCoverage(centers, e, maxRadius2 = 2000000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(acc.toMap == want, s"streaming $acc vs batch $want")
  }

  test("coresetCoverage: hand-computed audit; ties to lower ord; empty center reads zeros") {
    // centers on a line at 0, 10, 100; batch at 1, 4, 5, 9, 12.
    // 5 is equidistant (25e6 both) → ties to ord 0. Budget 2e6:
    // ord 0 absorbs {1,4,5} (over: 4,5), ord 1 absorbs {9,12}
    // (over: 12), ord 2 absorbs nothing and must read zeros.
    val centers = Seq((0L, Seq(0f)), (1L, Seq(10f)), (2L, Seq(100f)))
      .toDF("ord", "embedding")
    val batch = Seq((1L, Seq(1f)), (2L, Seq(4f)), (3L, Seq(5f)),
      (4L, Seq(9f)), (5L, Seq(12f))).toDF("vec_id", "embedding")
    val got = KMeans.coresetCoverage(centers, batch,
      maxRadius2 = 2000000L)
      .orderBy("ord").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 25000000L, 14000000L, 2L),
      (1L, 2L, 4000000L, 2500000L, 1L),
      (2L, 0L, 0L, 0L, 0L)), s"got $got")
  }

  test("coreset store reads fail loudly on gapped or duplicated ords") {
    // The persisted-index-store invariant (ADVICE r14): a FILTERED
    // store (ord gap) or a DOUBLE-APPENDED store (duplicate ord) must
    // refuse, not silently duplicate coverage rows / continue ords
    // from last.ord into collisions.
    val batch = Seq((1L, Seq(1f)), (2L, Seq(4f))).toDF("vec_id", "embedding")
    val gapped = Seq((0L, 1L, Seq(0f)), (2L, 2L, Seq(100f)))
      .toDF("ord", "vec_id", "embedding")
    val dup = Seq((0L, 1L, Seq(0f)), (1L, 2L, Seq(10f)), (1L, 3L, Seq(20f)))
      .toDF("ord", "vec_id", "embedding")
    for (bad <- Seq(gapped, dup)) {
      val e1 = intercept[IllegalArgumentException] {
        KMeans.coresetCoverage(bad.select("ord", "embedding"), batch,
          maxRadius2 = 2000000L).collect()
      }
      assert(e1.getMessage.contains("must be exactly 0.."), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        KMeans.extendCoreset(bad, batch, "vec_id", "embedding", kAdd = 1)
          .collect()
      }
      assert(e2.getMessage.contains("must be exactly 0.."), e2.getMessage)
    }
    // a healthy 0..k-1 store still reads fine
    val ok = Seq((0L, 1L, Seq(0f)), (1L, 2L, Seq(10f)))
      .toDF("ord", "vec_id", "embedding")
    assert(KMeans.coresetCoverage(ok.select("ord", "embedding"), batch,
      maxRadius2 = 2000000L).count() == 2L)
  }

  test("simplifiedSilhouette: separated clusters read ~1e6, identical points read 0") {
    // k=2, rounds=1: centroids = the two lowest ids, one per cluster.
    // v2 joins c0: a=1, b=998001 -> 999998; v0: a=0, b=1e6 -> 1e6
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.001f, 0.0f))).toDF("vec_id", "embedding")
    val got = KMeans.simplifiedSilhouette(vecs, "vec_id", "embedding",
      k = 2, rounds = 1, scale = 1000)
      .orderBy("cluster").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 999999L), (1L, 1L, 1000000L)), s"got $got")
    // degenerate: identical points and centroids -> max(a,b)=0 -> s=0
    val flat = Seq((0L, Array(1.0f)), (1L, Array(1.0f)), (2L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val z = KMeans.simplifiedSilhouette(flat, "vec_id", "embedding",
      k = 2, rounds = 1, scale = 1000)
      .orderBy("cluster").as[(Long, Long, Long)].collect().toSeq
    assert(z.map(_._3).forall(_ == 0L), s"got $z")
  }

}
