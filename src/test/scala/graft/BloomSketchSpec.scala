package graft

import graft.operators.{Bloom, Corpus, Dedup, Profile, Sketch}
import org.apache.spark.sql.functions._

/** Bloom join pruning, KMV cardinality sketch, profiling, collocations,
  * span dedup — the round-3 additions. */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: zero false negatives — every build key passes the probe") {
    val dim = (1L to 500L).toDF("k")
    val bits = Bloom.buildBits(dim, "k", mBits = 4096)
    val misses = dim.filter(!Bloom.mightContain(bits, col("k"), 4096)).count()
    assert(misses === 0L)
  }

  test("bloom: prunes most non-members at a sane false-positive rate") {
    val dim = (1L to 200L).toDF("k")
    val bits = Bloom.buildBits(dim, "k", mBits = 4096)
    val probe = (10001L to 20000L).toDF("k") // disjoint from the build
    val fp = probe.filter(Bloom.mightContain(bits, col("k"), 4096)).count()
    // ~400/4096 bits set, k=2 → FPP ≈ (0.1)² ≈ 1%; allow generous slack
    assert(fp < 500, s"false-positive count $fp out of 10000 is too high")
  }

  test("bloom: bitset size is bound by mBits, not build cardinality") {
    val big = (1L to 50000L).toDF("k")
    val bits = Bloom.buildBits(big, "k", mBits = 1024)
    assert(bits.length === 1024 / 64)
    // saturated filter: everything passes, nothing is ever missed
    val pass = big.filter(Bloom.mightContain(bits, col("k"), 1024)).count()
    assert(pass === 50000L)
  }

  test("bloom: pruneJoin survivor set is a superset of the exact semi-join") {
    val fact = (1L to 2000L).toDF("k")
    val dim = (1L to 2000L by 13).toDF("k")
    val pruned = Bloom.pruneJoin(fact, "k", dim, "k", mBits = 2048)
      .select("k").as[Long].collect().toSet
    val exact = fact.join(dim, Seq("k"), "left_semi")
      .as[Long].collect().toSet
    assert(exact.subsetOf(pruned))
    assert(pruned.size < 2000, "bloom pruned nothing")
  }

  test("kmv: exact count below k, estimate within tolerance above") {
    val df = (1L to 5000L).map(i => (if (i <= 2500) "a" else "b", i))
      .toDF("g", "k")
    // group a: 2500 distinct; group b: 2500 distinct
    val est = Sketch.kmvDistinct(df, "k", Seq("g"), k = 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((_, (e, exact)) <- est) {
      assert(exact === 2500L)
      // relative error ~1/√k ≈ 6.3%; the md5 draw here lands at 12.7%/0.7%
      assert(math.abs(e - 2500.0) / 2500.0 < 0.2, s"estimate $e too far from 2500")
    }
    val small = Sketch.kmvDistinct(df.filter(col("k") <= 50), "k", Seq("g"), k = 256)
      .collect()
    assert(small.forall(r => r.getLong(1) === r.getLong(2)),
      "below k the estimate must equal the exact count")
  }

  test("bloom/kmv: null keys are skipped, matching SQL join/ndv semantics") {
    val dim = Seq(Some(1L), Some(2L), None).toDF("k")
    val bits = Bloom.buildBits(dim, "k", mBits = 1024) // must not NPE
    val probe = Seq(Some(1L), None).toDF("k")
    // null probe key: mightContain is null → filter drops it, like a join
    assert(probe.filter(Bloom.mightContain(bits, col("k"), 1024)).count() === 1L)
    val kmv = Sketch.kmvDistinct(
      Seq(Some(1L), Some(2L), None).toDF("k").withColumn("g", lit("x")),
      "k", Seq("g"), k = 8).collect()
    assert(kmv.head.getLong(2) === 2L) // exact_ndv ignores the null
  }

  test("kmvSetOps: exact below k, overlap and jaccard from sketches alone") {
    // |A| = 60 (1..60), |B| = 40 (41..80), |A∩B| = 20, |A∪B| = 80 —
    // all below k=256, so every estimate must be EXACT
    val a = (1L to 60L).toDF("k")
    val b = (41L to 80L).toDF("k")
    val r = Sketch.kmvSetOps(a, b, "k", k = 256).head()
    assert(r.getAs[Long]("est_a") === 60L)
    assert(r.getAs[Long]("est_b") === 40L)
    assert(r.getAs[Long]("est_union") === 80L)
    assert(r.getAs[Long]("match_k") === 20L)
    assert(r.getAs[Long]("est_inter") === 20L)
    assert(r.getAs[Long]("jaccard_ppm") === 250000L) // 20/80
    // estimator regime: 2500 vs 2500 with 1250 shared, k=256
    val a2 = (1L to 2500L).toDF("k")
    val b2 = (1251L to 3750L).toDF("k")
    val r2 = Sketch.kmvSetOps(a2, b2, "k", k = 256).head()
    assert(math.abs(r2.getAs[Long]("est_union") - 3750.0) / 3750.0 < 0.2)
    assert(math.abs(r2.getAs[Long]("est_inter") - 1250.0) / 1250.0 < 0.35)
    // partitioning-independent (deterministic md5 sketches)
    val r3 = Sketch.kmvSetOps(a2.repartition(13), b2.repartition(7), "k", 256)
      .head()
    assert(r2 === r3)
  }

  test("hll: estimate lands within the m=64 error envelope of exact ndv") {
    val df = (1L to 6000L).map(i => (if (i <= 4000) "a" else "b", i))
      .toDF("g", "k")
    // group a: 4000 distinct, group b: 2000 distinct
    val regs = Sketch.hllRegisters(df, "k", Seq("g"), b = 6)
    val est = Sketch.hllEstimate(regs, Seq("g"), b = 6).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // σ ≈ 1.04/√64 = 13%; the deterministic md5 draw is fixed, allow 2σ
    assert(math.abs(est("a") - 4000.0) / 4000.0 < 0.26, s"a: ${est("a")}")
    assert(math.abs(est("b") - 2000.0) / 2000.0 < 0.26, s"b: ${est("b")}")
  }

  test("hll: small-range linear counting is near-exact at tiny ndv") {
    val df = (1L to 20L).toDF("k").withColumn("g", lit("x"))
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, "k", Seq("g"), b = 6), Seq("g"), b = 6)
      .collect().head.getDouble(1)
    assert(math.abs(est - 20.0) < 3.0, s"linear-counting estimate $est")
  }

  test("hll: registers merge by bucket-wise max — shards compose exactly") {
    val a = (1L to 1500L).toDF("k").withColumn("g", lit("x"))
    val b = (1000L to 2500L).toDF("k").withColumn("g", lit("x"))
    val direct = Sketch.hllRegisters(a.unionByName(b), "k", Seq("g"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "k", Seq("g"))
        .unionByName(Sketch.hllRegisters(b, "k", Seq("g"))), Seq("g"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(merged === direct)
  }

  test("hll: register table is bounded by 2^b rows per group, rho in range") {
    val df = (1L to 100000L).toDF("k").withColumn("g", lit("x"))
    val regs = Sketch.hllRegisters(df, "k", Seq("g"), b = 6).collect()
    assert(regs.length <= 64)
    assert(regs.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 27))
  }

  test("kmv: bottom-k sketches merge — union's bottom-k = bottom-k of merged parts") {
    val a = (1L to 1000L).toDF("k")
    val b = (800L to 1800L).toDF("k") // overlapping ranges
    def bottomK(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      df.select(Sketch.md5Uniform32(col("k")).as("h")).distinct()
        .orderBy("h").limit(k).as[Long].collect().toSeq
    val k = 64
    val merged = (bottomK(a, k) ++ bottomK(b, k)).distinct.sorted.take(k)
    val direct = bottomK(a.unionByName(b), k)
    assert(merged === direct)
  }

  test("profile: one-pass stats match direct computation") {
    val df = Seq((1, "x"), (2, "y"), (3, null), (3, "y")).toDF("a", "b")
    val p = Profile.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("a").getLong(1) === 4L) // n_rows
    assert(p("a").getLong(2) === 4L) // n_nonnull
    assert(p("a").getLong(3) === 3L) // n_distinct
    assert(p("a").getString(4) === "1" && p("a").getString(5) === "3")
    assert(p("b").getLong(2) === 3L)
    assert(p("b").getLong(3) === 2L)
    assert(p("b").getString(4) === "x" && p("b").getString(5) === "y")
  }

  test("profile: empty input still reports every column with zero counts") {
    val empty = Seq((1, "x")).toDF("a", "b").filter(lit(false))
    val p = Profile.profile(empty, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("a", "b"))
    assert(p("a").getLong(1) === 0L && p("a").getLong(2) === 0L
      && p("a").getLong(3) === 0L)
    assert(p("b").isNullAt(4) && p("b").isNullAt(5))
  }

  test("collocations: planted pair surfaces, independent pair does not") {
    // "aa bb" always adjacent (lift ≫ 1); "cc"/"dd" never adjacent
    val docs = (1 to 50).map(i => s"aa bb cc ee$i dd ff$i").toDF("text")
    val out = Corpus.collocations(docs, "text", minPairCount = 10L,
      liftNum = 2L, liftDen = 1L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(out.contains(("aa", "bb")))
    assert(!out.contains(("cc", "dd")))
  }

  test("spanDedup: cross-doc duplicate spans keep only the first occurrence") {
    val span = (1 to 8).map(i => s"t$i").mkString(" ") // one exact 8-token span
    val docs = Seq(
      (1L, span + " unique one two three four five six seven"),
      (2L, span + " other eight nine ten eleven twelve thirteen fourteen"),
      (3L, "totally different words that never repeat anywhere at all"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((2L, 2L))) // first occurrence: everything kept
    assert(out(2L) === ((2L, 1L))) // shared span deduplicated away
    assert(out(3L)._1 === out(3L)._2) // no dups → all kept
  }
  test("logHistQuantiles: estimate is a true value within the bucket-width bound") {
    import graft.operators.{Aggregations, Sketch}
    val df = (1L to 10000L).map(("g", _)).toDF("g", "v")
    val est = Sketch.logHistQuantiles(df, Seq("g"), "v",
      Seq(500000L, 990000L)).as[(String, Long, Long, Long)].collect().head
    val exact = Aggregations.quantilesDisc(
      df.withColumn("__w", org.apache.spark.sql.functions.lit(1L)),
      Seq("g"), "v", "__w", Seq(500000L, 990000L))
      .select("g", "p500000", "p990000")
      .as[(String, Long, Long)].collect().head
    assert(est._2 == 10000L)
    // est = min of the crossing bucket: a TRUE data value, <= exact,
    // and within the <=25% relative bucket width below it
    for ((e, x) <- Seq((est._3, exact._2), (est._4, exact._3))) {
      assert(e <= x, s"estimate $e above exact $x")
      assert(e * 5 >= x * 4, s"estimate $e more than 25% below exact $x")
    }
    // partitioning invariance (the mergeability the histogram claims)
    val rep = Sketch.logHistQuantiles(df.repartition(7), Seq("g"), "v",
      Seq(500000L, 990000L)).as[(String, Long, Long, Long)].collect().head
    assert(rep == est)
    // NULL / sub-1 values excluded by contract
    val guarded = Sketch.logHistQuantiles(
      (Seq(0L, 1L, 2L, 3L)).map(("g", _)).toDF("g", "v"),
      Seq("g"), "v", Seq(500000L)).as[(String, Long, Long)].collect().head
    assert(guarded._2 == 3L)
  }

  test("logHistQuantilesTrailing: each day equals the point sketch over its window") {
    import graft.operators.Sketch
    // 2 groups x 10 days, day-varying magnitudes so windows differ
    val rows = for {
      g <- Seq("a", "b"); d <- 0L to 9L; i <- 1L to 40L
    } yield (g, d, i * (d + 1))
    val df = rows.toDF("g", "d", "v")
    val got = Sketch.logHistQuantilesTrailing(df, Seq("g"), "d", "v",
      windowDays = 3, Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // oracle: the POINT sketch over exactly the window's rows
    val exp = (for { g <- Seq("a", "b"); day <- 0L to 9L } yield {
      val win = rows.filter(r => r._1 == g && r._2 <= day && r._2 >= day - 2)
        .map(r => (g, r._3)).toDF("g", "v")
      val p = Sketch.logHistQuantiles(win, Seq("g"), "v",
        Seq(500000L, 990000L)).as[(String, Long, Long, Long)].collect().head
      (g, day, p._2, p._3, p._4)
    }).toSeq
    assert(got == exp)
    // partitioning invariance (mergeability)
    val rep = Sketch.logHistQuantilesTrailing(df.repartition(7), Seq("g"),
      "d", "v", windowDays = 3, Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(rep == got)
    // inactive days emit nothing: a gap day has no output row
    val sparse = Seq(("g", 0L, 5L), ("g", 5L, 7L)).toDF("g", "d", "v")
    val days = Sketch.logHistQuantilesTrailing(sparse, Seq("g"), "d", "v",
      windowDays = 3, Seq(500000L))
      .select("day").as[Long].collect().sorted.toSeq
    assert(days == Seq(0L, 5L))
  }

  test("logHistCells: parquet store + appended split batches == full recompute") {
    import graft.operators.Sketch
    val rows = for {
      g <- Seq("a", "b"); d <- 0L to 9L; i <- 1L to 30L
    } yield (g, d, i * (d + 1))
    val df = rows.toDF("g", "d", "v")
    // history persists as cells; day 9 arrives as TWO disjoint batches
    // (sum/min re-reduce merges split cells of one day — append IS merge)
    val dir = java.nio.file.Files.createTempDirectory("graft-cells").toString
    Sketch.logHistCells(df.filter(col("d") < 9), Seq("g"), "d", "v")
      .write.mode("overwrite").parquet(dir)
    val b1 = Sketch.logHistCells(
      df.filter(col("d") === 9 && col("v") % 2 === 0), Seq("g"), "d", "v")
    val b2 = Sketch.logHistCells(
      df.filter(col("d") === 9 && col("v") % 2 =!= 0), Seq("g"), "d", "v")
    val store = spark.read.parquet(dir).unionByName(b1).unionByName(b2)
    val inc = Sketch.logHistQuantilesTrailingFromCells(store, Seq("g"),
      windowDays = 3, Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val full = Sketch.logHistQuantilesTrailing(df, Seq("g"), "d", "v",
      windowDays = 3, Seq(500000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(inc == full && inc.nonEmpty)
  }

  test("logHistQuantilesAt: one window position = full-store slice; store scan is day-pruned") {
    import graft.operators.Sketch
    val rows = for {
      g <- Seq("a", "b"); d <- 0L to 9L; i <- 1L to 30L
    } yield (g, d, i * (d + 1))
    val df = rows.toDF("g", "d", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-cells-at").toString
    Sketch.logHistCells(df, Seq("g"), "d", "v")
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    val at = Sketch.logHistQuantilesAt(store, Seq("g"), day = 7L,
      windowDays = 3, Seq(500000L, 990000L))
    val got = at.as[(String, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    val full = Sketch.logHistQuantilesTrailingFromCells(store, Seq("g"),
      windowDays = 3, Seq(500000L, 990000L))
      .filter(col("day") === 7L)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == full && got.nonEmpty)
    // the point of the store: serving one position READS only the w-day
    // range — the range predicate reaches the parquet scan as a pushed
    // filter, never a post-scan residual over full history
    val scans = at.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    // cell branch: the w-day range; day-list branch: Catalyst pushes the
    // emitted-day equality through the join — BOTH store reads are pruned
    assert(scans.exists(l => l.contains("GreaterThanOrEqual(day,5)") &&
      l.contains("LessThanOrEqual(day,7)")),
      s"day range not pushed to the cell scan: $scans")
    assert(scans.nonEmpty && scans.forall(l =>
      l.contains("(day,5)") || l.contains("(day,7)")),
      s"a store scan reads unpruned history: $scans")
  }

  test("hllRegistersAt: one position from a persisted register store = trailing slice") {
    import graft.operators.Sketch
    val rows = for {
      d <- 0L to 6L; i <- 1L to 120L
    } yield ("g", d, d * 37L + i % (30L + d * 10L))
    val df = rows.toDF("g", "d", "k")
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-at").toString
    Sketch.hllRegisters(df, "k", Seq("g", "d")).write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    val at = Sketch.hllRegistersAt(store, Seq("g"), "d", day = 5L,
      windowDays = 4)
    val got = at.as[(String, Long, Int, Int)].collect().sortBy(_._3).toSeq
    val full = Sketch.hllRegistersTrailing(df, "k", Seq("g"), "d",
      windowDays = 4)
      .filter(col("day") === 5L)
      .as[(String, Long, Int, Int)].collect().sortBy(_._3).toSeq
    assert(got == full && got.nonEmpty)
    // the register-store scan reads only the 4-day range
    val scans = at.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    assert(scans.exists(l => l.contains("GreaterThanOrEqual(d,2)") &&
      l.contains("LessThanOrEqual(d,5)")),
      s"day range not pushed to the register store scan: $scans")
  }

  test("hllRegistersTrailing: merged registers equal the union's registers") {
    import graft.operators.Sketch
    val rows = for {
      d <- 0L to 6L; i <- 1L to 120L
    } yield ("g", d, d * 37L + i % (30L + d * 10L))
    val df = rows.toDF("g", "d", "k")
    val got = Sketch.hllRegistersTrailing(df, "k", Seq("g"), "d",
      windowDays = 4)
      .as[(String, Long, Int, Int)].collect()
      .sortBy(r => (r._2, r._3)).toSeq
    val exp = (for (day <- 0L to 6L) yield {
      val win = rows.filter(r => r._2 <= day && r._2 >= day - 3)
        .map(r => ("g", r._3)).toDF("g", "k")
      Sketch.hllRegisters(win, "k", Seq("g"))
        .as[(String, Int, Int)].collect().map(r => ("g", day, r._2, r._3))
    }).flatten.sortBy(r => (r._2, r._3)).toSeq
    assert(got == exp && got.nonEmpty)
  }

}
