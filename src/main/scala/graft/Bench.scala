package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Timing action: a `noop`-format write consumes every output row
    * through the complete physical plan — unlike `.count()`, which lets
    * Catalyst prune the trailing determinism ORDER BY and the output
    * projection, flattering the numbers. */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Queries that deliberately FORCE a scale regime the fixture doesn't
    * warrant (oracle coverage of the big-graph code path, not a
    * representative workload). They stay in `value`/`queries` but are
    * excluded from `core_value`, so round-over-round totals compare
    * without a mental footnote. */
  private[graft] val forcedRegime: Set[String] = Set("q145_cc_cobucket")

  /** Families whose first rep at the TARGET SF pays one-time costs the
    * sf0.001 warm-up can't burn: codec/mapPartitions queries JIT their
    * per-row decode loops only after thousands of invocations (sf0.001
    * has ~600 docs), and the iterative-graph loops JIT per-round
    * codegen + checkpoint paths. One untimed target-SF rep each.
    *
    * What this does NOT cure — the recurring ~16 s q143 outlier rep
    * (r7 spread 7.8 s, r8 15.8 s): round-9 instrumentation
    * (SPARK_GRAFT_DEBUG per-rep GC + task profile) measured 13 q143
    * reps across isolated and full-suite runs at gcSec <= 0.1,
    * taskMax <= 0.6 s, taskTotal a constant ~20-24 s — so the
    * outlier is EXTERNAL CPU contention, not JIT or GC: q143 packs
    * ~21 s of task CPU into ~0.9 s wall (the suite's highest CPU
    * density), so a competing load burst during its window inflates
    * wall near-proportionally (16 s ≈ 1.3 effective cores), exactly
    * when r8's first timed queries (q01/q02) were also elevated.
    * Diagnostic signature of a contended rep: wall up, taskTotal
    * unchanged. In-task slowdown would inflate taskTotal too. */
  private[graft] val warmAtTargetSf: Set[String] = Set(
    "q37_media_meta", "q38_media_features", "q39_frame_counts",
    "q143_video_frames", "q144_audio_features", "q153_image_dhash",
    "q154_audio_fp",
    "q48_dup_clusters", "q65_pagerank", "q111_triangles",
    "q114_label_prop", "q122_kcore", "q125_ppr", "q131_hits",
    "q136_bfs", "q145_cc_cobucket", "q150_sssp")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-reader warm-up on the tiny sf so the timed runs
    // measure steady-state throughput, not one-time cost: running every
    // query shape at sf0.001 compiles its whole-stage codegen (Janino
    // caches by generated source, which is identical across data dirs)
    // and JITs the hot paths. Standard benchmarking practice; the timed
    // loop below still does all its own IO/compute at the target SF.
    // SPARK_GRAFT_ONLY=q65_pagerank,q28_minhash_neardup narrows the run
    // while iterating on one query's plan
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    try exec(SparkEntry.entry(spark)) catch { case _: Throwable => }
    val warmDir = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try exec(fn(spark, warmDir)) catch { case _: Throwable => }
    }
    // One untimed TARGET-SF rep for the codec and iterative-graph
    // families (see warmAtTargetSf) — their dominant one-time cost is
    // data-volume-dependent JIT that the tiny-SF pass cannot reach.
    selected.foreach { case (name, fn) =>
      if (warmAtTargetSf.contains(name))
        try exec(fn(spark, sfDir)) catch { case _: Throwable => }
    }
    // Drop every warm-up InMemoryRelation so the timed loop can never
    // read a cache built above — even when the target SF IS sf0.001.
    // (Janino's generated-code cache is JVM-level and survives this.)
    spark.catalog.clearCache()
    // Per-query time = min over reps (3 by default): one-off JIT/GC
    // hiccups otherwise masquerade as plan regressions between rounds.
    // The per-query SPREAD (max - min over reps) is emitted alongside so
    // a load-contaminated run is distinguishable from a regression: a
    // genuine plan regression reproduces across reps (small spread,
    // higher min); ambient load inflates some reps only (large spread).
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    // A throwing query must NOT clock a fake fail-fast time (round 4's
    // artifact recorded 43 broken queries at ~0.05 s, flattering the
    // total): it is reported as JSON null (type-stable for numeric
    // consumers, unlike the old "err" string) and excluded from the
    // total; the error itself goes to stderr.
    // SPARK_GRAFT_DEBUG=1: per-rep line to stderr with the rep's wall
    // time and the JVM-wide GC time/count delta across it — the
    // instrument for outlier-rep forensics (is a recurring slow rep GC,
    // or genuinely slower work?). Stderr so the stdout JSON contract is
    // untouched.
    val debug = sys.env.get("SPARK_GRAFT_DEBUG").exists(_ != "0")
    val gcBeans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcNow(): (Long, Long) = {
      var t = 0L; var c = 0L
      gcBeans.forEach { b => t += b.getCollectionTime; c += b.getCollectionCount }
      (t, c)
    }
    // Debug task profile: total task-time and the single longest task
    // per rep — distinguishes one-slow-task skew (taskMax ≈ rep wall,
    // taskTotal small) from a JVM-wide slowdown (everything inflated).
    val taskTotalMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMaxMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskN = new java.util.concurrent.atomic.AtomicLong(0)
    if (debug) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          taskTotalMs.addAndGet(d)
          taskN.incrementAndGet()
          taskMaxMs.updateAndGet(m => math.max(m, d))
          ()
        }
      })
    val results: Seq[(String, Option[(Double, Double)])] =
      selected.map { case (name, fn) =>
        var failed = false
        val ts = (0 until reps).map { rep =>
          if (debug) {
            Thread.sleep(300) // let the async listener bus drain
            taskTotalMs.set(0); taskMaxMs.set(0); taskN.set(0)
          }
          val (gt0, gc0) = if (debug) gcNow() else (0L, 0L)
          val t0 = System.nanoTime()
          try { exec(fn(spark, sfDir)) }
          catch { case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          val sec = (System.nanoTime() - t0) / 1e9
          if (debug) {
            val (gt1, gc1) = gcNow()
            Thread.sleep(300)
            System.err.println(
              f"[bench-debug] $name rep=$rep%d sec=$sec%.3f " +
                f"gcSec=${(gt1 - gt0) / 1e3}%.3f gcN=${gc1 - gc0}%d " +
                f"taskTotalSec=${taskTotalMs.get / 1e3}%.3f " +
                f"taskMaxSec=${taskMaxMs.get / 1e3}%.3f tasks=${taskN.get}%d")
          }
          sec
        }
        name -> (if (failed) None else Some((ts.min, ts.max - ts.min)))
      }
    def fmt(sel: ((Double, Double)) => Double): String = results.map {
      case (k, v) =>
        "\"" + k + "\":" + v.map(t =>
          "%.4f".formatLocal(java.util.Locale.ROOT, sel(t))).getOrElse("null")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2.map(_._1)).sum
    // core_value excludes the deliberately-forced-regime queries so
    // round-over-round totals are comparable without footnotes; `value`
    // stays the all-in total for continuity with earlier rounds.
    val coreTotal = results.collect {
      case (name, Some((t, _))) if !forcedRegime.contains(name) => t }.sum
    val forced = forcedRegime.intersect(selected.map(_._1).toSet)
      .toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"core_value":$coreTotal,"forced_regime":$forced,"unit":"sec","queries":${fmt(_._1)},"spread":${fmt(_._2)},"reps":$reps,"sf":"$sfDir"}"""
    // The JSON line goes out FIRST and flushed — before spark.stop()'s
    // shutdown chatter — because two prior rounds' driver-side parse of
    // stdout came back null (tail truncation). It is also persisted as a
    // file artifact, which is the authoritative copy.
    println(line)
    System.out.flush()
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
