package graft.operators

import graft.expressions.TopKHeap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketching: the K-Minimum-Values (KMV / bottom-k)
  * distinct-count estimator (Bar-Yossef et al. 2002 — the order-statistics
  * family HyperLogLog also belongs to).
  *
  * Estimate: hash every key to a uniform 32-bit value, keep the k
  * smallest DISTINCT hashes; if the k-th smallest is h₍ₖ₎, the keys are
  * roughly evenly spaced every h₍ₖ₎/(k−1) of the hash space, so
  * ndv ≈ (k−1)·2³² / h₍ₖ₎ (relative error ~1/√k). Groups with fewer
  * than k distinct hashes report their exact count.
  *
  * Why not `approx_count_distinct`: Spark's HLL++ is neither cross-
  * engine reproducible nor an inspectable artifact. KMV over the
  * portable md5 uniform (CLAUDE.md hash-family invariants) is exact
  * integer arithmetic end-to-end — the estimate itself hash-matches a
  * DuckDB oracle — and the bottom-k set is a mergeable sketch: the
  * union's bottom-k is the bottom-k of the per-part unions, so
  * per-partition/per-day sketches compose without rescanning.
  *
  * Scale shape: one distinct-agg shuffle of (group, hash) — O(ndv)
  * narrow rows — then a bounded-heap aggregate ([[TopKHeap]]) whose
  * map-side buffers never exceed k entries and whose final shuffle is
  * O(groups·k). No window sort over whole groups, no hot-key buffering.
  */
object Sketch {

  /** The portable 32-bit uniform hash (same family as Corpus.hashSample;
    * DuckDB: `('0x'||substr(md5(CAST(x AS VARCHAR)),1,8))::BIGINT`). */
  def md5Uniform32(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("bigint")

  /** Per-group KMV ndv estimate next to the exact count.
    *
    * Output: groupCols*, est_ndv, exact_ndv — exact_ndv is the audit
    * column (at 100 TB you would drop it; here it doubles as the
    * accuracy demonstration the oracle verifies).
    *
    * The k smallest distinct hashes per group are kept by feeding the
    * NEGATED hash as the heap score ([[TopKHeap]] keeps k largest), so
    * the emitted array is hash-ascending and element k is h₍ₖ₎.
    * Hashes are < 2³² — exact in the heap's Double score. */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val g = groupCols.map(col)
    // null keys are excluded, matching count(DISTINCT …) SQL semantics
    // (and sidestepping engine-specific null ordering in the bottom-k)
    val hashes = df
      .filter(col(keyCol).isNotNull)
      .select(g :+ md5Uniform32(col(keyCol)).as("__h"): _*)
      .distinct()
    val sketch = hashes
      .groupBy(g: _*)
      .agg(TopKHeap.topKPairs(-col("__h").cast("double"), col("__h"), k).as("__mins"),
        count(lit(1)).as("__ndv"))
    // __ndv (distinct hashes) is exact here because the distinct() above
    // already reduced to one row per (group, hash); at true sketch scale
    // you would keep only __mins and estimate from it alone.
    sketch.select(g ++ Seq(
      when(col("__ndv") < k, col("__ndv"))
        .otherwise(expr(s"(${k - 1}L * 4294967296L) div element_at(__mins, $k).id"))
        .as("est_ndv"),
      col("__ndv").as("exact_ndv")): _*)
  }

  /** HyperLogLog registers (Flajolet et al. 2007) over the portable md5
    * uniform: bucket = top `b` bits of the 32-bit hash, rho = position of
    * the first 1-bit in the remaining `32-b` bits (1-based; all-zero
    * suffix → `32-b+1`), register = max(rho) per (group, bucket).
    *
    * Integer-exact end-to-end — rho is `(32-b+1) - bitlength(suffix)`
    * and `bitlength = length(bin(x))` evaluates identically in Spark and
    * DuckDB — so the register table itself is oracle-checkable; the
    * float estimate lives in [[hllEstimate]] for consumers.
    *
    * Scale shape — this is the cheapest distinct sketch in the file:
    * max() is idempotent, so NO distinct pre-pass is needed (KMV's
    * bottom-k must dedupe first). One partial-agg shuffle whose map-side
    * combine reduces every partition to ≤ groups·2^b rows before any
    * byte moves; the reduce side is O(groups·2^b) regardless of input
    * size. Registers are mergeable by max ([[hllMerge]]): per-day /
    * per-partition sketches union without rescanning — the incremental-
    * rollup pattern (q127) applies verbatim.
    *
    * @return groupCols* + (bucket INT, register INT); empty buckets are
    *         absent (consumers treat missing as 0)
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 6): DataFrame = {
    require(b >= 2 && b <= 16, s"bucket bits b must be in [2,16], got $b")
    val suffixBits = 32 - b
    val g = groupCols.map(col)
    val h = md5Uniform32(col(keyCol))
    val suffix = h.bitwiseAND(lit((1L << suffixBits) - 1))
    val rho = when(suffix === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(suffix)))
    df.filter(col(keyCol).isNotNull)   // count(DISTINCT …) ignores NULL
      .select(g ++ Seq(
        shiftright(h, suffixBits).cast("int").as("bucket"),
        rho.cast("int").as("rho")): _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("rho")).as("register"))
  }

  /** KMV set operations (Beyer et al. 2007): estimate |A|, |B|, |A∪B|,
    * |A∩B| and Jaccard from the two bottom-k sketches ALONE — the union
    * sketch is the bottom-k of the merged sketch arrays and the
    * intersection uses ρ = |K_union ∩ K_A ∩ K_B| (valid because any
    * union-bottom-k hash belonging to A is necessarily in A's bottom-k:
    * A ⊆ A∪B ⇒ A's k-th min ≥ the union's). After the two base scans,
    * everything is k-sized array math on ONE row — per-source sketches
    * built once compose into every pairwise overlap without rescanning,
    * the sketch-algebra counterpart of q97's exact overlap matrix.
    *
    * All-integer outputs (estimates via `(k−1)·2³² div h₍ₖ₎`, Jaccard in
    * ppm), exact when a set has < k distinct hashes — oracle-checkable
    * in the portable md5 family end-to-end. */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def sketch(df: DataFrame, mins: String, ndv: String): DataFrame = df
      .filter(col(keyCol).isNotNull)
      .select(md5Uniform32(col(keyCol)).as("__h")).distinct()
      .agg(TopKHeap.topKPairs(-col("__h").cast("double"), col("__h"), k).as("__p"),
        count(lit(1)).as(ndv))
      .select(expr("transform(__p, p -> p.id)").as(mins), col(ndv))
    sketch(a, "ma", "na").crossJoin(sketch(b, "mb", "nb"))
      .withColumn("mu",
        expr(s"slice(array_sort(array_distinct(concat(ma, mb))), 1, $k)"))
      .withColumn("ku", least(lit(k.toLong), size(col("mu")).cast("long")))
      .withColumn("match_k", expr(
        "CAST(size(filter(mu, h -> array_contains(ma, h) " +
          "AND array_contains(mb, h))) AS BIGINT)"))
      .withColumn("est_a", when(col("na") < k, col("na"))
        .otherwise(expr(s"(${k - 1}L * 4294967296L) div ma[${k - 1}]")))
      .withColumn("est_b", when(col("nb") < k, col("nb"))
        .otherwise(expr(s"(${k - 1}L * 4294967296L) div mb[${k - 1}]")))
      .withColumn("est_union",
        when(size(col("mu")) < k, size(col("mu")).cast("long"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div mu[${k - 1}]")))
      .withColumn("est_inter", expr("(match_k * est_union) div ku"))
      .withColumn("jaccard_ppm", expr("(match_k * 1000000L) div ku"))
      .select("est_a", "est_b", "est_union", "match_k", "est_inter",
        "jaccard_ppm")
  }

  /** Merge register tables from [[hllRegisters]] (same `b`): the union's
    * sketch is the bucket-wise max — per-shard sketches compose without
    * touching the raw keys again. */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("register")).as("register"))

  /** The standard HLL estimate with linear-counting small-range
    * correction, per group. Float math (hence spec-checked against exact
    * counts, not oracle-hashed): E = α·m²/Σ2^(−reg) with absent buckets
    * contributing 2⁰; if E ≤ 2.5m and empty buckets remain, fall back to
    * m·ln(m/V). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
      b: Int = 6): DataFrame = {
    val m = (1 << b).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val g = groupCols.map(col)
    val agg = registers.groupBy(g: _*)
      .agg(sum(pow(lit(2.0), -col("register"))).as("__s"),
        count(lit(1)).as("__nb"))
    val rawE = lit(alpha * m * m) /
      (col("__s") + (lit(m) - col("__nb")))          // absent buckets = 2^0
    val v = lit(m) - col("__nb")                     // empty-bucket count
    agg.select(g :+
      when(rawE <= lit(2.5 * m) && v > 0, lit(m) * log(lit(m) / v))
        .otherwise(rawE).as("est_ndv"): _*)
  }
  /** Mergeable log-histogram quantile sketch — the bounded-state
    * approximate-percentile that survives 100 TB where the exact
    * [[graft.operators.Aggregations.quantilesDisc]] cannot: the exact
    * form windows over DISTINCT VALUES (value-cardinality-sized
    * partitions); this one buckets every value by (msb, 2 sub-bits) —
    * at most 4·64 = 256 buckets per group REGARDLESS of value
    * cardinality — and answers a quantile with the MINIMUM VALUE of
    * the bucket where the cumulative count crosses the rank. The
    * estimate is a true data value with relative error bounded by the
    * bucket width (≤ 2^(msb−2), i.e. ~19%), the histogram is mergeable
    * across partitions/days by bucket-wise count addition, and every
    * step is integer arithmetic: msb = length of the binary string
    * (Spark `conv(v,10,2)` ≡ DuckDB `bin(v)` — both unpadded), so the
    * whole sketch replays exactly cross-engine, floats nowhere.
    *
    * Positive-value contract: rows with NULL or v < 1 are excluded up
    * front (log buckets need v ≥ 1; shift/scale first if the domain
    * includes zero or negatives).
    *
    * Scale shape: ONE (group, bucket) partial+final agg — map-side
    * combine collapses to ≤ 256 rows per group before the exchange —
    * then a bucket-count-bounded window. Compare: the exact quantile's
    * exchange carries O(distinct values).
    *
    * @return (groupCols..., n, est_p&lt;q&gt; per requested ppm) */
  def logHistQuantiles(raw: DataFrame, groupCols: Seq[String],
      valueCol: String, quantilesPpm: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantilesPpm.nonEmpty &&
      quantilesPpm.forall(q => q > 0 && q <= 1000000L),
      "quantiles are ppm in (0, 1000000]")
    val df = raw.filter(col(valueCol).isNotNull && col(valueCol) >= 1)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val bucket = expr(
      s"""(length(conv(CAST($valueCol AS BIGINT), 10, 2)) - 1) * 4 +
         | (shiftright(CAST($valueCol AS BIGINT),
         |   greatest(length(conv(CAST($valueCol AS BIGINT), 10, 2)) - 3, 0))
         |  & 3)""".stripMargin.replace('\n', ' '))
    val hist = df.groupBy(g :+ bucket.cast("long").as("__b"): _*)
      .agg(count(lit(1)).as("__c"), min(v).as("__min"))
    quantilesFromHist(hist, groupCols, quantilesPpm)
  }

  /** Shared tail of the log-histogram quantile family: given a bucket
    * histogram (groupCols..., __b, __c, __min), the per-group quantile
    * estimates. The window partitions are bucket-count-bounded (≤ 256
    * rows) by construction. */
  private def quantilesFromHist(hist: DataFrame, groupCols: Seq[String],
      quantilesPpm: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__b"))
    val cum = hist
      .withColumn("__cw", sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qAggs = quantilesPpm.map(q =>
      min(when(col("__cw") * 1000000L >= lit(q) * col("__tw"), col("__min")))
        .as(s"est_p$q"))
    cum.groupBy(g: _*)
      .agg(max(col("__tw")).as("n"), qAggs: _*)
  }

  /** Trailing-window quantile estimates from MERGED log-histogram
    * sketches — the observability query the mergeable property exists
    * for ("p50/p99 over the trailing 7 days, per group, per day"):
    * per (group, day) the [[logHistQuantiles]] estimate over all rows
    * in days [day−windowDays+1, day], WITHOUT re-scanning the corpus
    * once per window position. The corpus is bucketed ONCE into
    * per-(group, day, bucket) cells (one partial+final agg — the only
    * corpus-sized exchange); window merge is bucket-wise count
    * addition + min-of-min over the cell table, which is sketch-sized
    * (groups × days × ≤256) — the exact-quantile alternative would
    * re-sort every window's rows, windowDays× the data, with
    * value-cardinality-sized partitions.
    *
    * The merge replicates each CELL (never a row) once per window
    * position it serves — ≤ windowDays× a sketch-sized frame — via a
    * broadcast join against the active-day list (days with ≥ 1
    * eligible row in the group; estimates are emitted for exactly
    * those (group, day) pairs). Same positive-value contract and
    * bucket rule as [[logHistQuantiles]], so estimates are true data
    * values and the whole pipeline replays exactly cross-engine.
    *
    * @param dayCol integral day index (e.g. epoch-micros div 86400e6)
    * @return (groupCols..., day, n, est_p&lt;q&gt; per requested ppm) */
  def logHistQuantilesTrailing(raw: DataFrame, groupCols: Seq[String],
      dayCol: String, valueCol: String, windowDays: Int,
      quantilesPpm: Seq[Long]): DataFrame =
    logHistQuantilesTrailingFromCells(
      logHistCells(raw, groupCols, dayCol, valueCol)
        // the ONE corpus-sized exchange; feeds both the day frame and
        // the merge join (multi-branch rule)
        .localCheckpoint(true),
      groupCols, windowDays, quantilesPpm)

  /** The persistable per-(group, day, bucket) cell table behind
    * [[logHistQuantilesTrailing]] — the INCREMENTAL-maintenance unit:
    * a daily pipeline appends `logHistCells(todaysBatch, ...)` to the
    * stored table and serves any trailing window from
    * [[logHistQuantilesTrailingFromCells]] without ever rescanning
    * history (cells for distinct (group, day) partitions never
    * interact, so append IS merge). Same positive-value contract and
    * bucket rule as [[logHistQuantiles]].
    *
    * @return (groupCols..., day, bucket, n, min_v) */
  def logHistCells(raw: DataFrame, groupCols: Seq[String],
      dayCol: String, valueCol: String): DataFrame = {
    val df = raw.filter(col(valueCol).isNotNull && col(valueCol) >= 1)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val bucket = expr(
      s"""(length(conv(CAST($valueCol AS BIGINT), 10, 2)) - 1) * 4 +
         | (shiftright(CAST($valueCol AS BIGINT),
         |   greatest(length(conv(CAST($valueCol AS BIGINT), 10, 2)) - 3, 0))
         |  & 3)""".stripMargin.replace('\n', ' '))
    df.groupBy(
        g ++ Seq(col(dayCol).cast("long").as("day"),
          bucket.cast("long").as("bucket")): _*)
      .agg(count(lit(1)).as("n"), min(v).as("min_v"))
  }

  /** Trailing-window quantile estimates from a prebuilt (possibly
    * parquet-persisted and incrementally appended) [[logHistCells]]
    * table. Cells for the same (group, day, bucket) from multiple
    * appends are re-reduced here (sum/min are the merge), so an
    * append-only store needs no compaction for correctness. */
  def logHistQuantilesTrailingFromCells(cells: DataFrame,
      groupCols: Seq[String], windowDays: Int,
      quantilesPpm: Seq[Long]): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    require(quantilesPpm.nonEmpty &&
      quantilesPpm.forall(q => q > 0 && q <= 1000000L),
      "quantiles are ppm in (0, 1000000]")
    val c = cells.select(
      groupCols.map(col) ++ Seq(col("day").cast("long").as("__d"),
        col("bucket").as("__b"), col("n").as("__c"),
        col("min_v").as("__min")): _*)
    val merged = mergeTrailing(c, groupCols, Seq("__b"), windowDays,
      Seq(sum(col("__c")).as("__c"), min(col("__min")).as("__min")))
    quantilesFromHist(merged, groupCols :+ "day", quantilesPpm)
  }

  /** Serve ONE trailing-window position from a persisted [[logHistCells]]
    * store — the daily-query shape of the incremental pipeline ("append
    * today's cells, ask for today's trailing quantiles"): the w-day
    * range lands on the STORED day column BEFORE anything else, so on a
    * parquet store it is a pushed scan filter (PushedFilters — and
    * partition pruning when the store is day-partitioned); history
    * outside the window is never read, which is the whole point of
    * keeping the cell store. Result rows are exactly the `day = day`
    * slice of [[logHistQuantilesTrailingFromCells]] over the full store
    * (spec-asserted): cells outside the range cannot contribute to this
    * window position, and the emitted-day filter drops the partial
    * windows the range's older days would otherwise produce. */
  def logHistQuantilesAt(cells: DataFrame, groupCols: Seq[String],
      day: Long, windowDays: Int, quantilesPpm: Seq[Long]): DataFrame =
    logHistQuantilesTrailingFromCells(
      cells.filter(col("day").between(day - (windowDays - 1L), day)),
      groupCols, windowDays, quantilesPpm)
      .filter(col("day") === day)

  /** Serve ONE trailing-window position from a persisted
    * [[hllRegisters]] store — [[logHistQuantilesAt]]'s distinct-count
    * sibling: the w-day range prunes the register-store scan the same
    * way, the bucket-wise MAX merges only in-range cells, and only the
    * requested day's windows are emitted (groups active ON that day,
    * matching [[hllRegistersTrailing]]'s active-day contract). */
  def hllRegistersAt(cells: DataFrame, groupCols: Seq[String],
      dayCol: String, day: Long, windowDays: Int): DataFrame =
    mergeTrailing(
      cells.filter(col(dayCol).between(day - (windowDays - 1L), day))
        .withColumn("__d", col(dayCol).cast("long")).drop(dayCol),
      groupCols, Seq("bucket"), windowDays,
      Seq(max(col("register")).as("register")))
      .filter(col("day") === day)

  /** Trailing-window HLL registers — [[logHistQuantilesTrailing]]'s
    * distinct-count sibling (sliding weekly/monthly active users, per
    * group per day) and the reason HLL merges at all: the max of two
    * register tables is the register table of the union. The corpus is
    * register-ized ONCE into per-(group, day, bucket) max-ρ cells (one
    * partial+final agg — the only corpus-sized exchange); every window
    * position is a bucket-wise MAX over the cell table, which is
    * sketch-sized (groups × days × 2^b). The exact alternative —
    * count(DISTINCT) per window — rescans windowDays× the data and
    * shuffles raw keys per window position.
    *
    * Registers are the oracle-checked artifact (integer, portable md5
    * family, same contract as the point-in-time [[hllRegisters]]);
    * callers wanting the float estimate apply the q129 estimator over
    * each (group, day) slice as a fast path.
    *
    * @param dayCol integral day index (e.g. epoch-micros div 86400e6)
    * @return (groupCols..., day, bucket, register) for active days
    *         (days with ≥ 1 non-NULL key in the group) */
  def hllRegistersTrailing(df: DataFrame, keyCol: String,
      groupCols: Seq[String], dayCol: String, windowDays: Int,
      b: Int = 6): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val cells = hllRegisters(df, keyCol, groupCols :+ dayCol, b)
      .withColumn("__d", col(dayCol).cast("long")).drop(dayCol)
      .localCheckpoint(true)
    mergeTrailing(cells, groupCols, Seq("bucket"), windowDays,
      Seq(max(col("register")).as("register")))
  }

  /** Shared trailing-window merge of the mergeable-sketch family:
    * given per-(group, day) sketch cells keyed by `keyCols` (bucket
    * ids, registers), serve every window position [day−w+1, day] by
    * joining each cell to the ACTIVE days of its group it belongs to
    * and re-reducing per (group, day, key). Each CELL (never a corpus
    * row) is replicated ≤ w times, so the whole merge is sketch-sized;
    * the input must already be sketch-bounded per (group, day). Emits
    * exactly the active (group, day) pairs. `cells` must carry the
    * day index as `__d` (long).
    *
    * The day list is groups × active-days rows — usually tiny, but
    * NOT inherently bounded (high group cardinality × a long day
    * history), so the broadcast is ROUTED, not assumed (ADVICE r12,
    * the repo-wide proven-fit discipline): accept it only when the
    * Catalyst bound or an exact count (one job over the sketch-sized
    * cell table, which callers materialize) proves the list under the
    * budget; otherwise fall back to the shuffle join — the range
    * condition still prunes to ≤ w replicas per cell either way. */
  private def mergeTrailing(cells: DataFrame, groupCols: Seq[String],
      keyCols: Seq[String], windowDays: Int,
      aggs: Seq[Column]): DataFrame = {
    val g = groupCols.map(col)
    val days = cells.select(
      groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__d").as("day"): _*)
      .distinct()
    // ~32 B/row (UnsafeRow + HashedRelation overhead), GraphTuning's
    // state-row constant; CLAUDE.md rule: a bound only LICENSES the
    // broadcast when it proves the fit — otherwise measure exactly.
    val limit = GraphTuning.DefaultBroadcastBytes / GraphTuning.StateRowBytes
    // exact-count fallback memoized by canonicalized-plan digest (ADVICE
    // r13: Bench reps re-counted the same day list each rep; per-rep
    // localCheckpoint'ed cells still miss the memo, but that count is
    // one cheap job over the checkpointed sketch cells)
    val (fits, est, src) =
      GraphTuning.broadcastFitsRows(days, limit, memoized = true)
    GraphTuning.logRouting(
      s"[graft.sketch] mergeTrailing dayList=" +
        (if (fits) "broadcast" else "shuffle") +
        s" rows=$est($src) limit=$limit")
    val cond = groupCols.map(c => col(c) === col(s"__g_$c"))
      .reduce(_ && _) &&
      col("__d") <= col("day") &&
      col("__d") >= col("day") - lit(windowDays - 1L)
    cells.join(if (fits) broadcast(days) else days, cond)
      .groupBy(g ++ (col("day") +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

}
