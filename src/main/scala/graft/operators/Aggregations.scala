package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A3-A6 — the reference's grouped aggregations, re-expressed as native
  * Catalyst hash aggregates (SURVEY.md §2.4).
  *
  * The reference implements these as pandas `groupby().apply(fn)` with
  * boolean-mask filtered sums (`tigergraph/v1/streaming_operator.py:310-348`,
  * duplicated at `tigergraph/v1/utils.py:131-169`). In Spark each becomes
  * `groupBy(...).agg(sum(when(pred, x)))` — a partial+final hash aggregate
  * with map-side combine, so the shuffle carries one row per group per
  * partition rather than the raw data. That is the single most important
  * scale property of this module: at 100 TB the shuffled bytes are
  * O(groups), not O(rows).
  *
  * Exact-sum discipline: doubles are cast to DECIMAL(28,10) before
  * summing so results are independent of partitioning/summation order
  * (a real concern: Spark's double sums are nondeterministic across
  * retries and AQE re-plans), then cast back to double.
  */
object Aggregations {

  /** Order-independent exact sum of a double expression. Scale 10 is the
    * sweet spot: ≥ the decimal-termination length of every money column
    * in the pipelines (products of ≤5-digit decimal grids → ≤10 decimal
    * digits, so the cast never rounds and the HALF_UP-vs-HALF_EVEN
    * cross-engine tie hazard can't arise), yet small enough that
    * value×10¹⁰ stays below 2⁵³ for engines converting double→decimal
    * via a double multiply.
    *
    * The GROUP TOTAL × 10^scale must also stay below 2⁵³ (the final
    * decimal→double conversion in int128-based engines goes through an
    * integer that must be exactly representable): callers whose totals
    * reach ~10⁹ pass a smaller scale matched to their summands' decimal
    * termination (e.g. 4 for 2-decimal money). */
  def exactSum(c: Column, scale: Int = 10): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Filtered exact sum: Σ c where pred (reference's masked `.sum()`). */
  def sumWhere(pred: Column, c: Column, scale: Int = 10): Column =
    exactSum(when(pred, c).otherwise(lit(null)), scale)

  /** A3 `transactions_agg` (`streaming_operator.py:310-324`): per
    * transaction — external/internal/token-transfer value splits by type,
    * fee totals, and the max block time. */
  def transactionsAgg(df: DataFrame): DataFrame =
    df.groupBy("transaction_id").agg(
      sumWhere(col("type") === 0, col("coin_value")).as("external_value"),
      sumWhere(col("type") === 0, col("coin_value_usd")).as("external_value_usd"),
      max(col("block_date_time")).as("block_date"),
      exactSum(col("fee")).as("txn_fee"),
      exactSum(col("fee_usd")).as("txn_fee_usd"),
      sumWhere(col("type") === 1, col("coin_value")).as("internal_value"),
      sumWhere(col("type") === 1, col("coin_value_usd")).as("internal_value_usd"),
      sumWhere(col("type") === 2, col("coin_value_usd")).as("token_transfer_usd"))

  /** A4 `link_inputs_agg` (`streaming_operator.py:327-337`): per
    * (transaction, sender) — value = Σ(coin_value+fee) where type ∈ (0,1);
    * value_usd = Σ(coin_value_usd+fee_usd) unfiltered (the reference's
    * asymmetry, preserved deliberately). */
  def linkInputsAgg(df: DataFrame): DataFrame =
    df.groupBy("transaction_id", "sender_address").agg(
      sumWhere(col("type").isin(0, 1), col("coin_value") + col("fee")).as("value"),
      exactSum(col("coin_value_usd") + col("fee_usd")).as("value_usd"))

  /** A5 `link_outputs_agg` (`streaming_operator.py:340-348`): per
    * (transaction, receiver) — value = Σ coin_value where type ∈ (0,1). */
  def linkOutputsAgg(df: DataFrame): DataFrame =
    df.groupBy("transaction_id", "receiver_address").agg(
      sumWhere(col("type").isin(0, 1), col("coin_value")).as("value"),
      sumWhere(col("type").isin(0, 1), col("coin_value_usd")).as("value_usd"))

  /** A6 chain-state pivot-table max (`streaming_operator.py:151-155`):
    * pandas pivot_table with aggfunc=max and no pivot column is a plain
    * groupBy-max. */
  def chainState(df: DataFrame, keyCol: String, maxCols: Seq[String]): DataFrame =
    df.groupBy(keyCol).agg(maxCols.head match {
      case h => max(col(h)).as(h)
    }, maxCols.tail.map(c => max(col(c)).as(c)): _*)

  /** A1 two-max correctness fix (SURVEY.md §4): the reference issues two
    * sequential max queries that can disagree under concurrent writes
    * (`airflow/bitquery.py:119-150`). One-pass equivalent: max_by. */
  def latestBlock(df: DataFrame, blockCol: String, dateCol: String): DataFrame =
    df.agg(
      max(col(blockCol)).as("latest_block"),
      max_by(col(dateCol), col(blockCol)).as("latest_block_date"))

  /** Exact per-group weighted (lower) median: the smallest value whose
    * cumulative weight reaches half the group's total —
    * min{x : 2·Σ_{v≤x} w(v) ≥ Σw}. Integer weights and integer-encoded
    * values keep every comparison exact (no percentile interpolation),
    * so the result is engine-independent. Delegates to [[quantilesDisc]]
    * at q = 500000 ppm (2·cw ≥ tw ⇔ 10⁶·cw ≥ 500000·tw), inheriting its
    * bracket+exact scale shape. */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String): DataFrame =
    quantilesDisc(df, groupCols, valueCol, weightCol, Seq(500000L))
      .withColumnRenamed("p500000", "w_median")

  /** Signed log-bucket of a BIGINT expression — the bracket key of
    * [[quantilesDisc]]'s two-pass exact quantile. Monotone in the value
    * (v₁ ≤ v₂ ⇒ bucket(v₁) ≤ bucket(v₂)) and bounded: positives map to
    * 1 + (msb−1)·4 + 2 sub-bits ∈ [1, 256] (the [[Sketch.logHistQuantiles]]
    * bucket rule), zero to 0, negatives mirror to [−256, −1] — ≤ 513
    * buckets over the whole long domain, so a per-group bucket histogram
    * never exceeds 513 rows regardless of value cardinality. `conv(v,10,2)`
    * is unpadded in Spark and DuckDB (`bin`) alike, so the rule is
    * portable. Contract: v > Long.MinValue (the one long whose negation
    * overflows). */
  private[graft] def signedLogBucketSql(c: String): String = {
    def lb(u: String) =
      s"(CAST(length(conv($u, 10, 2)) - 1 AS BIGINT) * 4 + " +
        s"(shiftright($u, greatest(length(conv($u, 10, 2)) - 3, 0)) & 3))"
    s"(CASE WHEN $c = 0 THEN CAST(0 AS BIGINT) " +
      s"WHEN $c > 0 THEN ${lb(c)} + 1 " +
      s"ELSE -(${lb(s"(-($c))")}) - 1 END)"
  }

  /** Exact per-group discrete quantiles — [[weightedMedian]] generalized
    * to a quantile LIST: for each q (parts-per-million) the result is
    * the smallest value whose cumulative weight reaches q of the group
    * total, min{x : 10⁶·Σ_{v≤x} w(v) ≥ q·Σw} — the p50/p90/p99 cutoffs
    * a training-data quality pipeline thresholds on (token counts,
    * document lengths, scores per source). Rank semantics are defined
    * HERE, in integer arithmetic, rather than delegated to an engine
    * quantile builtin — `quantile_disc`-style functions differ across
    * engines in interpolation and rank rounding, so the oracle mirrors
    * this exact window+filter formula instead.
    *
    * Scale shape — BRACKET + EXACT two-pass (round 12; the previous
    * single window partitioned per group over ALL distinct values, a
    * one-task ceiling when distinct ≈ rows — price cents over 3 return
    * flags put tens of millions of rows on one task at 100×):
    *  1. occurrences collapse to one row per (group, value) — the
    *     partial-agg shuffle that is the exactness floor — and each
    *     value takes its [[signedLogBucketSql]] bucket (≤ 513 buckets
    *     over the whole long domain). A (group, bucket) histogram and a
    *     ≤513-row-per-group window locate, per requested rank, the ONE
    *     bracket bucket where cumulative weight crosses the target,
    *     plus the exact weight below it.
    *  2. the exact rank scan re-reads only IN-BRACKET values (broadcast
    *     semi-join on the groups×quantiles bracket table): the window
    *     partition is one bucket's distinct values — ~1/256th of the
    *     group in log space — never the column's cardinality.
    * The (group, value) frame feeds both passes, so it is materialized
    * once (localCheckpoint — the multi-branch rule). Results are
    * integer-exact and identical to the one-window formula: the min
    * value whose cumulative weight reaches the target provably lies in
    * the bracket bucket (bucket cum before it < target ≤ cum through
    * it, and the bucket key is monotone in the value). Overflow bound
    * unchanged: cumWeight × 10⁶ must fit a long ⇒ Σw per group <
    * ~9.2e12; pre-scale weights above that.
    *
    * Contracts: rows with a NULL value are excluded up front; weights
    * are non-negative with a positive group total; the long cast of the
    * value must preserve order (integer-encoded values — the module-wide
    * discipline) and exceed Long.MinValue.
    *
    * Regime routing (round 12 — measured: the bracket plan's extra
    * stages cost ~2-5× WALL at sf0.1 where utilization is ~2%, pure
    * stage latency, while the one-window plan is the scale hazard):
    * a PROVEN-small input (plan row bound, or an exact count when the
    * plan is cheap to count — scans/filters/projects only) runs the
    * single-window plan; everything else runs bracket+exact. Both
    * plans produce bit-identical results (the routed-vs-forced spec
    * asserts it), so the route is purely physical. The limit rides
    * `graft.agg.oneWindowRowLimit` (rows, default 4M — a ≤4M-row
    * distinct-value window sorts in ~1 s on one task; 0 forces
    * bracket everywhere, which is what Scale's ratio shapes pin).
    *
    * @param quantilesPpm quantiles in ppm (500000 = median); output
    *        column per entry named `p<ppm>`, plus `total_w`
    * @param inputRowsHint caller-vouched upper bound on df's rows
    *        (-1 = unknown): lets multi-pass callers (madOutliers) route
    *        their join-derived passes without a count through the join */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String,
      quantilesPpm: Seq[Long], inputRowsHint: Long = -1L): DataFrame = {
    require(quantilesPpm.nonEmpty && quantilesPpm.forall(q => q > 0 && q <= 1000000L),
      "quantiles are ppm in (0, 1000000]")
    val (small, est, src) = routeOneWindow(df, inputRowsHint)
    GraphTuning.logRouting(
      s"[graft.agg] quantilesDisc regime=" +
        (if (small) "one-window" else "bracket+exact") +
        s" rows=$est($src) oneWindowLimit=${oneWindowRowLimit(df)}")
    if (small) quantilesDiscOneWindow(df, groupCols, valueCol, weightCol,
      quantilesPpm)
    else quantilesDiscBracket(df, groupCols, valueCol, weightCol,
      quantilesPpm)
  }

  /** The conf-resolved one-window row limit (see [[quantilesDisc]]). */
  private def oneWindowRowLimit(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.agg.oneWindowRowLimit")
      .map(_.toLong).getOrElse(4000000L)

  /** Routing decision for the quantile family: (useOneWindow,
    * rowEstimate, source). Proof order: caller hint, then the job-free
    * Catalyst bound, then an exact count — but ONLY when the plan is
    * cheap to count (no join/agg/window/generate: counting those
    * re-executes the expensive upstream, which can cost as much as the
    * query). An unprovable input routes to bracket — the always-safe
    * plan. The probe ceiling (256M bytes-as-rows) skips the count when
    * the bound already says the input cannot be small.
    *
    * The count probe is MEMOIZED by an md5 digest of the canonicalized
    * logical plan for the session ([[GraphTuning.memoizedCount]] — the
    * memo this router introduced in r13, hoisted to GraphTuning in r14
    * so every proven-fit license shares it): a repeatedly-built
    * identical frame (Bench reps, a med+mad pass pair) pays the probe
    * job once. */
  private def routeOneWindow(df: DataFrame,
      inputRowsHint: Long): (Boolean, Long, String) = {
    val limit = oneWindowRowLimit(df)
    if (inputRowsHint >= 0L)
      (inputRowsHint <= limit, inputRowsHint, "caller-hint")
    else GraphTuning.rowUpperBound(df) match {
      case Some((u, s)) if u <= limit => (true, u, s)
      case Some((u, s)) if u > 256000000L => (false, u, s)
      case b if cheapToCount(df) =>
        val n = GraphTuning.memoizedCount(df)
        (n <= limit, n, "exact-count-memo")
      case b =>
        (false, b.map(_._1).getOrElse(-1L), "unproven-assume-big")
    }
  }

  private def cheapToCount(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collectFirst {
      case p: Join => p
      case p: Aggregate => p
      case p: Window => p
      case p: Generate => p
    }.isEmpty
  }

  /** Row-estimate + source for a SCAN-shaped frame, for callers that
    * route several quantile passes off one decision ([[madOutliers]],
    * [[madFlag]] — their deviation pass is a join whose stats are
    * useless but whose row count equals the input's). */
  private def routeRows(df: DataFrame): Long =
    routeOneWindow(df, -1L) match { case (_, est, src) =>
      if (src == "unproven-assume-big") -1L else est }

  /** The pre-round-12 single-window exact plan: one cumulative window
    * per group over its DISTINCT VALUES. Bit-identical to
    * [[quantilesDiscBracket]]; safe only when the per-group
    * distinct-value set fits one task — [[quantilesDisc]] routes. */
  private[graft] def quantilesDiscOneWindow(df: DataFrame,
      groupCols: Seq[String], valueCol: String, weightCol: String,
      quantilesPpm: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val perValue = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    val cum = perValue
      .withColumn("__cw", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qAggs = quantilesPpm.map(q =>
      min(when(col("__cw") * 1000000L >= lit(q) * col("__tw"), col("__v")))
        .as(s"p$q"))
    cum.groupBy(g: _*)
      .agg(qAggs.head, qAggs.tail :+ max(col("__tw")).as("total_w"): _*)
  }

  /** The bracket+exact two-pass plan (see [[quantilesDisc]]'s scale
    * note) — every window partition bucket-bounded. */
  private[graft] def quantilesDiscBracket(df: DataFrame,
      groupCols: Seq[String], valueCol: String, weightCol: String,
      quantilesPpm: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val perValue = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .withColumn("__b", expr(signedLogBucketSql("CAST(__v AS BIGINT)")))
      .localCheckpoint(true)
    val perBucket = perValue.groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__bw"))
    val wb = Window.partitionBy(g: _*).orderBy(col("__b"))
    val cumB = perBucket
      .withColumn("__cbw", sum(col("__bw")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__bw")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // one row per (group, rank): the first bucket whose cumulative
    // weight reaches the target, with the exact weight before it
    val brackets = cumB
      .withColumn("__q", explode(array(quantilesPpm.map(lit): _*)))
      .filter(col("__cbw") * 1000000L >= col("__q") * col("__tw") &&
        (col("__cbw") - col("__bw")) * 1000000L < col("__q") * col("__tw"))
      .select(g ++ Seq(col("__q"), col("__b"),
        (col("__cbw") - col("__bw")).as("__before"), col("__tw")): _*)
    val bq = brackets.select(g :+ col("__b"): _*).distinct()
    val wIn = Window.partitionBy(g :+ col("__b"): _*).orderBy(col("__v"))
    val inBracket = perValue.join(broadcast(bq), groupCols :+ "__b")
      .withColumn("__cin", sum(col("__w")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hits = inBracket.join(broadcast(brackets), groupCols :+ "__b")
      .filter((col("__before") + col("__cin")) * 1000000L >=
        col("__q") * col("__tw"))
      .groupBy(g :+ col("__q"): _*)
      .agg(min(col("__v")).as("__ans"), max(col("__tw")).as("__gtw"))
    val qCols = quantilesPpm.map(q =>
      min(when(col("__q") === q, col("__ans"))).as(s"p$q"))
    hits.groupBy(g: _*)
      .agg(qCols.head, qCols.tail :+ max(col("__gtw")).as("total_w"): _*)
  }

  /** Exact per-value percentile ranks — the feature-normalization
    * inverse of [[quantilesDisc]] (that one maps rank → value; this
    * maps every value → its rank): per (group, distinct value), the
    * weight, and rank_ppm = ⌊10⁶ · cumWeight(≤ v) / totalWeight⌋ —
    * the rank-normalized feature a training pipeline joins back onto
    * rows (percentile-scaled scores are comparable across groups
    * whose raw scales differ). Integer arithmetic end-to-end, same
    * rank semantics as quantilesDisc, so rank_ppm(v) ≥ q exactly when
    * v ≥ p&lt;q&gt; — the two operators are mutually consistent.
    *
    * Scale shape — the bracket discipline generalized from ONE target
    * rank to ALL of them: the naive spelling is a single cumulative
    * window per group over every distinct value (the distinct ≈ rows
    * one-task ceiling quantilesDisc was rewritten off). Instead:
    * occurrences collapse per (group, value); a ≤513-row-per-group
    * bucket window ([[signedLogBucketSql]]) computes each bucket's
    * weight-below and the group total; the within-bucket cumulative
    * window then partitions by (group, BUCKET) — every value's rank is
    * below(bucket) + cum(within bucket), no partition ever exceeds one
    * log-bucket's distinct values. The (group, value) frame feeds both
    * the bucket rollup and the final join (multi-branch rule ⇒
    * localCheckpoint). Overflow contract: cumWeight × 10⁶ must fit a
    * long ⇒ Σw per group < ~9.2e12 (the family bound).
    *
    * Routed like [[quantilesDisc]]: proven-small inputs take the
    * single cumulative window, everything else the bucket-partitioned
    * bracket plan; results are bit-identical either way.
    *
    * @return (groupCols..., &lt;valueCol&gt;, w, rank_ppm) */
  def percentileRanksPpm(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String,
      inputRowsHint: Long = -1L): DataFrame = {
    val (small, est, src) = routeOneWindow(df, inputRowsHint)
    GraphTuning.logRouting(
      s"[graft.agg] percentileRanksPpm regime=" +
        (if (small) "one-window" else "bracket") +
        s" rows=$est($src) oneWindowLimit=${oneWindowRowLimit(df)}")
    if (small) percentileRanksOneWindow(df, groupCols, valueCol, weightCol)
    else percentileRanksBracket(df, groupCols, valueCol, weightCol)
  }

  /** Single-window rank plan — safe only for proven-small inputs
    * ([[percentileRanksPpm]] routes). */
  private[graft] def percentileRanksOneWindow(df: DataFrame,
      groupCols: Seq[String], valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val perValue = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    perValue
      .withColumn("__cw", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(g ++ Seq(col("__v").as(valueCol), col("__w").as("w"),
        expr("(__cw * 1000000) div __tw").as("rank_ppm")): _*)
  }

  /** Bucket-partitioned rank plan — every window (group, bucket)-
    * bounded (see [[percentileRanksPpm]]'s scale note). */
  private[graft] def percentileRanksBracket(df: DataFrame,
      groupCols: Seq[String], valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val perValue = df
      .filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .withColumn("__b", expr(signedLogBucketSql("CAST(__v AS BIGINT)")))
      .localCheckpoint(true)
    val wb = Window.partitionBy(g: _*).orderBy(col("__b"))
    val perBucket = perValue.groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__bw"))
      .withColumn("__below", sum(col("__bw")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
        col("__bw"))
      .withColumn("__tw", sum(col("__bw")).over(
        wb.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(g ++ Seq(col("__b"), col("__below"), col("__tw")): _*)
    val wIn = Window.partitionBy(g :+ col("__b"): _*).orderBy(col("__v"))
    perValue.join(perBucket, groupCols :+ "__b")
      .withColumn("__cin", sum(col("__w")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(g ++ Seq(col("__v").as(valueCol), col("__w").as("w"),
        expr("((__below + __cin) * 1000000) div __tw")
          .as("rank_ppm")): _*)
  }

  /** Winsorized per-group sums — the outlier-robust rollup a metrics
    * pipeline ships next to the raw one (a fat-finger trade or a bot
    * burst must not own the day's total): values clip to the group's
    * exact discrete [loPpm, hiPpm] quantiles ([[quantilesDisc]] rank
    * semantics, so the cutoffs themselves are engine-exact integers)
    * and both the raw and clipped sums are reported with the clip
    * count.
    *
    * Scale shape: pass 1 is the quantile operator (bracket+exact —
    * its windows are bucket-bounded, never value-cardinality-sized);
    * pass 2 re-scans the input against the BROADCAST group-sized
    * cutoff table and partial-aggregates — two corpus scans total,
    * which is the floor for exact two-sided winsorization (the cutoffs
    * depend on the full distribution). Integer arithmetic end-to-end.
    *
    * @return (groupCols..., n, n_clipped, lo, hi, sum_raw, sum_wins) */
  def winsorizedSums(df: DataFrame, groupCols: Seq[String],
      valueCol: String, loPpm: Long, hiPpm: Long): DataFrame = {
    require(0 < loPpm && loPpm < hiPpm && hiPpm <= 1000000L,
      "need 0 < loPpm < hiPpm <= 1000000")
    val g = groupCols.map(col)
    val cuts = quantilesDisc(df.withColumn("__w", lit(1L)), groupCols,
        valueCol, "__w", Seq(loPpm, hiPpm))
      .select(g :+ col(s"p$loPpm").as("__lo") :+ col(s"p$hiPpm").as("__hi"): _*)
    val v = col(valueCol).cast("long")
    df.join(broadcast(cuts), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("__lo") || v > col("__hi"), 1L).otherwise(0L))
          .as("n_clipped"),
        max(col("__lo")).as("lo"), max(col("__hi")).as("hi"),
        sum(v).as("sum_raw"),
        sum(greatest(col("__lo"), least(col("__hi"), v))).as("sum_wins"))
  }

  /** Exact per-group equi-depth histogram — the profiling primitive a
    * release report ships for every numeric column (equal-POPULATION
    * buckets expose skew that equal-WIDTH buckets hide: one fat bucket
    * in an equi-width histogram is the whole story at 100 TB). Bucket
    * boundaries are the exact discrete quantiles at k/buckets ppm
    * ([[quantilesDisc]] rank semantics — engine-exact integers), a
    * value lands in bucket Σ_k [v > cut_k], and every (group, bucket)
    * cell is emitted, zero cells included, so the output shape is
    * groups × buckets at any corpus size.
    *
    * Scale shape: the cutoff pass is [[quantilesDisc]] (bracket+exact:
    * per-value partial agg, ≤513-row bucket window, then an exact scan
    * over in-bracket values only — never the column's cardinality on
    * one task); the bucket pass re-scans the input against the
    * BROADCAST group-sized cutoff table into a (group, bucket) partial
    * agg. Two corpus scans, the exact-quantile floor, same as
    * [[winsorizedSums]].
    *
    * NULL contract: rows with a NULL value are excluded up front — a
    * NULL fails every `v > cut` test and would otherwise land in
    * bucket 0 silently while vanishing from `total` (the chi-square
    * NULL-category trap in this module's own history).
    *
    * @return (groupCols..., bucket, n, total) ordered by nothing —
    *         callers add their determinism ORDER BY */
  def equiDepthHistogram(raw: DataFrame, groupCols: Seq[String],
      valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, "need 2 <= buckets <= 1000")
    val df = raw.filter(col(valueCol).isNotNull)
    val g = groupCols.map(col)
    val ppms = (1 until buckets).map(k => k.toLong * 1000000L / buckets)
    val cuts = quantilesDisc(df.withColumn("__w", lit(1L)), groupCols,
        valueCol, "__w", ppms)
      .select(g ++ ppms.map(q => col(s"p$q")): _*)
    val v = col(valueCol).cast("long")
    val bucketOf = ppms.map(q =>
      when(v > col(s"p$q"), 1L).otherwise(0L)).reduce(_ + _)
    val counts = df.join(broadcast(cuts), groupCols)
      .groupBy(g :+ bucketOf.as("bucket"): _*)
      .agg(count(lit(1)).as("__n"), sum(v).as("__total"))
    cuts.select(g: _*)
      .withColumn("bucket", explode(sequence(lit(0L), lit(buckets - 1L))))
      .join(counts, groupCols :+ "bucket", "left")
      .select(g ++ Seq(col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("__total"), lit(0L)).as("total")): _*)
  }

  /** Exact MAD (median-absolute-deviation) outlier screen — the
    * robust anomaly gate telemetry pipelines prefer over z-scores
    * (one fat-finger value corrupts a mean AND its stddev, but moves
    * neither the median nor the MAD): per group, the exact discrete
    * median, the exact MAD, and the count of values outside
    * median ± k·MAD. Integer arithmetic end-to-end — both medians use
    * [[quantilesDisc]] rank semantics, so every output is
    * engine-exact.
    *
    * Scale shape: three corpus scans — median pass, deviation-median
    * pass, flag pass — each a bracket+exact quantile
    * ([[quantilesDisc]]: bucket-bounded windows, never a
    * value-cardinality-sized partition) or a broadcast join against
    * group-sized cutoffs. Exact two-level medians cannot do better:
    * the MAD depends on the median, the flags on both.
    *
    * NULL contract: rows with a NULL value are excluded up front (a
    * NULL deviation would silently drop from both medians and flags).
    *
    * @return (groupCols..., n, med, mad, n_outliers) */
  def madOutliers(raw: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val df = raw.filter(col(valueCol).isNotNull)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    // one routing decision covers both passes: the deviation frame is
    // a broadcast join whose plan stats are useless, but its row count
    // IS the input's
    val hint = routeRows(df)
    val med = quantilesDisc(df.withColumn("__w", lit(1L)), groupCols,
        valueCol, "__w", Seq(500000L), inputRowsHint = hint)
      .select(g :+ col("p500000").as("__med"): _*)
    val dev = df.join(broadcast(med), groupCols)
      .select(g ++ Seq(v.as("__v"), abs(v - col("__med")).as("__d"),
        col("__med")): _*)
    val mad = quantilesDisc(dev.withColumn("__w", lit(1L)), groupCols,
        "__d", "__w", Seq(500000L), inputRowsHint = hint)
      .select(g :+ col("p500000").as("__mad"): _*)
    dev.join(broadcast(mad), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("med"), max(col("__mad")).as("mad"),
        sum(when(col("__d") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Row-level MAD flags — [[madOutliers]]'s row-emitting sibling:
    * every input row comes back with the group's exact median and MAD
    * attached plus its own deviation and outlier flag, so the caller
    * can SELECT the anomalous rows themselves (which hours spiked,
    * which trades are fat-fingered), not just count them. Same integer
    * rank semantics, same three-scan floor, same NULL contract; the
    * flag join is against the BROADCAST group-sized (median, MAD)
    * table, so the input never reshuffles for it.
    *
    * @return raw's columns + (med, mad, abs_dev, is_outlier) */
  def madFlag(raw: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val df = raw.filter(col(valueCol).isNotNull)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val hint = routeRows(df) // one decision for both passes (see above)
    val med = quantilesDisc(df.withColumn("__w", lit(1L)), groupCols,
        valueCol, "__w", Seq(500000L), inputRowsHint = hint)
      .select(g :+ col("p500000").as("__med"): _*)
    val dev = df.join(broadcast(med), groupCols)
      .select(g :+ abs(v - col("__med")).as("__d"): _*)
    val mad = quantilesDisc(dev.withColumn("__w", lit(1L)), groupCols,
        "__d", "__w", Seq(500000L), inputRowsHint = hint)
      .select(g :+ col("p500000").as("__mad"): _*)
    df.join(broadcast(med.join(mad, groupCols)), groupCols)
      .withColumn("abs_dev", abs(v - col("__med")))
      .select(df.columns.map(col) ++ Seq(
        col("__med").as("med"), col("__mad").as("mad"), col("abs_dev"),
        (col("abs_dev") > lit(k) * col("__mad")).as("is_outlier")): _*)
  }

  /** Exact chi-square independence statistic for two categorical
    * columns — the composition-drift test a dataset release runs
    * (is `lang` independent of `source`? did this month's mix shift?).
    * Pearson's X² = Σ_cells (o·n − r·c)² / (n·r·c) over the FULL
    * r×c contingency grid, zero cells included (their (r·c/n) term is
    * exactly what the sparse-join formulation would drop), reported in
    * integer ppm: each cell's term is ((o·n − r·c)² · 10⁶) div (n·r·c)
    * with the products in DECIMAL(38,0) — DuckDB runs the same
    * arithmetic in HUGEINT and both `div`s truncate toward zero, so
    * the statistic is hash-exact cross-engine at any corpus size (the
    * all-long version would wrap at o·n > 2⁶³).
    *
    * Scale shape: one (row,col)-keyed partial+final count agg over the
    * corpus — the only corpus-sized exchange — then category-sized
    * aggs; the dense grid is a BROADCAST cross join of the two margin
    * tables (categories × categories rows, never corpus rows) left-
    * joined with observed counts. Output is one row.
    *
    * NULL contract: rows with a NULL category in EITHER column are
    * excluded up front. Without the filter, `groupBy` keeps a NULL
    * group (it lands in n and the margins) while the null-rejecting
    * equi-join from the dense grid drops that cell's observed count to
    * 0 — a silently distorted statistic that the DuckDB oracle (same
    * join semantics) cannot catch.
    *
    * @return (n, n_rows_cat, n_cols_cat, dof, chi2_ppm) */
  def chiSquareIndependence(raw: DataFrame, rowCol: String,
      colCol: String): DataFrame = {
    val df = raw.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
    // the contingency table feeds THREE branches (row margins, col
    // margins, cells) — materialize the corpus-sized agg once
    val o = df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true)
    val rt = o.groupBy("__r").agg(sum("__o").as("__rt"))
    val ct = o.groupBy("__c").agg(sum("__o").as("__ct"))
    val margins = rt.agg(count(lit(1)).as("__nr"), sum("__rt").as("__n"))
      .crossJoin(ct.agg(count(lit(1)).as("__nc")))
    val term = expr(
      """((CAST(__o AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
        | * (CAST(__o AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
        | * 1000000) div (CAST(__n AS DECIMAL(38,0)) * __rt * __ct)"""
        .stripMargin.replace('\n', ' '))
    broadcast(rt).crossJoin(broadcast(ct))
      .join(o, Seq("__r", "__c"), "left")
      .select(col("__rt"), col("__ct"), coalesce(col("__o"), lit(0L)).as("__o"))
      .crossJoin(broadcast(margins))
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("__nr")).cast("long").as("n_row_cats"),
        max(col("__nc")).cast("long").as("n_col_cats"),
        max((col("__nr") - 1) * (col("__nc") - 1)).cast("long").as("dof"),
        sum(term).as("chi2_ppm"))
  }

  /** Exact per-group Pearson correlation of two INTEGER-encoded
    * columns — the feature-vs-feature dependence screen (length vs
    * quality score per source, price vs quantity per class). The
    * cross-engine float discipline of the z-score operator (q96): all
    * five moments accumulate in DECIMAL(38,0) (a long would wrap
    * n·Σxy past 2⁶³ on ~1e9 modest rows; decimal matches DuckDB's
    * HUGEINT exactly), the numerator and variance terms stay exact
    * integers, and ONE double division + ONE correctly-rounded sqrt
    * per group produce the float — so even the correlation itself
    * hash-matches across engines. Never `corr()`: engines disagree in
    * ulps between Welford and naive accumulation.
    *
    * Scale shape: one partial+final hash agg over the group key (five
    * decimal sums — map-side combine, shuffle bytes O(groups));
    * degenerate groups (either variance 0) are dropped, as every
    * engine's corr would return NULL/NaN there.
    *
    * @return (groupCols..., n, r) with r ∈ [-1, 1] */
  def groupedPearson(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.groupBy(g: _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .withColumn("__vx", col("__sxx") * col("__n") - col("__sx") * col("__sx"))
      .withColumn("__vy", col("__syy") * col("__n") - col("__sy") * col("__sy"))
      .filter(col("__vx") > 0 && col("__vy") > 0)
      .select(g ++ Seq(col("__n").cast("long").as("n"),
        ((col("__sxy") * col("__n") - col("__sx") * col("__sy")).cast("double") /
          (sqrt(col("__vx").cast("double")) * sqrt(col("__vy").cast("double"))))
          .as("r")): _*)
  }
}
