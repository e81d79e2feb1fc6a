package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY.md "salting for skew").
  *
  * AQE's skew-join splitting handles joins; hot AGGREGATION keys are
  * still a single-reducer bottleneck when one key holds a large share of
  * the rows (the classic power-law address in chain data, or a boiler-
  * plate document in a text corpus). Two-stage salted aggregation:
  *
  *   stage 1: groupBy(key, salt = hash(row) % buckets) — partial
  *            aggregate spread over `buckets` reducers
  *   stage 2: groupBy(key) — combine the ≤ buckets partials
  *
  * Correct for any commutative-associative aggregate; exposed here for
  * sum/count/min/max. With DECIMAL sums the result is bit-identical to
  * the unsalted plan (order-independence is what exactSum buys).
  */
object Skew {

  final case class SaltedAgg(valueCol: Column, how: String, outName: String)

  def sum_(c: Column, as: String): SaltedAgg = SaltedAgg(c, "sum", as)
  def count_(as: String): SaltedAgg = SaltedAgg(lit(1L), "count", as)
  def min_(c: Column, as: String): SaltedAgg = SaltedAgg(c, "min", as)
  def max_(c: Column, as: String): SaltedAgg = SaltedAgg(c, "max", as)

  /** The per-row salt BOTH salted operators draw from — one rule, one
    * implementation (VERDICT r13 #2: saltedAggregate salted by CONTENT
    * hash while saltedJoin's own comment explains why that is wrong):
    * a hot key's rows are often exact DUPLICATES, which a content hash
    * sends to one reducer — defeating the salt exactly where it
    * matters. A per-row id spreads duplicates too. The id is
    * partition-indexed (a task retry may renumber), but the salt only
    * picks WHICH stage-1 partial / join bucket a row lands in — stage 2
    * regroups by key alone and join output is salt-independent, so
    * results are identical for ANY salt assignment
    * (commutative-associative aggregates; decimal sums stay
    * bit-identical — order independence is what exactSum buys). */
  private[graft] def rowSalt(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  def saltedAggregate(
      df: DataFrame, keyCols: Seq[String], aggs: Seq[SaltedAgg],
      buckets: Int = 64): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn("__salt", rowSalt(buckets))
    def partial(a: SaltedAgg, name: String): Column = a.how match {
      case "sum"   => sum(a.valueCol).as(name)
      case "count" => count(a.valueCol).as(name)
      case "min"   => min(a.valueCol).as(name)
      case "max"   => max(a.valueCol).as(name)
    }
    val stage1 = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partial(aggs.head, "__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) => partial(a, s"__p${i + 1}") }: _*)
    def combine(a: SaltedAgg, i: Int): Column = (a.how match {
      case "sum" | "count" => sum(col(s"__p$i"))
      case "min"           => min(col(s"__p$i"))
      case "max"           => max(col(s"__p$i"))
    }).as(a.outName)
    stage1.groupBy(keyCols.map(col): _*)
      .agg(combine(aggs.head, 0),
        aggs.tail.zipWithIndex.map { case (a, i) => combine(a, i + 1) }: _*)
  }

  /** Salted shuffle join for a skewed fact side when the other side is
    * too big to broadcast but small enough to replicate `buckets`-fold:
    * the fact gets a random salt, the right side is exploded across all
    * salts, and the join key becomes (key, salt) — one hot key spreads
    * over `buckets` reducers. Result rows are identical to the plain
    * inner join. (When the right side IS broadcastable, use
    * `broadcast()`; when AQE's skew split suffices, prefer that — this
    * is the explicit tool for the residual cases.) */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
      buckets: Int = 16): DataFrame = {
    // salt from a per-row id, NOT row content — see rowSalt
    val saltedFact = fact.withColumn("__salt", rowSalt(buckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, keyCols :+ "__salt").drop("__salt")
  }

  /** Join-skew diagnostic report — the pre-flight a pipeline runs
    * BEFORE a big equi-join: per join key, both sides' row counts and
    * their product (that key's output contribution), top-k by
    * contribution. A handful of keys owning most of the product is the
    * signature that picks the mitigation ([[saltedJoin]], AQE skew
    * split, or a hot-key side path); orphan keys are kept with the
    * other side at 0, so the anti-join share is visible in the same
    * report.
    *
    * Scale shape: two key-sized partial+final aggs (map-side combine —
    * the fact tables shuffle only their key counts), ONE key-keyed
    * full-outer hash join of the two count tables, TakeOrdered top-k.
    * NULL keys are excluded (an equi-join never matches them).
    *
    * @return (keyCol, n_left, n_right, out_rows) top-k by
    *         (out_rows desc, key asc) */
  def joinSkewReport(left: DataFrame, right: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lc = left.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_left"))
    val rc = right.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_right"))
    lc.join(rc, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc, col(keyCol)).limit(k)
  }

  /** One routed-join decision with every input that produced it
    * ([[graft.operators.GraphTuning.RegimeDecision]] discipline). */
  final case class JoinPlanDecision(
      salted: Boolean, topSharePpm: Long, topFactRows: Long,
      outRows: BigInt, buckets: Int, sharePpmThreshold: Long,
      hotKeyRowLimit: Long) {
    def describe: String =
      s"[graft.skew] joinPlan=${if (salted) "salted" else "plain"} " +
        s"topSharePpm=$topSharePpm(threshold=$sharePpmThreshold) " +
        s"topFactRows=$topFactRows(limit=$hotKeyRowLimit) " +
        s"outRows=$outRows buckets=$buckets"
  }

  /** Auto-routed equi-join: consumes [[joinSkewReport]]'s signal and
    * picks the mitigation instead of leaving it to the reader. Salting
    * fires only when BOTH hold:
    *
    *   - the top key owns more than `sharePpmThreshold` of the join's
    *     output rows (a handful of keys owning most of the product is
    *     the skew signature — under a uniform key the top share is
    *     ~1/|keys| and AQE/plain hash join is the right plan), and
    *   - that key's FACT-side rows exceed `hotKeyRowLimit` (conf
    *     `graft.skew.hotKeyRowLimit`, default 4M): a hot key one
    *     reducer can absorb isn't worth replicating the dim
    *     `buckets`-fold for.
    *
    * The pre-flight costs two key-sized partial+final aggs and a
    * one-row collect (the [[joinSkewReport]] shape — the fact tables
    * shuffle only their key counts); run it where the join dominates.
    * Output-contribution products ride DECIMAL(38,0) (two BIGINT
    * counts can overflow a long); the TOTAL is additionally summed in
    * double so a decimal-SUM overflow (NULL in non-ANSI mode) is
    * distinguished from an empty key overlap — the share is then
    * computed from the double total (logged loudly) instead of
    * silently routing plain in the extreme-skew regime that needs
    * salting most (ADVICE r13). Result rows are identical in both
    * regimes — [[saltedJoin]] is a pure physical rewrite — so routing
    * never changes answers, only the plan. The decision is logged with
    * all inputs ([[JoinPlanDecision.describe]]).
    *
    * @param hotKeyRowLimit -1 = resolve conf/default
    * @return (joined frame, decision) */
  def decideJoinPlan(
      fact: DataFrame, dim: DataFrame, keyCol: String,
      buckets: Int = 16, sharePpmThreshold: Long = 200000L,
      hotKeyRowLimit: Long = -1L): (DataFrame, JoinPlanDecision) = {
    require(buckets >= 2 && sharePpmThreshold > 0)
    val limit =
      if (hotKeyRowLimit >= 0L) hotKeyRowLimit
      else fact.sparkSession.conf.getOption("graft.skew.hotKeyRowLimit")
        .map(_.toLong).getOrElse(4000000L)
    val lc = fact.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_left"))
    val rc = dim.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_right"))
    // Per-key products each FIT decimal(38,0) (two long counts multiply
    // to < 8.5e37), but their SUM can overflow it, and non-ANSI decimal
    // overflow returns NULL — indistinguishable from an empty key
    // overlap without the count, which silently routed PLAIN in exactly
    // the extreme-skew regime that needs salting most (ADVICE r13). The
    // double total is carried alongside: ~16 significant digits is
    // plenty for a ppm share, and a double sum cannot overflow here
    // (products < 1e38 ≪ 1e308).
    val stat = lc.join(rc, Seq(keyCol))
      .select((col("n_left").cast("decimal(38,0)") * col("n_right"))
        .as("out"), col("n_left"))
      .agg(sum(col("out")).as("total"),
        sum(col("out").cast("double")).as("totalD"),
        max(struct(col("out"), col("n_left"))).as("top"),
        count(lit(1)).as("nk"))
      .collect()(0)
    val (salted, sharePpm, topFact, total) =
      if (stat.getLong(3) == 0L) (false, 0L, 0L, BigInt(0)) // empty overlap
      else {
        val top = stat.getStruct(2)
        val topOut = BigInt(top.getDecimal(0).toBigInteger)
        val tf = top.getLong(1)
        val (share, tot) =
          if (!stat.isNullAt(0)) {
            val t = BigInt(stat.getDecimal(0).toBigInteger)
            (if (t > 0) (topOut * 1000000 / t).toLong else 0L, t)
          } else {
            val tD = stat.getDouble(1)
            GraphTuning.logRouting(
              "[graft.skew] decideJoinPlan decimal(38,0) total OVERFLOWED " +
                f"(double total ≈ $tD%.3e output rows) — routing on the " +
                "double share; at this scale prefer the salted plan")
            ((BigDecimal(topOut) * 1000000 /
              BigDecimal(tD)).toLong, BigDecimal(tD).toBigInt)
          }
        (share > sharePpmThreshold && tf > limit, share, tf, tot)
      }
    val d = JoinPlanDecision(salted, sharePpm, topFact, total, buckets,
      sharePpmThreshold, limit)
    GraphTuning.logRouting(d.describe)
    val joined =
      if (salted) saltedJoin(fact, dim, Seq(keyCol), buckets)
      else fact.join(dim, Seq(keyCol))
    (joined, d)
  }
}
