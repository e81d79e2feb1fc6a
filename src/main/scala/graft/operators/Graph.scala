package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over plain (src, dst) edge DataFrames —
  * the GraphFrames-style layout the reference's TigerGraph projection
  * uses (SURVEY.md §1.1 "Graph"). Connected components live in
  * [[Dedup.duplicateClusters]]; this module adds rank propagation.
  *
  * PageRank here is FIXED-POINT: ranks are integers in `scale`-ths
  * (parts-per-million by default) and every division is integer floor
  * division. That makes each iteration a pure function of the edge set
  * with no float summation order to worry about — results are
  * bit-identical across partitionings, reruns and engines (the DuckDB
  * oracle reproduces all iterations exactly). The price is ≤1 ppm
  * rounding per hop, irrelevant for ranking use.
  *
  * Scale shape: per iteration one join edges⋈ranks (shuffle on src — or
  * zero shuffle if edges and ranks are co-bucketed by src, see
  * io/Bucketing) + one groupBy(dst) partial/final agg. localCheckpoint
  * per iteration keeps the plan flat (same discipline as the CC loop).
  * At 1e9+ nodes switch the accumulator to DECIMAL(38,0): the long
  * accumulator holds while n·scale·damping < 2⁶³ (n ≲ 1e10).
  *
  * Alternatives measured and REJECTED (A/B, same JVM, sf0.1 ×{1,10}):
  * (a) degree via groupBy(src)+broadcast-join-once instead of the count
  * window — 4.4→6.0 s at 10×: the extra node-sized broadcast build and
  * second edge materialization cost more than the window's one fused
  * shuffle; (b) a pregel-lite regime holding ranks in a driver array
  * and broadcasting a LocalRelation contribution table — 1.9→3.7 s at
  * 1×: per-round encode/collect of the node table loses to the plain
  * broadcast loop even at 167k nodes; (c) fusing the caller's edge
  * dedup into the repartition (partition-local dropDuplicates) —
  * complete-mode agg over the full edge table beat by the smaller
  * pre-doubling distinct. Re-measure before re-attempting any of them.
  */
object Graph {

  /** @param edges     directed edges (src, dst), both LongType
    * @param iterations number of damped propagation rounds
    * @param scale     fixed-point denominator (rank 1.0 ≡ `scale`)
    * @param dampingScaled damping factor × scale (0.85 → 850000)
    * @param symmetric when the edge set is known symmetric (u→v ⇒ v→u,
    *        e.g. an undirected graph doubled into directions), every
    *        node appears as a src, so the node set IS the degree table's
    *        key set — skips a whole corpus-sized distinct shuffle
    * @return (id, rank) for every node appearing in `edges`; rank is the
    *         fixed-point integer after `iterations` rounds from a flat
    *         start of `scale`. Dangling nodes contribute nothing (the
    *         common simplification; consistent with the oracle). */
  def pageRankFixedPoint(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L, dampingScaled: Long = 850000L,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      symmetric: Boolean = false,
      coBucketEdgeThreshold: Long = 14000000L): DataFrame = {
    val fin = math.max(iterations, 0)
    pageRankIterates(edges, iterations, Set(fin), scale, dampingScaled,
      broadcastNodeLimit, symmetric, coBucketEdgeThreshold)(fin)
  }

  /** [[pageRankFixedPoint]] with intermediate-iterate capture: ONE loop,
    * one edge cache, one regime decision, one stats job — and every
    * requested round's rank table returned alongside the final one.
    * Convergence telemetry (q186: L1/max delta between rounds k and
    * k+1) joins two captured iterates of a single run instead of
    * re-running the whole fixed point per telemetry point — each round
    * already localCheckpoints its rank table, so a capture is a free
    * reference, not extra work. The final round is always included.
    *
    * @param captureAt round numbers to keep (1-based; values outside
    *        [1, iterations] are ignored; `iterations` implied)
    * @return round → (id, rank); key 0 holds the flat start when
    *         `iterations <= 0` */
  def pageRankIterates(edges: DataFrame, iterations: Int,
      captureAt: Set[Int],
      scale: Long = 1000000L, dampingScaled: Long = 850000L,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      symmetric: Boolean = false,
      coBucketEdgeThreshold: Long = 14000000L): Map[Int, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    // Big-graph routing (symmetric graphs — the co-bucketed contract):
    // when the node table is too big to broadcast AND the edge table is
    // big enough that re-shuffling it every round dominates, the
    // bucketed-table regime wins. The round-6 grid put this at 40M
    // edges, but its "shuffle" arms were CONTAMINATED: AQE was
    // converting the per-round rank join to a runtime broadcast
    // whenever the compressed rank shuffle dipped under the 10 MB
    // auto-broadcast threshold, so those cells measured a
    // broadcast-assisted loop. The round-9 honest arms
    // (autoBroadcastJoinThreshold=-1, graft.Crossover shuffle_nobc;
    // warm, interleaved, min-of-2): at 9.6M edges / 1.2M nodes the
    // shuffle loop still wins (3.9 s vs 5.2 s co-bucketed — layout
    // writes don't pay off); at 18M / 2.2M co-bucketed wins 1.7x
    // (8.2 s vs 13.7 s); at 36M / 4.4M it wins 2.4x (13.9 s vs
    // 32.9 s). The 14M default sits between the measured 9.6M shuffle
    // win and the 18M co-bucketed win. The broadcast limit itself
    // resolves through [[GraphTuning]] (conf override + replication
    // cost model — local mode is one in-process copy, a cluster pays
    // nodeBytes × executors per round).
    //
    // Job-free fast path: #nodes <= 2 · #edges, so when the optimized
    // plan already bounds the edge count low enough that neither the
    // co-bucket route nor any non-broadcast regime is reachable, skip
    // the pre-loop stats job entirely (tiny graphs pay zero extra jobs).
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val provablySmall = edgeUpper.exists { case (u, _) =>
      u <= limit / 2 && u < coBucketEdgeThreshold }
    val symStats =
      if (symmetric && iterations >= 1 && !provablySmall)
        Some(edges.agg(count(lit(1)).as("m"),
          approx_count_distinct(col("src")).as("n")).first())
      else None
    val routeCoBucketed = symStats.exists { st =>
      st.getLong(1) > limit && st.getLong(0) >= coBucketEdgeThreshold }
    if (routeCoBucketed) {
      GraphTuning.decide(spark, "pageRankFixedPoint(co-bucket route)",
        nodeEstimate = symStats.get.getLong(1),
        nodeEstimateSource = "stats-agg-hll",
        edgeEstimate = symStats.get.getLong(0),
        requestedLimit = broadcastNodeLimit)
      return pageRankCoBucketedIterates(edges, iterations, captureAt,
        scale = scale, dampingScaled = dampingScaled)
    }
    // Degree is loop-invariant, so attach it in the SAME pass that
    // materializes the working edge table: a count window over src fuses
    // scan + degree + attach into one shuffle, where agg-then-join would
    // scan the upstream twice (or pay a second cache). The repartition by
    // dst then makes every iteration's groupBy(dst) exchange-free in
    // broadcast mode — the loop body is one broadcast join + one local
    // hash agg per round.
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .repartition(col("dst")).cache()
    def allNodes: DataFrame =
      if (symmetric) ew.select(col("src").as("id")).distinct()
      else ew.select(col("src").as("id"))
        .unionByName(ew.select(col("dst").as("id"))).distinct()
    // Asymmetric graphs need the exact node table anyway (nodes with no
    // in-edges keep the base rank via a left join); symmetric ones only
    // need a node COUNT to pick the plan, and an estimate is plenty for
    // a broadcast threshold — skip the corpus-sized distinct entirely.
    val nodes = if (symmetric) None else Some(allNodes.cache())
    val (nodeEst, nodeSrc) =
      if (provablySmall) (2 * edgeUpper.get._1, edgeUpper.get._2)
      else nodes.map(n => (n.count(), "exact-count")).getOrElse(
        symStats.map(st => (st.getLong(1), "stats-agg-hll")).getOrElse(
          (ew.agg(approx_count_distinct(col("src")).as("n"))
            .first().getLong(0), "hll")))
    val small = GraphTuning.decide(spark, "pageRankFixedPoint",
      nodeEst, nodeSrc,
      edgeEstimate = symStats.map(_.getLong(0))
        .orElse(edgeUpper.map(_._1)).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit).broadcast
    // Adaptive plan, same idea as the CC edge threshold: the rank table
    // is node-sized; below the limit broadcast it so the edge table
    // NEVER shuffles per iteration. Above it, fall back to shuffle joins
    // — there, co-bucketing edges and ranks by src (io/Bucketing) is the
    // cluster-scale answer. Checkpointed loop tables lose stats, so AQE
    // cannot make this call on its own.
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val base = scale - dampingScaled
    def damped(sums: DataFrame): DataFrame = {
      // symmetric ⇒ every node has an in-edge ⇒ the contribution sums
      // already cover the whole node set — skip the nodes left-join
      val withBase = nodes match {
        case Some(n) => n.join(maybeB(sums), Seq("id"), "left")
        case None    => sums
      }
      // Per-round eager checkpoint: keeps the plan flat (AQE re-plans a
      // small fresh tree each round instead of a growing nest of
      // broadcast subqueries — measured faster than lazy chaining) and
      // releases the previous round's broadcast.
      withBase.select(col("id"),
        (lit(base) + expr(s"($dampingScaled * coalesce(s, CAST(0 AS BIGINT))) div $scale"))
          .as("rank"))
        .localCheckpoint(true)
    }
    val captures = scala.collection.mutable.Map[Int, DataFrame]()
    var ranks =
      if (iterations <= 0) allNodes.withColumn("rank", lit(scale)).localCheckpoint(true)
      else damped( // round 1 propagates the constant flat rank — no join
        ew.select(col("dst").as("id"), expr(s"$scale div deg").as("c"))
          .groupBy("id").agg(sum(col("c")).as("s")))
    var it = if (iterations <= 0) 0 else 1
    if (captureAt(it)) captures(it) = ranks
    while (it < iterations) {
      it += 1
      ranks = damped(ew
        .join(maybeB(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s")))
      if (captureAt(it)) captures(it) = ranks
    }
    captures(it) = ranks // final round always captured
    // every captured table is checkpointed (no lineage into the caches) —
    // release the working tables so repeated invocations don't leak storage
    nodes.foreach(_.unpersist(blocking = false))
    ew.unpersist(blocking = false)
    captures.toMap
  }

  /** Weight-proportional PageRank, same integer fixed point as
    * [[pageRankFixedPoint]]: each edge carries
    * `(rank_src · w) div wout_src` instead of `rank div deg`, so mass
    * splits by edge weight — transaction-volume-weighted importance
    * instead of plain link counting. Out-weight is attached in the same
    * pass that materializes the working edge table (a sum window over
    * src fused into the one edge shuffle), and the loop body in the
    * broadcast regime is one broadcast join + one exchange-free agg per
    * round on the dst-partitioned cache.
    *
    * Parallel edges: each ROW floors independently — pre-aggregate
    * (src, dst) to fold multi-edges if combined-weight semantics are
    * wanted (the q177 construction does). Overflow: |rank · w| must fit
    * 64 bits — rank is O(scale · n) worst-case on a star, so keep
    * scale · n · w_max under ~9e18 (defaults give ample room through
    * billion-node graphs with bounded weights). No co-bucketed route —
    * above the resolved limit the loop degrades to per-round shuffle
    * joins; the [[pageRankCoBucketed]] layout argument ports verbatim
    * when a measured threshold justifies it.
    *
    * @param edges (src, dst, w) with w > 0
    * @param symmetric when the edge set is known symmetric (u→v ⇒ v→u),
    *        every node has an in-edge, so the per-round contribution
    *        sums already cover the whole node set — skips the exact
    *        node table (a corpus-sized distinct + count job) AND the
    *        per-round node-sized left join (the [[pageRankIterates]]
    *        discipline); the broadcast decision takes the proven plan
    *        bound or one HLL agg instead (round-16, VERDICT-r15 #5)
    * @return (id, rank) in `scale`-ths */
  def weightedPageRank(edges: DataFrame, iterations: Int,
      scale: Long = 1000000L, dampingScaled: Long = 850000L,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      symmetric: Boolean = false): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .withColumn("wout", sum(col("w")).over(Window.partitionBy("src")))
      .repartition(col("dst")).cache()
    def allNodes: DataFrame =
      if (symmetric) ew.select(col("src").as("id")).distinct()
      else ew.select(col("src").as("id"))
        .unionByName(ew.select(col("dst").as("id"))).distinct()
    // Asymmetric graphs need the exact node table anyway (nodes with no
    // in-edges keep the base rank via a left join); symmetric ones only
    // need a node COUNT to pick the plan — a proven plan bound
    // (#nodes <= #edge rows, every node is a src) or one HLL agg
    // replaces the distinct + exact count entirely.
    val nodes = if (symmetric && iterations >= 1) None else Some(allNodes.cache())
    val edgeUpper = GraphTuning.rowUpperBound(ew)
    val (nodeEst, nodeSrc) = nodes match {
      case Some(n) => (n.count(), "exact-count")
      case None => edgeUpper match {
        case Some((u, s)) if u <= limit => (u, s)
        case _ => (ew.agg(approx_count_distinct(col("src")).as("n"))
          .first().getLong(0), "hll")
      }
    }
    val small = GraphTuning.decide(spark, "weightedPageRank",
      nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit).broadcast
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val base = scale - dampingScaled
    def damped(sums: DataFrame): DataFrame = {
      // symmetric ⇒ every node has an in-edge ⇒ the contribution sums
      // already cover the whole node set — skip the nodes left-join
      val withBase = nodes match {
        case Some(n) => n.join(maybeB(sums), Seq("id"), "left")
        case None    => sums
      }
      withBase.select(col("id"), (lit(base) +
          expr(s"($dampingScaled * coalesce(s, CAST(0 AS BIGINT))) div $scale"))
          .as("rank"))
        .localCheckpoint(true)
    }
    var ranks =
      if (iterations <= 0)
        allNodes.withColumn("rank", lit(scale)).localCheckpoint(true)
      else damped(ew.select(col("dst").as("id"),
          expr(s"($scale * w) div wout").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s")))
    var it = 1
    while (it < iterations) {
      it += 1
      ranks = damped(ew
        .join(maybeB(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), expr("(rank * w) div wout").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s")))
    }
    nodes.foreach(_.unpersist(blocking = false))
    ew.unpersist(blocking = false)
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a directed edge set,
    * UNNORMALIZED integer fixed point: aₖ(v) = Σ_{(u,v)∈E} hₖ₋₁(u),
    * hₖ(u) = Σ_{(u,v)∈E} aₖ(v), h₀ ≡ 1. Dropping the per-round L2
    * normalization keeps every score an exact BIGINT — rankings are
    * unchanged (normalization is a positive scalar) and results are
    * bit-identical across engines/partitionings, like
    * [[pageRankFixedPoint]]. Magnitudes grow ~(d_in·d_out)^k per round,
    * so keep `iterations` small (≤4) or rescale externally; multi-edges
    * act as integer weights — pre-`distinct` if unweighted.
    *
    * Scale shape: the edge table is cached TWICE, partitioned by src and
    * by dst. In the broadcast regime each half-round is one broadcast
    * join (node-sized score table) + one hash agg whose grouping key
    * equals the cached partitioning — ZERO per-round Exchange on the
    * edge table — and the whole round (both half-rounds) materializes
    * as ONE checkpoint job: only hub_k is loop state, the auth half
    * rides the same job lazily, and the final round fuses into the
    * output join (job count asserted in GraphTuningSpec). Above
    * `broadcastNodeLimit` this ROUTES to [[hitsCoBucketed]].
    *
    * @return (id, hub, auth) for every node of `edges`; sink nodes have
    *         hub = 0, source nodes auth = 0 */
  def hits(edges: DataFrame, iterations: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      coBucketAboveBroadcast: Boolean = true): DataFrame = {
    require(iterations >= 1, "HITS needs at least one round")
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // ns + nd <= 2 · #edges: a plan-stats row bound proving the fit
    // skips the HLL job (no pre-loop stats job for tiny graphs).
    val edgeUpper = GraphTuning.rowUpperBound(e)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit / 2 => (2 * u, s)
      case _ =>
        val est = e.agg(
          approx_count_distinct(col("src")).as("ns"),
          approx_count_distinct(col("dst")).as("nd")).first()
        (est.getLong(0) + est.getLong(1), "hll")
    }
    val d = GraphTuning.decide(spark, "hits", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    val small = d.broadcast
    // Routing tests FITS, not the broadcast choice (the RegimeDecision
    // contract): a state table that can't fit any executor's budget must
    // leave the broadcast loop for the bucketed one (round-6 crossover
    // grid: co-bucketed beat the shuffle half-rounds 1.16x at 18M edges
    // and 1.6x at 36M — CROSSOVER.json), but a FITTING table whose
    // replication cost merely vetoed broadcast stays here on plain
    // shuffle joins — its per-round state is small, so the bucketed
    // layout writes would be pure overhead. The shuffle fallback also
    // stays reachable for the A/B harness via the flag.
    if (!d.fits && coBucketAboveBroadcast)
      return hitsCoBucketed(edges, iterations)
    val eSrc = e.repartition(col("src")).cache()
    val eDst = e.repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // Round-16 loop-action fusion, HITS edition: auth_k is a pure
    // function of hub_{k-1} and hub_k of auth_k, so the only state the
    // loop must MATERIALIZE is one hub table per round — each round's
    // auth half stays a lazy subtree composed into the hub checkpoint's
    // job (one job per round instead of two), and the FINAL round's hub
    // and auth fuse into the output join job itself. In the broadcast
    // regime both consumers of the final auth subtree (the hub
    // half-round and the output left-join) are BroadcastExchanges over
    // the same canonical plan, so ReuseExchange computes it once; the
    // non-broadcast regime checkpoints it instead (shuffle-join legs
    // need not reuse — the shared-branch rule).
    def authOf(h: DataFrame): DataFrame = eDst
      .join(maybeB(h.select(col("id").as("src"), col("hub"))), Seq("src"))
      .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("auth"))
    def hubOf(a: DataFrame): DataFrame = eSrc
      .join(maybeB(a.select(col("id").as("dst"), col("auth"))), Seq("dst"))
      .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hub"))
    // round 1 authority = in-degree (h₀ is the constant 1) — no join
    var authLazy: DataFrame = eDst.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("auth"))
    var it = 1
    while (it < iterations) {
      it += 1
      authLazy = authOf(hubOf(authLazy).localCheckpoint(true))
    }
    val authFinal = if (small) authLazy else authLazy.localCheckpoint(true)
    val nodes = eSrc.select(col("src").as("id"))
      .unionByName(eDst.select(col("dst").as("id"))).distinct()
    val out = nodes
      .join(maybeB(hubOf(authFinal)), Seq("id"), "left")
      .join(maybeB(authFinal), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
      .localCheckpoint(true)
    eSrc.unpersist(blocking = false)
    eDst.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS: exact shortest hop distance from ANY seed, up to
    * `maxHops` rounds — reachability labeling, contamination-radius and
    * "k hops from a flagged entity" queries.
    *
    * Frontier-based (the PPR discipline, `personalizedPageRank`): the
    * per-round join input is ONLY the rows discovered last round, never
    * the full distance table, and an anti-join keeps a node's FIRST
    * discovery (= its true BFS distance, since frontiers expand one hop
    * per round). State grows with the reached set; per-round cost decays
    * with the frontier. Rounds stop early when a frontier empties — the
    * per-round `isEmpty` is a frontier-sized action, cheap by
    * construction.
    *
    * Scale shape per round (broadcast regime): one broadcast join
    * against the dst-partitioned cached edge table + one hash agg on the
    * SAME dst key (exchange-free, the LPA layout argument) + one
    * broadcast anti-join. Above `broadcastNodeLimit` this ROUTES to
    * [[bfsDistancesCoBucketed]] — the bucketed-table regime where the
    * edge table shuffles once at layout and every round plans exactly
    * one Exchange.
    *
    * @param seeds one `id` column (LongType-castable); absent nodes are
    *              unreached within `maxHops` and are not returned
    * @return (id, dist) with dist ∈ [0, maxHops] */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      coBucketAboveBroadcast: Boolean = true): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    // distinct dst <= #edge rows: a plan-stats bound proving the fit
    // skips the HLL job (no pre-loop stats job for tiny graphs).
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (edges.agg(approx_count_distinct(col("dst")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "bfsDistances", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    val small = d.broadcast
    // Routing tests FITS (see [[hits]]): non-fitting state leaves for
    // the bucketed loop (round-6 crossover grid: co-bucketed beat the
    // shuffle rounds 2.1x at 36M edges, 1.1x at 72M — CROSSOVER.json);
    // fitting-but-cost-vetoed stays on plain shuffle joins here.
    if (!d.fits && coBucketAboveBroadcast)
      return bfsDistancesCoBucketed(edges, seeds, maxHops)
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // frontier counts OBSERVED in the checkpoint jobs (round-15 fusion)
    // — the old per-hop isEmpty was one extra job per hop
    val (seed0, nSeed) = GraphTuning.checkpointWithCount(
      seeds.select(col("id").cast("long"), lit(0L).as("dist")).distinct())
    // Only each hop's NEW frontier is ever materialized: the visited set
    // stays a lazy union of the checkpointed frontiers (scanning k small
    // flat frames per anti-join), where re-checkpointing the union would
    // rewrite every visited row once per hop — O(hops · nodes) total.
    var frontiers = List(seed0)
    var frontier = seed0
    var nFrontier = nSeed
    var hop = 0
    while (hop < maxHops && nFrontier > 0) {
      hop += 1
      val visited = frontiers.map(_.select("id")).reduce(_ unionByName _)
      val fn = GraphTuning.checkpointWithCount(ew
        .join(maybeB(frontier.select(col("id").as("src"))), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(maybeB(visited), Seq("id"), "left_anti")
        .withColumn("dist", lit(hop.toLong)))
      frontier = fn._1
      nFrontier = fn._2
      frontiers ::= frontier
    }
    ew.unpersist(blocking = false)
    frontiers.reduce(_ unionByName _)
  }

  /** Bit-packed multi-source BFS (the MS-BFS idea — Then et al.,
    * VLDB'15): exact hop distances from up to 64 landmark seeds in ONE
    * shared frontier sweep. Per-node state is a single 64-bit mask
    * (bit b set ⇔ reached by landmark b), so k landmarks cost one
    * traversal with bit-parallel frontier sharing instead of k
    * [[bfsDistances]] runs — the landmark-distance feature extractor
    * (graph embeddings, closeness sketches) at corpus scale. Unlike
    * [[bfsDistances]] (min distance over ALL seeds), the output keeps
    * the per-landmark distance. (Reference analog: k-hop entity
    * exposure queries, dataengineering/tigergraph/v1/queries.py.)
    *
    * Scale shape per round (broadcast regime): one broadcast join of
    * the (node, mask) frontier against the dst-partitioned cached edge
    * table, one `bit_or` agg on the SAME dst key (exchange-free), and
    * one reached-set-sized mask merge — the bitmask replaces what would
    * be a 64× wider (node, src) frontier. Set-bit explosion to
    * (id, src, dist) rows happens ONCE at the end, against a 64-row
    * broadcast bit map, never inside the loop. Above the resolved node
    * limit the loop degrades to per-round shuffle joins (the mask state
    * is 64× denser than per-source rows, so the broadcast regime
    * stretches much further than running k separate BFS).
    *
    * @param seeds one `id` column, at most 64 distinct ids
    * @return (id, src, dist) — dist ∈ [0, maxHops] hops from seed `src` */
  /** Landmark harmonic centrality over [[multiSourceBfs]]: each node's
    * Σ 10⁶ div dist(landmark, node) across the ≤ 64 bit-packed seeds
    * (self-distances excluded; unreached landmarks contribute 0 — the
    * harmonic convention, which is why harmonic beats closeness on
    * disconnected graphs). The landmark trick is the standard
    * scale-out: exact all-pairs centrality is O(n·m), landmarks bound
    * it at one shared bit-packed frontier sweep (the msbfs shape: the
    * 64 seeds ride ONE 64-bit mask through the loop) plus a node-keyed
    * rollup of the ≤ 64·n exploded distance rows. Integer ppm keeps
    * the score hash-exact cross-engine.
    *
    * @return (id, n_reached, harmonic_ppm) */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame =
    multiSourceBfs(edges, seeds, maxHops, broadcastNodeLimit)
      .filter(col("dist") > 0)
      .groupBy("id")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_ppm"))

  /** Per-landmark reach curve — the frontier-growth profile a graph
    * release report ships next to harmonic centrality: for each
    * landmark, how many nodes sit at each hop distance (a flattening
    * curve at small hops is the small-world/diameter evidence; a
    * landmark whose curve stalls is in a pocket). Same bit-packed
    * [[multiSourceBfs]] core as [[harmonicCentrality]] — one 64-seed
    * sweep prices ALL landmarks — with the rollup on the LANDMARK
    * side instead of the node side; the agg output is
    * |seeds| × maxHops rows at any graph size.
    *
    * @return (src, dist, n_nodes) — nodes first reached at exactly
    *         `dist` hops from landmark `src`, dist >= 1 */
  def landmarkReachProfile(edges: DataFrame, seeds: DataFrame,
      maxHops: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame =
    multiSourceBfs(edges, seeds, maxHops, broadcastNodeLimit)
      .filter(col("dist") > 0)
      .groupBy(col("src"), col("dist"))
      .agg(count(lit(1)).as("n_nodes"))

  /** One GraphSAGE-style neighbor-aggregation layer over an integer
    * node feature — the feature-engineering primitive a GNN training
    * pipeline materializes ahead of sampling (and the building block
    * of degree-based fraud features: "my neighbors' popularity"). The
    * feature here is the node degree itself, aggregated as sum and
    * max over each node's 1-hop neighborhood; stacking calls gives
    * k-hop receptive fields.
    *
    * Scale shape: degree is one edge-keyed partial agg; the gather is
    * ONE node-keyed hash join of edges against the node-sized degree
    * table (deliberately NOT broadcast — node-sized at 100 TB; AQE
    * handles hub skew) followed by a src-keyed partial agg. No
    * iteration, no window.
    *
    * @param edges directed pair list covering both directions of each
    *        undirected edge
    * @return (id, deg, sum_nbr_deg, max_nbr_deg) */
  def neighborFeatureAgg(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    edges
      .join(deg.select(col("id").as("dst"), col("deg").as("__nd")),
        Seq("dst"))
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"),
        sum(col("__nd")).as("sum_nbr_deg"),
        max(col("__nd")).as("max_nbr_deg"))
  }

  /** Link-prediction features over non-edges — the classic
    * common-neighbor family for "which connection forms next"
    * (recommendations, entity resolution candidates): for every node
    * pair with ≥ 1 common neighbor that is NOT already an edge,
    * report common-neighbor count, resource-allocation index
    * (Σ_v 1e6 div deg(v) — Adamic-Adar's integer-exact sibling: RA
    * weights rare bridges by 1/deg where AA uses 1/log deg, same
    * ranking intent, no float log), and neighborhood Jaccard in ppm.
    *
    * Hub contract: wedges route only through middle nodes with
    * deg(v) ≤ `maxMiddleDegree`. The wedge stream is Σ deg(v)² —
    * unbounded, a 201-degree hub in the sf0.1 co-order graph alone
    * makes 236M wedges where the capped stream is 1.5M (measured) —
    * and a hub is the LEAST informative common neighbor: its RA
    * weight 1e6 div deg(v) rounds to ~0 and co-occurring at a hub
    * predicts nothing (everyone co-occurs there). Capping the middle
    * bounds wedges by maxMiddleDegree·m — linear in edges at any
    * scale. Endpoint degrees (the Jaccard denominator) stay UNcapped.
    *
    * Scale shape: capped wedge join (two edge joins through the
    * shared middle), degrees ride one node-keyed agg joined into the
    * wedge (not broadcast — node-sized); existing edges leave via one
    * anti-join.
    *
    * @param canon canonical undirected edges (src < dst), deduped
    * @return (id_a, id_b, common, ra_ppm, jaccard_ppm), id_a < id_b */
  def linkPredictionFeatures(canon: DataFrame,
      maxMiddleDegree: Long = 64L): DataFrame = {
    require(maxMiddleDegree >= 2, "maxMiddleDegree must be >= 2")
    val ed = canon.unionByName(
      canon.select(col("dst").as("src"), col("src").as("dst")))
    // deg feeds three branches and legs both self-join sides; the
    // shared-branch materialization was TRIED and measured SLOWER
    // here (3.1 s plain vs 5.5 s both-checkpointed vs 3.4 s deg-only
    // at sf0.1): both frames are one scan + narrow agg/join off the
    // same input, and eager checkpoint IO costs more than recompute —
    // unlike the clusteringCoefficient case, whose shared frame is a
    // shuffled canonical edge set
    val deg = ed.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val mid = deg.filter(col("deg") <= maxMiddleDegree)
      .select(col("id").as("v"), col("deg").as("__dv"))
    // the cap joins into the LEGS, before the self-join — hub wedges
    // are never generated, not generated-then-dropped
    val legs = ed.select(col("src").as("v"), col("dst")).join(mid, Seq("v"))
    val wed = legs.select(col("v"), col("dst").as("a"), col("__dv"))
      .join(legs.select(col("v"), col("dst").as("b")), Seq("v"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 div __dv")).as("ra_ppm"))
    wed
      .join(canon.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .join(deg.select(col("id").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("__db")), Seq("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"), col("common"),
        col("ra_ppm"),
        expr("(common * 1000000) div (__da + __db - common)")
          .as("jaccard_ppm"))
  }

  def multiSourceBfs(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    // Bit assignment = rank of the distinct seed ids: a <= 64-row
    // single-partition window, deterministic across engines.
    val (sd, nSeeds) = GraphTuning.checkpointWithCount(
      seeds.select(col("id").cast("long")).distinct()
        .withColumn("bit",
          row_number().over(Window.orderBy(col("id"))) - 1))
    require(nSeeds <= 64, "multiSourceBfs packs at most 64 seeds")
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (edges.agg(approx_count_distinct(col("dst")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "multiSourceBfs", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    val small = d.broadcast
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // frontier counts observed in the checkpoint jobs (round-15 fusion)
    val f0 = sd.select(col("id"),
        expr("shiftleft(CAST(1 AS BIGINT), bit)").as("bits"),
        lit(0L).as("hop"))
      .localCheckpoint(true)
    var frontiers = List(f0)
    var frontier = f0
    var nFrontier = nSeeds
    var hop = 0
    while (hop < maxHops && nFrontier > 0) {
      hop += 1
      // Reached masks so far: lazy union of the checkpointed frontiers,
      // re-merged per round (reached-set-sized, the bfsDistances
      // anti-join-scan discipline — never rewritten, only re-read).
      val seen = frontiers.map(_.select("id", "bits"))
        .reduce(_ unionByName _)
        .groupBy("id").agg(expr("bit_or(bits)").as("seen"))
      val gathered = ew
        .join(maybeB(frontier.select(col("id").as("src"), col("bits"))),
          Seq("src"))
        .groupBy(col("dst").as("id")).agg(expr("bit_or(bits)").as("g"))
      val fn = GraphTuning.checkpointWithCount(gathered
        .join(maybeB(seen), Seq("id"), "left")
        .select(col("id"), col("g")
          .bitwiseAND(bitwise_not(coalesce(col("seen"), lit(0L))))
          .as("bits"))
        .filter(col("bits") =!= 0L)
        .withColumn("hop", lit(hop.toLong)))
      frontier = fn._1
      nFrontier = fn._2
      frontiers ::= frontier
    }
    ew.unpersist(blocking = false)
    frontiers.reduce(_ unionByName _)
      .select(col("id"), col("hop").as("dist"), explode(expr(
        "filter(sequence(0, 63), b -> ((bits >> b) & 1) = 1)")).as("bit"))
      .join(broadcast(sd.select(col("bit"), col("id").as("src"))),
        Seq("bit"))
      .select(col("id"), col("src"), col("dist"))
  }

  /** Big-graph regime — the cluster answer above `broadcastNodeLimit`
    * that the adaptive path's scaladoc promises: edges live as a table
    * bucketed by src (degree attached at layout time), and each round's
    * rank table is written bucketed by the SAME key and bucket count, so
    * the per-round edges⋈ranks join plans bucket-to-bucket with ZERO
    * Exchange on either side — the 100-TB edge table is shuffled exactly
    * once (at layout) and never again. The only per-round exchange is
    * the narrow (dst, contribution) aggregation, and because the
    * aggregation's output partitioning (hash by dst) is the bucket
    * partitioning of the next rank table, the bucketed write emits
    * straight from the agg tasks. Per-round Exchange count: 1 (vs 3+
    * for the naive shuffle-join loop) — asserted in GraphSpec.
    *
    * Contract: symmetric edge set (u→v ⇒ v→u), same as
    * `pageRankFixedPoint(symmetric = true)`; results are bit-identical
    * to it (same integer fixed-point math). Tables are created under
    * `tablePrefix` and dropped before returning; the returned frame is
    * materialized first.
    */
  def pageRankCoBucketed(edges: DataFrame, iterations: Int,
      numBuckets: Int = 0, scale: Long = 1000000L,
      dampingScaled: Long = 850000L,
      tablePrefix: String = "graft_pr"): DataFrame =
    pageRankCoBucketedIterates(edges, iterations, Set(iterations),
      numBuckets, scale, dampingScaled, tablePrefix)(iterations)

  /** Iterate-capturing form of [[pageRankCoBucketed]] (the co-bucketed
    * leg of [[pageRankIterates]]): every round's rank table already
    * exists as a bucketed work table, so capturing round k is one
    * bucketed-table read + localCheckpoint before the `finally` drops
    * the work tables. Same single-Exchange-per-round layout. */
  def pageRankCoBucketedIterates(edges: DataFrame, iterations: Int,
      captureAt: Set[Int], numBuckets: Int = 0, scale: Long = 1000000L,
      dampingScaled: Long = 850000L,
      tablePrefix: String = "graft_pr"): Map[Int, DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1, "co-bucketed loop needs >= 1 iteration")
    val spark = edges.sparkSession
    // numBuckets <= 0 derives from shuffle.partitions: the bucket count
    // pins every round's Exchange width, so it must scale with cores
    // (Bucketing.resolveBuckets), not sit at a literal.
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val edgesTbl = s"${pfx}_edges"
    def rankTbl(i: Int) = s"${pfx}_ranks_$i"
    val wt = new WorkTables(spark, nb)
    try {
      // Layout: ONE shuffle on src fuses the degree window and the bucket
      // placement; every later round reads this table in place.
      val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      wt.write(ew, edgesTbl, Seq("src"))
      val base = scale - dampingScaled
      // Round 1 propagates the constant flat rank — no join needed.
      wt.write(
        spark.table(edgesTbl)
          .select(col("dst"), expr(s"$scale div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("s"))
          .select(col("dst").as("src"),
            (lit(base) + expr(s"($dampingScaled * s) div $scale")).as("rank")),
        rankTbl(1), Seq("src"))
      var it = 1
      while (it < iterations) {
        it += 1
        wt.write(
          coBucketedRound(spark, edgesTbl, rankTbl(it - 1), scale, dampingScaled),
          rankTbl(it), Seq("src"))
      }
      // Captures materialize (eager localCheckpoint) BEFORE the finally
      // drops the bucketed work tables they read from.
      (captureAt + it).filter(r => r >= 1 && r <= it).map { r =>
        r -> spark.table(rankTbl(r))
          .select(col("src").as("id"), col("rank")).localCheckpoint(true)
      }.toMap
    } finally wt.dropAll()
  }

  /** One co-bucketed propagation round (exposed for plan inspection):
    * the bucketed-table join carries no Exchange; the (dst, c) agg is
    * the round's single shuffle. */
  def coBucketedRound(spark: SparkSession, edgesTable: String,
      ranksTable: String, scale: Long, dampingScaled: Long): DataFrame =
    spark.table(edgesTable).join(spark.table(ranksTable), Seq("src"))
      .select(col("dst"), expr("rank div deg").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("s"))
      .select(col("dst").as("src"),
        (lit(scale - dampingScaled) + expr(s"($dampingScaled * s) div $scale"))
          .as("rank"))

  private def dropTables(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  /** Work-table registry for a co-bucketed loop: every bucketed write is
    * recorded so `dropAll` (called from the loop's `finally`) removes
    * exactly what was created — a mid-round failure can no longer leak
    * catalog entries or warehouse files. `unique` appends a
    * per-invocation random suffix to the caller's prefix so concurrent
    * invocations (two jobs on one metastore, two threads in one session)
    * never overwrite each other's intermediate tables. */
  private class WorkTables(spark: SparkSession, numBuckets: Int) {
    private val created = scala.collection.mutable.ArrayBuffer[String]()
    def write(df: DataFrame, table: String, bucketCols: Seq[String]): Unit = {
      graft.io.Bucketing.writeBucketed(df, table, bucketCols, numBuckets)
      created += table
    }
    /** [[write]] with a long-valued aggregate OBSERVED during the
      * bucketed-write job itself (round-15 loop-action fusion, the
      * [[GraphTuning.checkpointWithCount]] pattern applied to the
      * co-bucketed regimes): the loops' convergence/frontier counts
      * previously RE-READ the just-written table — at 100 TB a full
      * per-round pass over the round's label/frontier table. */
    def writeObserving(df: DataFrame, table: String,
        bucketCols: Seq[String],
        metric: org.apache.spark.sql.Column): Long = {
      val obs = org.apache.spark.sql.Observation()
      write(df.observe(obs, coalesce(metric, lit(0L)).as("n")),
        table, bucketCols)
      GraphTuning.longMetric(obs.get("n"))
    }
    def dropAll(): Unit = dropTables(spark, created.toSeq: _*)
  }

  private def unique(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"

  /** One co-bucketed LPA round (exposed for plan inspection): the
    * edges⋈labels join is bucket-to-bucket (no Exchange); the single
    * per-round shuffle is the explicit repartition on dst, after which
    * BOTH vote aggregations are exchange-free (hash(dst) satisfies the
    * (dst, lbl) clustering by the subset rule, and the per-dst argmax
    * reuses the same partitioning). */
  def lpaCoBucketedRound(spark: SparkSession, edgesTable: String,
      labelsTable: String, numBuckets: Int): DataFrame =
    spark.table(edgesTable).join(spark.table(labelsTable), Seq("src"))
      .select(col("dst"), col("lbl"))
      .repartition(numBuckets, col("dst"))
      .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(min_by(col("lbl"),
        struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
      .select(col("dst").as("src"), col("lbl"))

  /** Big-graph LPA — [[labelPropagation]] above `broadcastNodeLimit`,
    * built on the [[pageRankCoBucketed]] layout: edges bucketed by src
    * once, each round's label table written bucketed by the same key,
    * so the per-round edges⋈labels join plans bucket-to-bucket with
    * ZERO Exchange on the (100 TB) edge side. Per-round Exchange count:
    * 1 (the narrow (dst, lbl) vote repartition) — asserted in GraphSpec.
    * Results are bit-identical to [[labelPropagation]] (same sync-LPA
    * integer math; parity-tested). Contract: symmetric edge set, like
    * the broadcast variant. */
  def labelPropagationCoBucketed(edges: DataFrame, iterations: Int,
      numBuckets: Int = 0, tablePrefix: String = "graft_lpa"): DataFrame = {
    require(iterations >= 1, "co-bucketed loop needs >= 1 iteration")
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val edgesTbl = s"${pfx}_edges"
    def lblTbl(i: Int) = s"${pfx}_labels_$i"
    val wt = new WorkTables(spark, nb)
    try {
      wt.write(
        edges.select(col("src").cast("long"), col("dst").cast("long")),
        edgesTbl, Seq("src"))
      // initial labels: own id; distinct-on-src is a bucket-aligned agg
      // (zero Exchange) over the just-written edge table
      wt.write(
        spark.table(edgesTbl).select(col("src")).distinct()
          .withColumn("lbl", col("src")),
        lblTbl(0), Seq("src"))
      var it = 0
      while (it < iterations) {
        it += 1
        wt.write(
          lpaCoBucketedRound(spark, edgesTbl, lblTbl(it - 1), nb),
          lblTbl(it), Seq("src"))
      }
      spark.table(lblTbl(it))
        .select(col("src").as("id"), col("lbl").as("label"))
        .localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** One co-bucketed HITS half-round (exposed for plan inspection):
    * the edges⋈score join is bucket-to-bucket on `joinKey` [0 Exchange
    * — score tables are bucketed by id, alias-compatible with the join
    * key]; the opposite-endpoint sum agg is the half-round's single
    * Exchange, whose output partitioning IS the next table's bucket
    * layout. */
  def hitsCoBucketedHalfRound(spark: SparkSession, edgesTable: String,
      scoreTable: String, joinKey: String, aggKey: String,
      scoreCol: String, outCol: String): DataFrame =
    spark.table(edgesTable)
      .join(spark.table(scoreTable).withColumnRenamed("id", joinKey),
        Seq(joinKey))
      .groupBy(col(aggKey).as("id")).agg(sum(col(scoreCol)).as(outCol))

  /** Big-graph HITS — [[hits]] above `broadcastNodeLimit`: the two edge
    * layouts become two bucketed tables (by src / by dst, written once),
    * and each half-round is one bucket-to-bucket join + one sum agg
    * whose exchange doubles as the next score table's bucket layout —
    * 1 Exchange per half-round (asserted in GraphSpec), the edge tables
    * never re-shuffle. Round-1 authority (= in-degree) is a
    * bucket-aligned agg with zero Exchange. Bit-identical to [[hits]]
    * (same unnormalized integer fixed point; parity-tested). */
  def hitsCoBucketed(edges: DataFrame, iterations: Int,
      numBuckets: Int = 0, tablePrefix: String = "graft_hits"): DataFrame = {
    require(iterations >= 1, "HITS needs at least one round")
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val eSrcTbl = s"${pfx}_esrc"
    val eDstTbl = s"${pfx}_edst"
    def authTbl(i: Int) = s"${pfx}_auth_$i"
    def hubTbl(i: Int) = s"${pfx}_hub_$i"
    val wt = new WorkTables(spark, nb)
    try {
      wt.write(
        edges.select(col("src").cast("long"), col("dst").cast("long")),
        eSrcTbl, Seq("src"))
      wt.write(spark.table(eSrcTbl), eDstTbl, Seq("dst"))
      wt.write(
        spark.table(eDstTbl).groupBy(col("dst").as("id"))
          .agg(count(lit(1)).as("auth")),
        authTbl(1), Seq("id"))
      wt.write(
        hitsCoBucketedHalfRound(spark, eDstTbl, authTbl(1), "dst", "src",
          "auth", "hub"),
        hubTbl(1), Seq("id"))
      var it = 1
      while (it < iterations) {
        it += 1
        wt.write(
          hitsCoBucketedHalfRound(spark, eSrcTbl, hubTbl(it - 1), "src", "dst",
            "hub", "auth"),
          authTbl(it), Seq("id"))
        wt.write(
          hitsCoBucketedHalfRound(spark, eDstTbl, authTbl(it), "dst", "src",
            "auth", "hub"),
          hubTbl(it), Seq("id"))
      }
      val nodes = spark.table(eSrcTbl).select(col("src").as("id"))
        .unionByName(spark.table(eDstTbl).select(col("dst").as("id"))).distinct()
      nodes
        .join(spark.table(hubTbl(it)), Seq("id"), "left")
        .join(spark.table(authTbl(it)), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("auth"), lit(0L)).as("auth"))
        .localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** One co-bucketed hash-min + pointer-jump CC round (exposed for plan
    * inspection): neighbor-min is a bucket join [0 Exchange] + one
    * node-sized agg on dst [Exchange 1, = the next label table's bucket
    * layout]; the candidate merge is bucket-aligned on id [0]; the
    * pointer jump joins candidate labels against the label table on
    * LABEL = id — the bucketed side stays in place, the candidate side
    * re-clusters [Exchange 2]. The `__changed` flag rides along for the
    * caller's convergence check. Edge rows never move. */
  def ccCoBucketedRound(spark: SparkSession, edgesTable: String,
      labelsTable: String): DataFrame = {
    val labels = spark.table(labelsTable).select("id", "label")
    val neighborMin = spark.table(edgesTable)
      .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
      .groupBy(col("dst").as("id")).agg(min(col("label")).as("nlabel"))
    val cand = labels.join(neighborMin, Seq("id"), "left")
      .select(col("id"), col("label").as("__old"),
        least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
    val parent = labels.select(col("id").as("__pid"), col("label").as("__plabel"))
    cand.join(parent, cand("label") === parent("__pid"), "left")
      .select(cand("id"),
        least(cand("label"), coalesce(col("__plabel"), cand("label"))).as("label"),
        (least(cand("label"), coalesce(col("__plabel"), cand("label"))) <
          col("__old")).as("__changed"))
  }

  /** Big-graph connected components — the bucketed-table regime of the
    * hash-min/pointer-jump loop in `Dedup.duplicateClusters` (the dedup
    * clustering backbone): edges bucketed by src once, the label table
    * rewritten bucketed by id per round. Per-round Exchange count: 2,
    * BOTH node-sized (the neighbor-min agg and the pointer-jump
    * re-cluster) — the edge table never re-shuffles, where the plain
    * distributed loop re-shuffles the edge rows every round
    * (plan-asserted in GraphSpec). Same integer hash-min math ⇒
    * bit-identical labels (parity-tested). O(log diameter) rounds via
    * the pointer jump.
    *
    * @param edges symmetric directed pairs (u→v AND v→u), like the
    *              doubled edge set duplicateClusters builds
    * @return (id, label) for every node appearing as a src; label is the
    *         component's minimum id */
  def connectedComponentsCoBucketed(edges: DataFrame,
      maxIterations: Int = 20, numBuckets: Int = 0,
      tablePrefix: String = "graft_cc"): DataFrame = {
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val edgesTbl = s"${pfx}_edges"
    def lblTbl(i: Int) = s"${pfx}_labels_$i"
    val wt = new WorkTables(spark, nb)
    try {
      wt.write(
        edges.select(col("src").cast("long"), col("dst").cast("long")),
        edgesTbl, Seq("src"))
      wt.write(
        spark.table(edgesTbl).select(col("src").as("id")).distinct()
          .withColumn("label", col("id")),
        lblTbl(0), Seq("id"))
      var converged = false
      var it = 0
      while (!converged && it < maxIterations) {
        it += 1
        // changed-row count observed in the bucketed write itself —
        // the old convergence check re-read the whole label table
        val nChanged = wt.writeObserving(
          ccCoBucketedRound(spark, edgesTbl, lblTbl(it - 1)),
          lblTbl(it), Seq("id"),
          sum(when(col("__changed"), 1L).otherwise(0L)))
        converged = nChanged == 0
      }
      spark.table(lblTbl(it)).select(col("id"), col("label"))
        .localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** One co-bucketed BFS expansion round (exposed for plan inspection):
    * bucket join against the frontier [0 Exchange] → repartition+distinct
    * on dst [the round's 1 Exchange, numBuckets partitions so the
    * anti-join stays co-located] → first-discovery anti-join vs the
    * visited table [0 Exchange]. */
  def bfsCoBucketedRound(spark: SparkSession, edgesTable: String,
      frontierTable: String, visitedTable: String, numBuckets: Int,
      hop: Int): DataFrame =
    spark.table(edgesTable)
      .join(spark.table(frontierTable).select("src"), Seq("src"))
      .select(col("dst").as("src"))
      .repartition(numBuckets, col("src")).distinct()
      .join(spark.table(visitedTable), Seq("src"), "left_anti")
      .withColumn("dist", lit(hop.toLong))

  /** Big-graph multi-source BFS — [[bfsDistances]] above
    * `broadcastNodeLimit`, same bucketed discipline: edges bucketed by
    * src once; the frontier AND the visited set live as tables bucketed
    * by the same key, so the per-round frontier join and the
    * first-discovery anti-join are both bucket-to-bucket with zero
    * Exchange. Per-round Exchange count: 1 (the dst-distinct
    * repartition of the raw frontier expansion) — asserted in
    * GraphSpec. The visited table is rewritten per round
    * (O(reached) rows, the same cost class as the PR rank rewrite);
    * the edge table never re-shuffles. Results equal
    * [[bfsDistances]] (parity-tested). */
  def bfsDistancesCoBucketed(edges: DataFrame, seeds: DataFrame,
      maxHops: Int, numBuckets: Int = 0,
      tablePrefix: String = "graft_bfs"): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val edgesTbl = s"${pfx}_edges"
    def frontTbl(i: Int) = s"${pfx}_frontier_$i"
    def visTbl(i: Int) = s"${pfx}_visited_$i"
    val wt = new WorkTables(spark, nb)
    try {
      wt.write(
        edges.select(col("src").cast("long"), col("dst").cast("long")),
        edgesTbl, Seq("src"))
      val seed0 = seeds.select(col("id").cast("long").as("src"),
        lit(0L).as("dist")).distinct()
      // frontier sizes observed in the bucketed writes themselves —
      // the old loop re-read each just-written frontier table to count
      var frontierSize =
        wt.writeObserving(seed0, frontTbl(0), Seq("src"), count(lit(1)))
      wt.write(spark.table(frontTbl(0)), visTbl(0), Seq("src"))
      var hop = 0
      while (hop < maxHops && frontierSize > 0) {
        hop += 1
        frontierSize = wt.writeObserving(
          bfsCoBucketedRound(spark, edgesTbl, frontTbl(hop - 1), visTbl(hop - 1),
            nb, hop),
          frontTbl(hop), Seq("src"), count(lit(1)))
        wt.write(
          spark.table(visTbl(hop - 1)).unionByName(spark.table(frontTbl(hop))),
          visTbl(hop), Seq("src"))
      }
      spark.table(visTbl(hop))
        .select(col("src").as("id"), col("dist")).localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** Multi-source WEIGHTED shortest paths — bounded-round Bellman-Ford
    * with a delta frontier. After `maxRounds` rounds every returned
    * `dist` is the exact minimum path weight over paths of at most
    * `maxRounds` edges from any seed (the standard bounded-hop
    * semantics; exact all-paths SSSP when `maxRounds` >= the graph's
    * weighted-hop diameter). Weights may be any Long — with negative
    * weights the ≤k-edge minimum is still exact because no path longer
    * than `maxRounds` edges is ever considered.
    *
    * Unlike BFS a node can be RE-improved in a later round, so there is
    * no first-discovery anti-join: each round relaxes only from the
    * frontier (nodes whose best distance improved last round — the
    * delta-stepping observation that an improvement at hop k must pass
    * through an improvement at hop k-1), compares candidates against
    * the best table, and rewrites best as union+min. Per-round cost:
    * one edges⋈frontier join (broadcast when the node state fits the
    * resolved limit), one (dst, min) agg, one frontier-vs-best join,
    * one O(reached) best rewrite — the same cost class as the PR rank
    * rewrite. Routing follows the [[GraphTuning.RegimeDecision]]
    * contract with an EDGE threshold on top: non-fitting state leaves
    * for [[ssspDistancesCoBucketed]] only when the edge count also
    * clears `coBucketEdgeThreshold` — the measured grid
    * (graft.Crossover sssp, honest shuffle_nobc arms, warm interleaved
    * min-of-2) has the co-bucketed loop LOSING at 36M edges / 5.0M
    * nodes (20.0 s vs 11.9 s shuffle) and winning 2.4× at 72M / 10.0M
    * (16.7 s vs 40.1 s); the 50M default sits between. Unlike BFS
    * (which wins co-bucketed already at 36M) SSSP pays two bucketed
    * writes per round (frontier + full-outer best rewrite), so its
    * layout overhead needs more edge mass to amortize.
    * Fitting-but-cost-vetoed stays on plain shuffle joins here.
    *
    * @param edges (src, dst, w), all LongType-castable; parallel edges
    *              fold into their min weight naturally (the min agg)
    * @param seeds one `id` column; absent nodes are unreached within
    *              `maxRounds` and are not returned
    * @return (id, dist): exact ≤`maxRounds`-edge shortest distance */
  def ssspDistances(edges: DataFrame, seeds: DataFrame, maxRounds: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      coBucketAboveBroadcast: Boolean = true,
      coBucketEdgeThreshold: Long = 50000000L): DataFrame = {
    require(maxRounds >= 0, "maxRounds must be >= 0")
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (edges.agg(approx_count_distinct(col("dst")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "ssspDistances", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    val small = d.broadcast
    if (!d.fits && coBucketAboveBroadcast) {
      // the plan bound can prove the edge count BELOW the threshold for
      // free; otherwise one exact count (the non-fitting case is a big
      // graph — the same stats-job class as the PR route)
      val m = edgeUpper match {
        case Some((u, _)) if u < coBucketEdgeThreshold => -1L
        case _ => edges.count()
      }
      if (m >= coBucketEdgeThreshold)
        return ssspDistancesCoBucketed(edges, seeds, maxRounds)
    }
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // frontier counts observed in the checkpoint jobs (round-15
    // fusion) — the old loop paid TWO isEmpty jobs per round (the
    // while guard plus the best-rewrite guard)
    var (best, nFrontier) = GraphTuning.checkpointWithCount(
      seeds.select(col("id").cast("long"), lit(0L).as("dist")).distinct())
    var frontier = best
    var round = 0
    while (round < maxRounds && nFrontier > 0) {
      round += 1
      val cand = ew
        .join(maybeB(frontier.select(col("id").as("src"),
          col("dist").as("fd"))), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("fd") + col("w")).as("cand"))
      val fn = GraphTuning.checkpointWithCount(cand
        .join(maybeB(best.withColumnRenamed("dist", "old")), Seq("id"), "left")
        .filter(col("old").isNull || col("cand") < col("old"))
        .select(col("id"), col("cand").as("dist")))
      frontier = fn._1
      nFrontier = fn._2
      // best rewrite as REPLACE (anti-join old rows out, union the
      // strictly-better frontier in) rather than union+groupBy-min: in
      // the broadcast regime the anti side broadcasts, so the rewrite
      // costs ZERO shuffle of the reached set (the groupBy spelling
      // shuffles best+frontier every round). Equivalent by
      // construction — frontier rows are strictly smaller. Measured
      // parity at sf0.1 (3.12 s vs 3.23 s min-of-5, inside the 0.6 s
      // spread — the checkpoint write dominates at this size); kept
      // for the structural zero-shuffle edge when `best` is large.
      if (nFrontier > 0)
        best = best.join(maybeB(frontier.select("id")), Seq("id"), "left_anti")
          .unionByName(frontier)
          .localCheckpoint(true)
    }
    ew.unpersist(blocking = false)
    best
  }

  /** Time-respecting earliest-arrival reachability: over temporal edges
    * (src, dst, t), a path is valid only if its edge times STRICTLY
    * increase, and each reached node gets the minimum arrival time over
    * valid paths of at most `maxRounds` edges from any seed — the
    * "taint/exposure propagation" query class (who could information or
    * funds have reached, and when) that plain BFS gets wrong because it
    * happily walks backwards in time. (Reference analog: transaction
    * tracing over the TigerGraph projection,
    * dataengineering/tigergraph/v1/queries.py.)
    *
    * Same delta-frontier Bellman-Ford shape as [[ssspDistances]] — a
    * node can RE-improve in a later round, and an improved (earlier)
    * arrival can newly open edges whose t lies between the old and new
    * arrival, so relaxation must re-run from every improved node: the
    * frontier is exactly those. Per-round cost: one edges⋈frontier join
    * (broadcast when the node state fits the resolved limit) with the
    * `t > arrival` relaxation filter map-side, one (dst, min t) agg, one
    * frontier-vs-best compare, one zero-shuffle best REPLACE rewrite.
    *
    * @param edges (src, dst, t); parallel edges fold via the min agg
    * @param seeds one `id` column; seeds get arrival -1 (before every
    *              edge time — times must be >= 0)
    * @return (id, arr): minimum arrival time over time-respecting paths
    *         of ≤ `maxRounds` edges; seeds carry arr = -1 */
  def temporalEarliestArrival(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    require(maxRounds >= 0, "maxRounds must be >= 0")
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (edges.agg(approx_count_distinct(col("dst")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "temporalEarliestArrival", nodeEst,
      nodeSrc, edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    val small = d.broadcast
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("t").cast("long")).repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // frontier counts observed in the checkpoint jobs (round-15 fusion)
    var (best, nFrontier) = GraphTuning.checkpointWithCount(
      seeds.select(col("id").cast("long"), lit(-1L).as("arr")).distinct())
    var frontier = best
    var round = 0
    while (round < maxRounds && nFrontier > 0) {
      round += 1
      val cand = ew
        .join(maybeB(frontier.select(col("id").as("src"),
          col("arr").as("fa"))), Seq("src"))
        .filter(col("t") > col("fa"))
        .groupBy(col("dst").as("id")).agg(min(col("t")).as("cand"))
      val fn = GraphTuning.checkpointWithCount(cand
        .join(maybeB(best.withColumnRenamed("arr", "old")), Seq("id"), "left")
        .filter(col("old").isNull || col("cand") < col("old"))
        .select(col("id"), col("cand").as("arr")))
      frontier = fn._1
      nFrontier = fn._2
      if (nFrontier > 0)
        best = best.join(maybeB(frontier.select("id")), Seq("id"), "left_anti")
          .unionByName(frontier)
          .localCheckpoint(true)
    }
    ew.unpersist(blocking = false)
    best
  }

  /** One co-bucketed SSSP relaxation round (exposed for plan
    * inspection): the edges⋈frontier join is bucket-to-bucket
    * [0 Exchange]; the round's 1 Exchange is the repartition onto the
    * candidate key, after which the min-agg is exchange-free and the
    * improvement join against the best table is co-located. */
  def ssspCoBucketedRound(spark: SparkSession, edgesTable: String,
      frontierTable: String, bestTable: String, numBuckets: Int): DataFrame =
    spark.table(edgesTable)
      .join(spark.table(frontierTable).withColumnRenamed("dist", "fd"),
        Seq("src"))
      .select(col("dst").as("src"), (col("fd") + col("w")).as("cand"))
      .repartition(numBuckets, col("src"))
      .groupBy("src").agg(min(col("cand")).as("cand"))
      .join(spark.table(bestTable).withColumnRenamed("dist", "old"),
        Seq("src"), "left")
      .filter(col("old").isNull || col("cand") < col("old"))
      .select(col("src"), col("cand").as("dist"))

  /** Big-graph weighted SSSP — [[ssspDistances]] above
    * `broadcastNodeLimit`, same bucketed discipline as
    * [[bfsDistancesCoBucketed]]: edges bucketed by src once; the
    * frontier AND the best-distance tables live bucketed by the same
    * key, so the per-round relaxation join and the improvement join are
    * bucket-to-bucket, and the best rewrite is a bucket-aligned full
    * outer join [0 Exchange] where the frontier side wins (it is
    * strictly smaller by construction). Per-round Exchange count: 1
    * (the candidate repartition in [[ssspCoBucketedRound]]). The edge
    * table never re-shuffles; best is rewritten per round (O(reached)
    * rows). Results equal [[ssspDistances]] (parity-tested). */
  def ssspDistancesCoBucketed(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int, numBuckets: Int = 0,
      tablePrefix: String = "graft_sssp"): DataFrame = {
    require(maxRounds >= 0, "maxRounds must be >= 0")
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    val edgesTbl = s"${pfx}_edges"
    def frontTbl(i: Int) = s"${pfx}_frontier_$i"
    def bestTbl(i: Int) = s"${pfx}_best_$i"
    val wt = new WorkTables(spark, nb)
    try {
      wt.write(
        edges.select(col("src").cast("long"), col("dst").cast("long"),
          col("w").cast("long")),
        edgesTbl, Seq("src"))
      val seed0 = seeds.select(col("id").cast("long").as("src"),
        lit(0L).as("dist")).distinct()
      // frontier sizes observed in the bucketed writes themselves —
      // the old loop re-read each just-written frontier table to count
      var frontierSize =
        wt.writeObserving(seed0, frontTbl(0), Seq("src"), count(lit(1)))
      wt.write(spark.table(frontTbl(0)), bestTbl(0), Seq("src"))
      var round = 0
      while (round < maxRounds && frontierSize > 0) {
        round += 1
        frontierSize = wt.writeObserving(
          ssspCoBucketedRound(spark, edgesTbl, frontTbl(round - 1),
            bestTbl(round - 1), nb),
          frontTbl(round), Seq("src"), count(lit(1)))
        wt.write(
          spark.table(bestTbl(round - 1))
            .join(spark.table(frontTbl(round)).withColumnRenamed("dist", "nd"),
              Seq("src"), "full_outer")
            .select(col("src"),
              coalesce(col("nd"), col("dist")).as("dist")),
          bestTbl(round), Seq("src"))
      }
      spark.table(bestTbl(round))
        .select(col("src").as("id"), col("dist")).localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** DETERMINISTIC random walks — the node2vec/DeepWalk corpus-prep
    * step (one walk per seed, `steps` hops) with the RNG replaced by
    * the portable md5 family: at step t the walk at node u moves to the
    * out-neighbor v minimizing (md5_32("walk:t:v"), v). That is a
    * uniform-looking but fully deterministic choice — bit-identical
    * across partitionings, reruns and engines (DuckDB replays every
    * step with the same `('0x'||substr(md5(…),1,8))::BIGINT` key), so
    * walk corpora are reproducible and the operator sits under the
    * exact oracle gate, where a seeded `rand()` would diverge between
    * engines in the first row.
    *
    * Scale shape per step: edges⋈walks join (walk state broadcast when
    * it fits the resolved limit — walk count is SEED-sized, not
    * node-sized) + one walk-keyed argmin agg (`min(struct(h, v))`,
    * partial+final with map-side combine — O(walks) shuffle rows). The
    * src-partitioned cached edge table never re-shuffles. Walks at a
    * node with no out-edge simply end (no row emitted for later steps).
    *
    * @param edges (src, dst) directed; walk symmetric graphs by passing
    *              the doubled edge set
    * @param seeds one `id` column; one walk starts per distinct seed
    * @return (walk, step, node): the full trajectory, step ∈ [0, steps],
    *         walk = the seed id */
  def deterministicWalks(edges: DataFrame, seeds: DataFrame, steps: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    require(steps >= 0, "steps must be >= 0")
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    // the plan bound only counts when it PROVES the fit — a unioned /
    // filtered seed source can over-estimate by orders of magnitude,
    // and mis-demoting a tiny walk set costs a shuffle join per step
    // (the BFS discipline: bound-or-stats-job, never bound-or-guess)
    val walkUpper = GraphTuning.rowUpperBound(seeds)
    val (walkEst, walkSrc) = walkUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (seeds.select(col("id")).distinct().count(), "exact")
    }
    val d = GraphTuning.decide(spark, "deterministicWalks", walkEst, walkSrc,
      edgeEstimate = GraphTuning.rowUpperBound(edges).map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    def maybeB(df: DataFrame): DataFrame = if (d.broadcast) broadcast(df) else df
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).cache()
    // walk-state counts observed in the checkpoint jobs (round-15
    // fusion) — the old per-step isEmpty was one extra job per step
    val (seed0, nSeed) = GraphTuning.checkpointWithCount(
      seeds.select(col("id").cast("long").as("walk")).distinct())
    var cur = seed0.withColumn("node", col("walk"))
    var nCur = nSeed
    var out = List(cur.withColumn("step", lit(0L)))
    var t = 0
    while (t < steps && nCur > 0) {
      t += 1
      // the portable per-step key: md5_32("walk:t:candidate") — the
      // exact string the oracle rebuilds (Corpus.md5Uniform contract)
      val h = conv(substring(md5(concat(col("walk").cast("string"),
        lit(s":$t:"), col("dst").cast("string")).cast("binary")), 1, 8),
        16, 10).cast("bigint")
      val cn = GraphTuning.checkpointWithCount(ew
        .join(maybeB(cur.select(col("node").as("src"), col("walk"))), Seq("src"))
        .select(col("walk"), col("dst"), h.as("h"))
        .groupBy("walk").agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk"), col("m.dst").as("node")))
      cur = cn._1
      nCur = cn._2
      out ::= cur.withColumn("step", lit(t.toLong))
    }
    ew.unpersist(blocking = false)
    out.reduce(_ unionByName _).select("walk", "step", "node")
  }

  /** Skip-gram co-occurrence statistics over [[deterministicWalks]] —
    * the corpus-prep step BETWEEN walking and training graph features
    * (DeepWalk/node2vec turn walks into (center, context) pairs; the
    * GloVe/PPMI family trains on exactly these association counts):
    * for every walk position, its nodes within `window` later steps
    * form an unordered pair (self-pairs from immediate backtracks
    * dropped), and each surviving pair carries its count and an
    * integer association score
    *
    *   lift_ppm = c_ab · T² · 10⁶ div (c_a · c_b · P)
    *
    * — the PMI ratio BEFORE the log (rank-equivalent, and exact in
    * 64-bit integers where a float log diverges between engines).
    * T = walk positions, P = total pairs, c_x = node occurrence counts.
    *
    * Scale shape: pairs come from ONE window pass over the walk table
    * (an array of `lead` offsets sharing the walk partitioning — no
    * self-join, no per-offset scan); the walk table and the pair-count
    * table each materialize once and feed their scalar totals via
    * broadcast one-row frames (shared-branch rule, no driver collect);
    * the only shuffles are the walk-keyed window and the two count
    * aggs. Association math runs in DECIMAL(38,0) (numerator
    * c_ab·T²·10⁶ ≤ T³·10⁶ stays exact through T ≈ 10¹⁰ positions; the
    * old long spelling wrapped silently at T ≈ 3·10⁶ for any
    * c_ab ≥ 2), floored back to BIGINT by `div` — identical in DuckDB.
    *
    * @return (na, nb, c_ab, lift_ppm), na < nb, c_ab >= minCount */
  /** [[walkCooccurrence]]'s association score over columns
    * (c_ab, t, ca, cb, p): `c_ab·T²·10⁶ div (c_a·c_b·P)` with BOTH
    * products in DECIMAL(38,0) (the q227/q229 discipline) — the long
    * spelling wraps SILENTLY once c_ab·T²·10⁶ passes 2⁶³ (at T = 3·10⁶
    * any c_ab ≥ 2 already does — VERDICT r14 #2) while DuckDB would
    * raise, an unguarded cross-engine divergence. Decimal keeps the
    * products exact through ~10³⁸; `div` floors back to BIGINT
    * identically in both engines, and values are unchanged wherever
    * the long math didn't wrap (GraphSpec lift-overflow test). */
  private[graft] def liftPpm: org.apache.spark.sql.Column =
    expr("(cast(c_ab as decimal(38,0)) * t * t * 1000000) div " +
      "(cast(ca as decimal(38,0)) * cb * p)")

  def walkCooccurrence(edges: DataFrame, seeds: DataFrame, steps: Int,
      window: Int, minCount: Long = 2L,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    require(window >= 1, s"need window >= 1 (got $window)")
    val w = deterministicWalks(edges, seeds, steps, broadcastNodeLimit)
      .localCheckpoint(true) // feeds pairs + occurrence counts + T
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("walk").orderBy("step")
    val ctx = array((1 to window).map(o =>
      lead(col("node"), o).over(wk)): _*)
    // window exprs evaluate in their own projection; the generator
    // explodes the materialized array in the next one
    val pairs = w.select(col("node").as("u"), ctx.as("ctx"))
      .select(col("u"), explode(col("ctx")).as("v"))
      .filter(col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("na"),
        greatest(col("u"), col("v")).as("nb"))
    val pc = pairs.groupBy("na", "nb").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true) // feeds the result + the P total
    val occ = w.groupBy("node").agg(count(lit(1)).as("c"))
    val tot = w.agg(count(lit(1)).as("t"))
    val ptot = pc.agg(sum(col("c_ab")).as("p"))
    pc.filter(col("c_ab") >= minCount)
      .join(occ.select(col("node").as("na"), col("c").as("ca")), Seq("na"))
      .join(occ.select(col("node").as("nb"), col("c").as("cb")), Seq("nb"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ptot))
      .select(col("na"), col("nb"), col("c_ab"), liftPpm.as("lift_ppm"))
  }

  /** One co-bucketed k-core survivor filter (exposed for plan
    * inspection): semi-join on src is bucket-to-bucket [0 Exchange];
    * the dst-side semi-join re-clusters the shrinking edge set [the
    * round's 1 Exchange] while the keep table side stays in place. */
  def kCoreCoBucketedFilter(spark: SparkSession, srcEdgesTable: String,
      keepTable: String): DataFrame = {
    val keep = spark.table(keepTable)
    spark.table(srcEdgesTable)
      .join(keep.withColumnRenamed("id", "src"), Seq("src"), "semi")
      .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "semi")
      .select("src", "dst")
  }

  /** Big-graph k-core peeling — [[kCore]] above `broadcastNodeLimit`.
    * Layout keeps TWO bucketed copies of the (shrinking) edge set — by
    * src and by dst, the HITS discipline — so each round's degree
    * computation is two bucket-aligned aggs merged by a bucket-aligned
    * full outer join: ZERO Exchange for degrees (the broadcast variant
    * pays a node-id shuffle). The survivor filter is one bucket
    * semi-join on src [0 exch] + one semi-join on dst (1 Exchange of
    * the shrinking edge set — the round's only one, asserted in
    * GraphSpec); both next-round copies are then bucketed WRITES (no
    * exchange: bucketed writes cluster into per-bucket files task-
    * locally). The keep set never shuffles. Results equal [[kCore]]
    * (parity-tested). Input contract: canonical undirected edges, like
    * [[kCore]] (dedup + self-loop drop applied here too). */
  def kCoreCoBucketed(edges: DataFrame, k: Int, maxRounds: Int,
      numBuckets: Int = 0, tablePrefix: String = "graft_kcore"): DataFrame = {
    val spark = edges.sparkSession
    val nb = graft.io.Bucketing.resolveBuckets(spark, numBuckets)
    val pfx = unique(tablePrefix)
    def srcTbl(i: Int) = s"${pfx}_esrc_$i"
    def dstTbl(i: Int) = s"${pfx}_edst_$i"
    def keepTbl(i: Int) = s"${pfx}_keep_$i"
    val wt = new WorkTables(spark, nb)
    try {
      val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst")).distinct()
      // edge counts observed in the bucketed writes themselves —
      // the old loop re-read each just-written edge table to count
      var m = wt.writeObserving(e0, srcTbl(0), Seq("src"), count(lit(1)))
      wt.write(spark.table(srcTbl(0)), dstTbl(0), Seq("dst"))
      // degrees with zero Exchange: out-half aggregated on the src-bucketed
      // copy, in-half on the dst-bucketed copy, merged bucket-to-bucket
      def degrees(i: Int): DataFrame = {
        val out = spark.table(srcTbl(i)).groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("od"))
        val in = spark.table(dstTbl(i)).groupBy(col("dst").as("id"))
          .agg(count(lit(1)).as("in_d"))
        out.join(in, Seq("id"), "full_outer")
          .select(col("id"),
            (coalesce(col("od"), lit(0L)) + coalesce(col("in_d"), lit(0L)))
              .as("deg"))
      }
      var round = 0
      var done = m == 0L
      while (!done && round < maxRounds) {
        round += 1
        wt.write(
          degrees(round - 1).filter(col("deg") >= k).select("id"),
          keepTbl(round), Seq("id"))
        wt.write(
          kCoreCoBucketedFilter(spark, srcTbl(round - 1), keepTbl(round)),
          dstTbl(round), Seq("dst"))
        val m2 = wt.writeObserving(spark.table(dstTbl(round)),
          srcTbl(round), Seq("src"), count(lit(1)))
        done = m2 == m
        m = m2
      }
      degrees(round).filter(col("deg") > 0)
        .select(col("id"), col("deg")).localCheckpoint(true)
    } finally wt.dropAll()
  }

  /** Per-item butterfly counts — the bipartite clustering signal
    * (bipartite graphs have no triangles; the 4-cycle "butterfly" is
    * their cohesion primitive): for item u,
    * `bf(u) = Σ_v C(w(u,v), 2)` where `w(u,v)` = groups shared by items
    * u and v. High butterfly mass = densely co-purchased / co-clicked
    * neighborhoods.
    *
    * Scale shape: rides [[coOccurrenceEdges]] (one fact shuffle,
    * hub-capped groups so the pair explosion is bounded map-side at
    * cap²/2), then one (a, b) pair agg and one item-sized node agg.
    * `w·(w−1)` is always even, so the halving stays exact.
    *
    * @return (id, butterflies) over the item side */
  def butterflyCounts(facts: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int = 8): DataFrame = {
    val pw = coOccurrenceEdges(facts, groupCol, itemCol, maxGroupSize)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    pw.select(explode(array(col("src"), col("dst"))).as("id"),
        expr("(w * (w - 1)) div 2").as("bf"))
      .groupBy("id").agg(sum("bf").as("butterflies"))
  }

  /** Co-occurrence edge generation straight from a (group, item) fact
    * stream — "wallets sharing a transaction", "parts sharing an order".
    * ONE groupBy shuffle collects each group's distinct items via
    * [[graft.expressions.CollectLongsDistinctCapped]] (so duplicated
    * fact rows need no pre-distinct pass and a hub group's buffer is
    * bounded at cap+1 longs); groups exceeding `maxGroupSize` distinct
    * items are dropped — the standard guard against the quadratic pair
    * explosion a mega-group would cause. Pairs then explode MAP-side
    * (≤ cap²/2 per group). Output is canonical (src < dst) but may
    * repeat a pair across groups — compose with [[triangleCounts]]
    * (which dedups) or add `.distinct()` when uniqueness matters. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.expressions.CollectCapped.collectLongsDistinctCapped(
        col(itemCol).cast("long"), maxGroupSize).as("items"))
      .filter(size(col("items")) <= maxGroupSize)
      .select(explode(expr(
        "filter(flatten(transform(items, x -> transform(items, " +
          "y -> named_struct('src', x, 'dst', y)))), s -> s.src < s.dst)"))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Personalized PageRank: damped propagation where teleport mass
    * returns to a SEED set instead of all nodes — "importance relative
    * to these accounts / this topic", the standard neighborhood-ranking
    * and fraud-propagation primitive.
    *
    * The scale property global PageRank can't offer: the rank table is
    * FRONTIER-sized. r0 is |seeds| rows and each round only reaches
    * nodes within i hops of a seed, so on a 100 TB graph with a handful
    * of seeds the per-round state stays tiny while the edge table —
    * degree attached in the same materializing pass, repartitioned by
    * dst once — never re-shuffles (broadcast regime) and its
    * contribution aggregation is exchange-free on the dst partitioning.
    * The damp-after-sum order matches the oracle's integer arithmetic
    * bit-for-bit: `(d * Σ(rank div deg)) div scale`, then + base at
    * seeds, all in fixed-point longs.
    *
    * @param seeds one column `id`; deduplicated here
    * @return (id, rank) for nodes reachable within `iterations` hops of
    *         a seed (unreached nodes are implicitly rank 0) */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, scale: Long = 1000000L, dampingScaled: Long = 850000L,
      broadcastRankLimit: Long = GraphTuning.Auto): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The rank table here is FRONTIER-sized and grows per round, so the
    // broadcast decision is re-taken each round against the resolved
    // limit (the per-round count is loop bookkeeping, not an extra
    // stats pass — the frontier is checkpointed and tiny by contract).
    val (rankLimit, _) =
      GraphTuning.resolveNodeLimit(edges.sparkSession, broadcastRankLimit)
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .repartition(col("dst")).cache()
    val sd = seeds.select(col("id").cast("long")).distinct()
      .localCheckpoint(true)
    val base = scale - dampingScaled
    // per-round count OBSERVED in the checkpoint job (the round-15
    // loop-action fusion, GraphTuning.checkpointWithCount) — the old
    // separate ranks.count() was one extra job per round
    var (ranks, nRanks) = GraphTuning.checkpointWithCount(
      sd.withColumn("rank", lit(scale)))
    var it = 0
    while (it < iterations) {
      it += 1
      val r = if (nRanks <= rankLimit) broadcast(ranks) else ranks
      val contrib = ew
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val rn = GraphTuning.checkpointWithCount(
        sd.withColumn("r", lit(base))
          .unionByName(contrib.select(col("id"),
            expr(s"($dampingScaled * s) div $scale").as("r")))
          .groupBy("id").agg(sum(col("r")).as("rank")))
      ranks = rn._1
      nRanks = rn._2
    }
    ew.unpersist(blocking = false)
    ranks
  }

  /** k-core decomposition by iterative peeling: drop every node whose
    * degree is below `k`, recompute degrees on the surviving subgraph,
    * repeat until fixpoint (or `maxRounds`). Returns the surviving nodes
    * with their core-subgraph degree — the standard spam/quality signal
    * for link graphs and the densest-region pre-filter for community
    * mining.
    *
    * Input: canonical undirected edges (src < dst); duplicates are
    * dedup'd and self-loops dropped here. Per round: ONE node-id
    * partial-agg shuffle for degrees, then two SEMI-joins of the edge
    * table against the (node-sized, broadcast below `broadcastNodeLimit`)
    * survivor set — the edge table itself never re-shuffles in broadcast
    * regime. The broadcast decision is re-taken per round against the
    * shrinking edge count, so a big graph whose core prunes quickly
    * picks up the broadcast semi-joins mid-run. localCheckpoint per round keeps the plan flat (same
    * discipline as the PageRank/LPA loops); early-exit when an edge
    * count round removes nothing is semantics-preserving for the
    * fixed-unroll oracle because post-fixpoint rounds are no-ops in any
    * engine. All-integer, so the loop is oracle-checked bit-for-bit.
    * Above `broadcastNodeLimit` use [[kCoreCoBucketed]]. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    // edge counts observed in the checkpoint jobs (round-15 fusion) —
    // the old per-round e.count() was a whole extra PASS over the
    // round's surviving edge set
    var (e, m) = GraphTuning.checkpointWithCount(
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst")).distinct())
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("src").as("id"))
        .unionAll(ed.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    // #nodes <= 2m, so the edge count (needed anyway for the fixpoint
    // test) bounds the keep set without a separate distinct-count
    // action. The decision is RE-TAKEN every round against the CURRENT
    // edge count: peeling shrinks the graph, so a run that starts in
    // the shuffle regime switches to broadcast semi-joins once the
    // surviving core fits (round-8 advice — a frozen pre-loop decision
    // lost that mid-run switch the old per-round closure had).
    // Cost-veto exempt (edgeEstimate left unknown): the 2m node bound
    // and the per-round shuffle volume are the SAME statistic here, so
    // the veto would compare 64m against max(24m, floor) and
    // structurally demote every graph above the floor regardless of
    // the conf limit — the conf-resolved fit test alone governs.
    def regime(mNow: Long): Boolean = GraphTuning.decide(
      edges.sparkSession, "kCore",
      nodeEstimate = if (mNow > Long.MaxValue / 2) Long.MaxValue else 2 * mNow,
      nodeEstimateSource = "edge-count-bound",
      requestedLimit = broadcastNodeLimit).broadcast
    var round = 0
    var done = m == 0L
    while (!done && round < maxRounds) {
      round += 1
      val small = regime(m)
      def maybeB(df: DataFrame): DataFrame =
        if (small) broadcast(df) else df
      val keep = degrees(e).filter(col("deg") >= k).select("id")
      val en = GraphTuning.checkpointWithCount(e
        .join(maybeB(keep.withColumnRenamed("id", "src")), Seq("src"), "semi")
        .join(maybeB(keep.withColumnRenamed("id", "dst")), Seq("dst"), "semi")
        .select("src", "dst"))
      e = en._1
      done = en._2 == m
      m = en._2
    }
    degrees(e).select(col("id"), col("deg"))
  }

  /** Synchronous label propagation (community detection): every node
    * starts labeled with its own id; each round it adopts the MODE of
    * its neighbors' labels, ties broken by the smallest label — the
    * deterministic variant of Raghavan et al.'s LPA (async LPA is
    * run-order-dependent and could never be oracle-checked). All-integer:
    * labels are ids, votes are counts, so every round is bit-identical
    * across engines and partitionings.
    *
    * Contract: symmetric edge set (u→v ⇒ v→u), like
    * `pageRankFixedPoint(symmetric = true)` — every node then has
    * in-edges, so the vote table covers the whole node set and no
    * carry-forward join is needed. Per round: one edges⋈labels join
    * (labels broadcast below `broadcastNodeLimit` — the edge table never
    * shuffles after the initial repartition), a (dst, lbl) partial-agg
    * shuffle, and a per-dst argmax via min_by on the (-count, label)
    * struct (deterministic: the ordering key contains the value).
    * localCheckpoint per round keeps the plan flat, same discipline as
    * the PageRank/CC loops.
    *
    * Above `broadcastNodeLimit` the big-graph regime IS
    * [[labelPropagationCoBucketed]] (routed here): the round-6
    * crossover grid (graft.Crossover, CROSSOVER.json; warm,
    * interleaved, min-of-2) measured the co-bucketed loop beating the
    * degraded shuffle-join rounds at every scale where broadcast is
    * off the table — 31.9 s vs 44.2 s at 64M edges, 36.7 s vs 52.6 s
    * at 128M, 96.9 s vs 169.3 s at 213M (1.4-1.7x) — so the shuffle
    * fallback survives only behind `coBucketAboveBroadcast = false`
    * (the A/B harness needs it; production callers should not). */
  def labelPropagation(edges: DataFrame, iterations: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      coBucketAboveBroadcast: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    // distinct src <= #edge rows: a plan-stats bound proving the fit
    // skips the HLL job (no pre-loop stats job for tiny graphs).
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if u <= limit => (u, s)
      case _ => (edges.agg(approx_count_distinct(col("src")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "labelPropagation", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(_._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    // Routing tests FITS (see [[hits]]): non-fitting labels leave for
    // the bucketed loop; fitting-but-cost-vetoed stays on shuffle joins.
    if (!d.fits && coBucketAboveBroadcast)
      return labelPropagationCoBucketed(edges, iterations)
    // Partition the edge table by DST, not src: the per-round join is a
    // BROADCAST of the label table (no src co-location needed), and
    // hash(dst) satisfies the clustering requirement of BOTH round aggs
    // — groupBy(dst, lbl) (subset rule) and groupBy(id=dst) (alias-aware
    // partitioning through the projections) — so a broadcast-mode round
    // plans with ZERO Exchange (asserted in GraphSpec).
    // cache, NOT localCheckpoint: the InMemoryRelation keeps the
    // hash(dst) output partitioning (a checkpoint's LogicalRDD drops it
    // — measured: both round aggs re-shuffle), which is what makes the
    // rounds exchange-free.
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("dst")).cache()
    def maybeB(df: DataFrame): DataFrame =
      if (d.broadcast) broadcast(df) else df
    var labels = ew.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    var it = 0
    while (it < iterations) {
      it += 1
      labels = ew
        .join(maybeB(labels.withColumnRenamed("id", "src")), Seq("src"))
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy("id")
        .agg(min_by(col("lbl"),
          struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
    }
    ew.unpersist(blocking = false)
    labels.select(col("id"), col("lbl").as("label"))
  }

  /** Exact per-node triangle counts via degree orientation (the MPC/
    * MapReduce-standard algorithm: Suri & Vassilvitskii "Counting
    * Triangles and the Curse of the Last Reducer", WWW'11). Each
    * undirected edge is oriented from its (degree, id)-smaller endpoint,
    * which bounds every node's OUT-degree by O(√m) regardless of how
    * skewed the raw degree distribution is — the hub that would
    * otherwise emit deg² wedges emits none, because all its edges point
    * INTO it. Total wedge volume is O(m^1.5) worst-case, the provable
    * optimum for exact counting, and each triangle is generated exactly
    * once (at its unique (deg,id)-minimal apex).
    *
    * Shuffle shape: canonical dedup (1), degree partial-agg (1), two
    * degree-attach joins (node-sized build — broadcast below
    * `broadcastNodeLimit`). Then, below `broadcastEdgeLimit`: a
    * node-sized adjacency agg (1 narrow shuffle) and per-edge sorted
    * intersection — no wedge ever materializes. Above it: wedge
    * self-join on the apex (one Exchange, reused for both sides via
    * repartition+cache), Bloom-pruned closure join against the canonical
    * edge set on the (v, w) pair. Only (long, long) pairs ever shuffle —
    * no payload columns.
    *
    * @param edges undirected edges as (src, dst) in either/both
    *              directions; duplicates and self-loops are dropped
    * @return (id, triangles) for EVERY node of the graph, zero included
    */
  /** Shared engine of [[triangleCounts]] and [[edgeSupport]]: degree
    * orientation + triangle enumeration over a cached canonical edge
    * set, regime-routed exactly as documented on [[triangleCounts]].
    * Caller owns `canon`; everything this allocates is in `cleanup`. */
  private case class TriangleStream(tris: DataFrame, deg: DataFrame,
      small: Boolean, cleanup: Seq[DataFrame])

  private def orientedTriangleStream(spark: org.apache.spark.sql.SparkSession,
      canon: DataFrame, st: org.apache.spark.sql.Row, nEdges: Long,
      broadcastNodeLimit: Long, broadcastEdgeLimit: Long): TriangleStream = {
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .cache()
    val small = GraphTuning.decide(spark, "triangleCounts",
      nodeEstimate = st.getLong(3), nodeEstimateSource = "hll-sum",
      edgeEstimate = nEdges, requestedLimit = broadcastNodeLimit).broadcast
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // When ids fit in 31 bits, the wedge-volume closure probe joins on
    // ONE packed long instead of a (long, long) pair — Spark builds a
    // LongHashedRelation (dense long-keyed map) instead of hashing
    // UnsafeRow keys, and every one of the O(m^1.5) probes gets cheaper.
    val packable = st.getLong(1) >= 0L && st.getLong(2) < (1L << 31)
    // Orient a—b (a<b canonical) from the (deg, id)-smaller endpoint;
    // the id tie-break makes orientation total and deterministic.
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orientedBase = canon
      .join(maybeB(deg.select(col("id").as("a"), col("d").as("da"))), Seq("a"))
      .join(maybeB(deg.select(col("id").as("b"), col("d").as("db"))), Seq("b"))
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // Broadcast regime — sorted-adjacency INTERSECTION, not wedge
    // enumeration: each triangle (u→v, u→w, v→w in the orientation DAG)
    // is exactly a w ∈ N⁺(u) ∩ N⁺(v) for the oriented edge (u, v), so
    // emitting `intersectSorted(adj[u], adj[v])` per EDGE finds each
    // triangle once without ever materializing the O(m^1.5) wedge
    // stream. Work is Σ_(u,v)∈E (od(u)+od(v)) merge steps inside one
    // codegen stage over m rows — at sf0.1 that is ~150M long compares
    // vs 32.4M wedge rows through join machinery (measured 3.7 s →
    // 2.4 s end-to-end q111). One extra narrow shuffle builds the
    // (u, sorted nbrs) adjacency (node-sized, ≈ m longs total, ~8 MB at
    // sf0.1), broadcast to both join legs; nodes without out-edges are
    // absent from adj and the inner join correctly drops their edges
    // (no w can close them).
    //
    // Above the limit: wedge enumeration by shuffle self-join — the
    // genuinely-huge-graph regime, where per-node adjacency arrays
    // could not broadcast anyway.
    val (oriented, tris) =
      if (nEdges <= broadcastEdgeLimit) {
        // cached: BOTH broadcast legs build from adj (their plans differ
        // by a projection, so ReuseExchange cannot merge them) — without
        // the cache the node-sized adjacency agg would run twice
        val adj = orientedBase.groupBy(col("u"))
          .agg(sort_array(collect_list(col("v"))).as("nbrs"))
          .cache()
        val t = orientedBase
          .join(broadcast(adj), Seq("u"))
          .join(broadcast(adj.select(col("u").as("v"),
            col("nbrs").as("nbrs_v"))), Seq("v"))
          .select(col("u"), col("v"),
            explode(graft.expressions.SortedArrays.intersectSorted(
              col("nbrs"), col("nbrs_v"))).as("w"))
        (Some(adj), t)
      } else {
        val o = orientedBase.repartition(col("u")).cache()
        val wedges = o.join(o.withColumnRenamed("v", "w"), Seq("u"))
          .filter(col("v") < col("w"))
        // Shuffle-closure regime: almost no wedge closes (1.45M
        // triangles out of 32M wedges at sf0.1), yet every wedge would
        // ride the closure exchange. A Bloom filter over the canonical
        // edge set (Spark's own runtime-filter machinery:
        // BloomFilterAggregate built distributed, the ~8-bits/edge
        // sketch embedded as a literal and probed by codegen'd
        // xxhash64) drops non-closing wedges MAP-side, so the exchange
        // carries survivors + false positives instead of the full
        // wedge volume. The exact join after it makes false positives
        // harmless — results are identical, partitioning-independent.
        // Measured 60 s → 23 s at 10.6M edges / 324M wedges.
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.graft.Bridge
        val numBits = math.min(8L * nEdges, 1L << 28)
        val bf = Bridge.column(new BloomFilterAggregate(
          Bridge.expression(xxhash64(col("a"), col("b"))),
          Literal(nEdges), Literal(numBits)).toAggregateExpression())
        val bytes = canon.select(bf.as("bf")).head().getAs[Array[Byte]](0)
        val pruned = wedges.filter(Bridge.column(new BloomFilterMightContain(
          Literal(bytes, org.apache.spark.sql.types.BinaryType),
          Bridge.expression(xxhash64(col("v"), col("w"))))))
        // When ids fit in 31 bits the closure joins on ONE packed long
        // (LongHashedRelation) instead of a (long, long) UnsafeRow key.
        val t =
          if (packable) pruned.join(
            canon.select((shiftleft(col("a"), 32) + col("b")).as("__k")),
            shiftleft(col("v"), 32) + col("w") === col("__k"))
            .select("u", "v", "w")
          else pruned
            .join(canon, col("v") === col("a") && col("w") === col("b"))
            .select("u", "v", "w")
        (Some(o), t)
      }
    TriangleStream(tris, deg, small, oriented.toSeq :+ deg)
  }

  /** `broadcastEdgeLimit` (the adjacency-intersection vs wedge+Bloom
    * switch for the whole triangle family) was raised 8M → 32M in
    * round 10 from a measured grid (graft.Crossover `tri` family,
    * honest AQE-disabled arms, CROSSOVER.json
    * `triangle_family_broadcastEdgeLimit`): adjacency-intersection won
    * 1.8× at 8.5M canonical edges (10.91 s vs 19.82), 3.2× at 16M
    * (9.83 vs 31.04) and 2.3× at 32M (42.23 vs 95.75) — the wedge
    * regime never wins inside the measured range. The true ceiling is
    * EXECUTOR MEMORY, not time: the broadcast adjacency costs
    * ~8 B/edge per executor copy (32M edges ≈ 256 MB), so
    * memory-tight clusters should lower the limit; the wedge+Bloom
    * regime remains the only option once the adjacency cannot fit. */
  def triangleCounts(edges: DataFrame,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    // Below `broadcastEdgeLimit` the adjacency-intersection regime runs
    // entirely on broadcast node-sized state (8M edges ≈ 128 MB of
    // packed adjacency longs); above it, wedge enumeration by shuffle.
    //
    // ONE stats action decides every regime knob (edge count, id bounds,
    // node-count upper bound): the previous canon.count / deg.count /
    // bounds.first sequence serialized three jobs for ~1 s of pure
    // latency at sf0.1. The node estimate a+b double-counts nodes seen
    // on both sides — only ever conservative (skips broadcast early,
    // never OOMs late). canon has a < b, so min(a)/max(b) bound all ids.
    val st = canon.agg(count(lit(1)).as("m"),
      min(col("a")).as("lo"), max(col("b")).as("hi"),
      (approx_count_distinct(col("a")) + approx_count_distinct(col("b")))
        .as("nUpper")).first()
    val nEdges = st.getLong(0)
    if (nEdges == 0) {
      val out = canon.select(col("a").as("id"), col("b").as("triangles"))
      canon.unpersist(blocking = false)
      return out
    }
    val tm = orientedTriangleStream(edges.sparkSession, canon, st, nEdges,
      broadcastNodeLimit, broadcastEdgeLimit)
    def maybeB(df: DataFrame): DataFrame = if (tm.small) broadcast(df) else df
    val counts = tm.tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val out = tm.deg.select("id")
      .join(maybeB(counts), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint(true)
    tm.cleanup.foreach(_.unpersist(blocking = false))
    canon.unpersist(blocking = false)
    out
  }

  /** Local clustering coefficient per node, in exact integer ppm:
    * `1e6 · 2·tri(v) / (deg(v)·(deg(v)−1))` over the canonical
    * undirected simple graph (deg < 2 nodes get 0) — how close each
    * node's neighborhood is to a clique, the standard community-ness
    * node feature next to [[triangleCounts]].
    *
    * Scale shape: [[triangleCounts]]'s oriented O(m^1.5) enumeration
    * does all the heavy lifting; degrees are one map-side endpoint
    * explode + node-sized agg on the SAME canonical edge cache, and the
    * final join is node-sized. Integer floor division keeps the output
    * bit-reproducible cross-engine.
    *
    * @return (id, degree, triangles, cc_ppm) for every node */
  def clusteringCoefficient(edges: DataFrame,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L): DataFrame = {
    // Canonicalize ONCE and run the oriented triangle stream directly
    // over the cached canonical set (round-16): the old composition
    // handed triangleCounts a projection of `canon`, paying a SECOND
    // canonical `distinct` — a full edge-set Exchange — inside it, and
    // then re-aggregated a degree table the stream had already built
    // and cached (tm.deg IS degree: both endpoints of every canonical
    // edge, counted). Same kernel, two fewer edge passes, one fewer
    // exchange — plans/r16/{before,after}/q170_clustering_coeff.txt.
    val canon = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    val st = canon.agg(count(lit(1)).as("m"),
      min(col("a")).as("lo"), max(col("b")).as("hi"),
      (approx_count_distinct(col("a")) + approx_count_distinct(col("b")))
        .as("nUpper")).first()
    val nEdges = st.getLong(0)
    if (nEdges == 0) {
      val out = canon.select(col("a").as("id"), col("b").as("degree"),
        lit(0L).as("triangles"), lit(0L).as("cc_ppm"))
      canon.unpersist(blocking = false)
      return out
    }
    val tm = orientedTriangleStream(canon.sparkSession, canon, st, nEdges,
      broadcastNodeLimit, broadcastEdgeLimit)
    def maybeB(df: DataFrame): DataFrame = if (tm.small) broadcast(df) else df
    val counts = tm.tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val out = tm.deg.select(col("id"), col("d").as("degree"))
      .join(maybeB(counts), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          expr("(2000000 * coalesce(triangles, 0)) div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
      .localCheckpoint(true)
    tm.cleanup.foreach(_.unpersist(blocking = false))
    canon.unpersist(blocking = false)
    out
  }

  /** Per-edge triangle support — the k-truss kernel: an edge survives
    * a k-truss iff its support (triangles containing it) stays
    * ≥ k − 2 under peeling; this one-pass support table is both the
    * peel's unit of work and, on its own, the standard edge-strength /
    * community-backbone signal. Reuses [[triangleCounts]]'s oriented
    * enumeration verbatim (each triangle found exactly once at its
    * (deg,id)-minimal apex), then fans each triangle out to its three
    * CANONICAL edges map-side and partial-aggregates on (a, b) — edge
    * output is edge-sized, triangle volume never shuffles un-reduced.
    *
    * @return (a, b, support) for EVERY canonical edge, zero included */
  def edgeSupport(edges: DataFrame,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    // edgeSupportCanon unpersists `canon` itself (a no-op for the
    // checkpointed frames the trussPeel rounds pass in)
    edgeSupportCanon(canon, broadcastNodeLimit, broadcastEdgeLimit)
  }

  /** [[edgeSupport]] over an ALREADY-canonical edge set: `canon` must
    * hold (a, b) with a < b, de-duplicated, and be cheap to re-scan
    * (cached or checkpointed — it feeds the stats agg, the triangle
    * stream and the zero-fill union). [[trussPeel]] rounds ≥ 2 feed
    * their checkpointed survivor set here directly: the survivor set
    * is canonical by construction, so the re-canonicalize `distinct`
    * the public entry would pay — a full edge-set exchange PER PEEL
    * ROUND — is skipped (round-15; plan evidence in
    * plans/r16/{before,after}/q163_truss_peel.txt). */
  private[graft] def edgeSupportCanon(canon: DataFrame,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L): DataFrame =
    edgeSupportCanonCounting(canon, None, broadcastNodeLimit,
      broadcastEdgeLimit, None)._1

  /** [[edgeSupportCanon]] with the peel loop's bookkeeping fused into
    * the support checkpoint job (round-16, VERDICT-r15 #4): when
    * `survivorMin` is set, the checkpoint OBSERVES the survivor count
    * (#edges with support ≥ survivorMin) AND the survivor set's whole
    * stats row — count, id bounds, HLL node upper bound, exactly what
    * the next round's regime decisions need — so [[trussPeel]] pays
    * neither a separate count job per round nor a full-pass stats agg
    * from round 2 on. `precomputedStats` is that observed row fed back
    * in; metrics are over the same value set the fresh agg would scan,
    * so regime decisions are identical.
    *
    * @return (support table, next-round stats row (m, lo, hi, nUpper)
    *         when survivorMin is set) */
  private[graft] def edgeSupportCanonCounting(canon: DataFrame,
      survivorMin: Option[Long],
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L,
      precomputedStats: Option[org.apache.spark.sql.Row] = None)
      : (DataFrame, Option[org.apache.spark.sql.Row]) = {
    val st = precomputedStats.getOrElse(
      canon.agg(count(lit(1)).as("m"),
        min(col("a")).as("lo"), max(col("b")).as("hi"),
        (approx_count_distinct(col("a")) + approx_count_distinct(col("b")))
          .as("nUpper")).first())
    val nEdges = st.getLong(0)
    if (nEdges == 0) {
      val out = canon.select(col("a"), col("b"), col("a").as("support"))
      canon.unpersist(blocking = false)
      return (out, Some(org.apache.spark.sql.Row(0L, 0L, 0L, 0L)))
    }
    val tm = orientedTriangleStream(canon.sparkSession, canon, st, nEdges,
      broadcastNodeLimit, broadcastEdgeLimit)
    // No join for the zero-fill: every canonical edge enters the SAME
    // partial agg with weight 0 alongside the triangle fan-out's 1s —
    // support is edge-sized, so a broadcast would be unbounded and a
    // shuffle join redundant with the aggregation's own exchange.
    val sup = tm.tris.select(explode(array(
        struct(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), lit(1L).as("s"))
    val unioned = canon.select(col("a"), col("b"), lit(0L).as("s"))
      .unionByName(sup)
      .groupBy("a", "b").agg(sum(col("s")).as("support"))
    val (out, nextStats) = survivorMin match {
      case Some(thr) =>
        val surv = col("support") >= thr
        val (cp, ms) = GraphTuning.checkpointObservingAll(unioned, Seq(
          "m" -> sum(when(surv, 1L)),
          "lo" -> min(when(surv, col("a"))),
          "hi" -> max(when(surv, col("b"))),
          "nUpper" -> (approx_count_distinct(when(surv, col("a"))) +
            approx_count_distinct(when(surv, col("b"))))))
        (cp, Some(org.apache.spark.sql.Row(
          ms("m"), ms("lo"), ms("hi"), ms("nUpper"))))
      case None => (unioned.localCheckpoint(true), None)
    }
    tm.cleanup.foreach(_.unpersist(blocking = false))
    canon.unpersist(blocking = false)
    (out, nextStats)
  }

  /** Bounded k-truss peel: up to `maxRounds` rounds of (recompute
    * [[edgeSupport]] → drop edges with support < k − 2). A true
    * k-truss iterates to fixpoint; the bounded version is the
    * monotone prefix of that computation (each round only removes
    * edges the final truss also removes), converging early when a
    * round drops nothing. Every round is one full support pass over
    * the SURVIVING edge set — the set only shrinks, and each pass
    * checkpoints so lineage stays flat across rounds.
    *
    * @return surviving canonical edges (a, b) after the peel */
  def trussPeel(edges: DataFrame, k: Int, maxRounds: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto,
      broadcastEdgeLimit: Long = 32000000L): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    // Round 1 canonicalizes the raw input; every later round's survivor
    // set is canonical BY CONSTRUCTION (a filter of round 1's canon
    // set) and goes straight to [[edgeSupportCanonCounting]] — the
    // public entry's re-canonicalize distinct would be a full edge-set
    // exchange per round. The survivor set stays a LAZY narrow filter
    // of the round's already-checkpointed support table; its count AND
    // the next round's stats row ride the support checkpoint job as
    // observed metrics (round-16), so each round is exactly the
    // support pass — no separate count job, and no full-pass stats agg
    // after round 1.
    val thr = (k - 2).toLong
    var cur: DataFrame = null
    var stats: Option[org.apache.spark.sql.Row] = None
    var round = 0
    var m = -1L
    var converged = false
    while (round < maxRounds && !converged) {
      round += 1
      val (sup, next) =
        if (round == 1) {
          val canon = edges.select(
              least(col("src"), col("dst")).cast("long").as("a"),
              greatest(col("src"), col("dst")).cast("long").as("b"))
            .filter(col("a") =!= col("b"))
            .distinct()
            .cache()
          edgeSupportCanonCounting(canon, Some(thr), broadcastNodeLimit,
            broadcastEdgeLimit, None)
        } else edgeSupportCanonCounting(cur, Some(thr), broadcastNodeLimit,
          broadcastEdgeLimit, stats)
      cur = sup.filter(col("support") >= thr).select("a", "b")
      val m2 = next.get.getLong(0)
      converged = m2 == m
      m = m2
      stats = next
    }
    cur
  }

  /** k-bounded FW-BW coloring — the partition-refinement step of
    * distributed SCC (Orzan's coloring / FW-BW family): `fwd_min(v)` =
    * min id v REACHES within k hops, `bwd_min(v)` = min id that
    * REACHES v within k hops, and `scc_id = fwd_min` exactly when the
    * two agree. Soundness is unconditional: fwd_min(v) = bwd_min(v) =
    * c means v reaches c and c reaches v, so v truly lies in c's SCC —
    * the k-bound only limits how far the certificate looks (the same
    * bounded-round contract as [[bfsDistances]]/[[ssspDistances]]).
    *
    * The two reachability passes FUSE into one delta-frontier
    * min-label loop over a tagged edge table (tag 0 = forward edges,
    * tag 1 = reversed), so each round is one candidate join + one
    * best-table rewrite for BOTH directions — half the jobs and one
    * shared (tag, dst)-partitioned cache instead of two independent
    * loops. Labels only decrease, only improved nodes re-enter the
    * frontier, the best table rewrites by replacement (anti-join +
    * union, never re-aggregated), and the frontier side broadcasts
    * below the [[GraphTuning]]-resolved limit; above it the same loop
    * runs on plain shuffle joins aligned to the cached edge
    * partitioning.
    *
    * Regime evidence (round-10 `scc` crossover family, q131-shape
    * directed bipartite, maxRounds=3): honest shuffle beats
    * force-broadcast at 1.18M nodes (4.47 s vs 7.16) and at 4.42M
    * nodes (14.01 vs 25.06) — the doubled (2 rows/node) state makes
    * broadcast pay off only on small graphs, and the default 2M limit
    * applied to the doubled estimate routes all measured sizes to the
    * shuffle regime, confirmed right (CROSSOVER.json `sccColoring`;
    * the one discordant 2.2M-node honest cell is recorded there as
    * contended).
    *
    * @return (id, fwd_min, bwd_min, scc_id nullable) */
  def sccColoring(edges: DataFrame, maxRounds: Int,
      broadcastNodeLimit: Long = GraphTuning.Auto): DataFrame = {
    require(maxRounds >= 0, "maxRounds must be >= 0")
    val spark = edges.sparkSession
    val edgeUpper = GraphTuning.rowUpperBound(edges)
    val (limit, _) = GraphTuning.resolveNodeLimit(spark, broadcastNodeLimit)
    val (nodeEst, nodeSrc) = edgeUpper match {
      case Some((u, s)) if 2 * u <= limit => (2 * u, s)
      // Estimate what actually broadcasts: the best table holds 2 rows
      // per node of src∪dst (the tagged/doubled edge set makes every
      // node a src). Counting only the ORIGINAL srcs under-estimates a
      // hub-and-spokes graph by ~n and would wrongly license broadcast.
      case _ => (2 * edges.select(col("src").cast("long").as("id"))
        .unionByName(edges.select(col("dst").cast("long").as("id")))
        .agg(approx_count_distinct(col("id")).as("n"))
        .first().getLong(0), "hll")
    }
    val d = GraphTuning.decide(spark, "sccColoring", nodeEst, nodeSrc,
      edgeEstimate = edgeUpper.map(2 * _._1).getOrElse(-1L),
      requestedLimit = broadcastNodeLimit)
    def maybeB(df: DataFrame): DataFrame = if (d.broadcast) broadcast(df) else df
    val base = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = base.select(lit(0).as("tag"), col("src"), col("dst"))
      .unionByName(base.select(lit(1).as("tag"),
        col("dst").as("src"), col("src").as("dst")))
      .repartition(col("tag"), col("dst")).cache()
    // the initial frontier is the full tagged node set — its count is
    // observed in the same checkpoint job (round-15 fusion); per round
    // the improved-row count rides the joined checkpoint, so the old
    // per-round frontier isEmpty job is gone
    var (best, nFrontier) = GraphTuning.checkpointWithCount(
      e.select(col("tag"), col("src").as("id"))
        .unionByName(e.select(col("tag"), col("dst").as("id")))
        .distinct().select(col("tag"), col("id"), col("id").as("lbl")))
    var frontier = best
    var round = 0
    while (round < maxRounds && nFrontier > 0) {
      round += 1
      val cand = e
        .join(maybeB(frontier.select(col("tag"), col("id").as("dst"),
          col("lbl").as("fl"))), Seq("tag", "dst"))
        .groupBy(col("tag"), col("src").as("id"))
        .agg(min(col("fl")).as("cnd"))
      // ONE materialization carries both outputs of the round: the
      // rewritten best table and (via the `imp` flag) the frontier.
      val (joined, nImp) = GraphTuning.checkpointObserving(
        best.join(maybeB(cand), Seq("tag", "id"), "left_outer")
          .select(col("tag"), col("id"),
            when(col("cnd") < col("lbl"), col("cnd"))
              .otherwise(col("lbl")).as("lbl"),
            (col("cnd") < col("lbl")).as("imp")),
        sum(when(col("imp"), 1L).otherwise(0L)))
      best = joined.select("tag", "id", "lbl")
      frontier = joined.filter(col("imp")).select("tag", "id", "lbl")
      nFrontier = nImp
    }
    e.unpersist(blocking = false)
    best.groupBy("id").agg(
        min(when(col("tag") === 0, col("lbl"))).as("fwd_min"),
        min(when(col("tag") === 1, col("lbl"))).as("bwd_min"))
      .select(col("id"), col("fwd_min"), col("bwd_min"),
        when(col("fwd_min") === col("bwd_min"), col("fwd_min")).as("scc_id"))
  }
}
