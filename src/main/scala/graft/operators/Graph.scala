package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Two physical regimes, picked by node count (checkpointed loop tables
  * lose stats, so AQE cannot make this call on its own):
  *
  *  - '''node state fits the driver''' (≤ `broadcastNodeLimit`, the same
  *    bound that would let Spark broadcast the rank table): pregel-lite.
  *    Ranks live in a driver array; each round ships the node-sized
  *    (src → contribution) table to executors as a broadcast
  *    LocalRelation (no collect job — the data is already local) and
  *    runs ONE distributed job: edge join + map-side-combined sum by
  *    dst. The edge table never moves after its single repartition; the
  *    per-round rank update is O(nodes) driver arithmetic.
  *  - '''big graphs''': fully distributed loop — per round one shuffle
  *    join edges⋈contrib on src (zero shuffle if edges and ranks are
  *    co-bucketed by src, see io/Bucketing) + one groupBy(dst)
  *    partial/final agg, localCheckpoint per round to keep the plan flat
  *    (same discipline as the CC loop). At 1e9+ nodes switch the
  *    accumulator to DECIMAL(38,0): the long accumulator holds while
  *    n·scale·damping < 2⁶³ (n ≲ 1e10).
  *
  * Degree is loop-invariant and NODE-sized: `groupBy(src).count()` gets
  * it with map-side combine — shuffle bytes are O(nodes). (A window
  * `count over partitionBy(src)` realization was measured and rejected:
  * it shuffles the FULL edge table by src just to attach a column that
  * is then shuffled again by dst.)
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
      broadcastNodeLimit: Long = 2000000L,
      symmetric: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Partitioned by dst ONCE: every round's groupBy(dst) agg is
    // exchange-free; the edge bytes never move again.
    val ew = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("dst")).cache()
    val deg = ew.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg")).cache()
    def allNodes: DataFrame =
      if (symmetric) deg.select("id")
      else deg.select("id")
        .unionByName(ew.select(col("dst").as("id"))).distinct()
    val nodes = if (symmetric) None else Some(allNodes.cache())
    // deg.count() is exact AND materializes the degree cache in the same
    // job (symmetric ⇒ every node is a src, so |deg| = |nodes|).
    val nNodes = nodes.map(_.count()).getOrElse(deg.count())
    val base = scale - dampingScaled
    var checkpointResult = true

    val result: DataFrame = if (iterations <= 0) {
      allNodes.withColumn("rank", lit(scale))
    } else if (nNodes <= broadcastNodeLimit) {
      // ---- pregel-lite: driver-resident node state, 1 job per round.
      val degLocal = deg.as[(Long, Long)].collect()
      val nodeIds: Array[Long] =
        nodes.map(_.select("id").as[Long].collect()).getOrElse(degLocal.map(_._1))
      var rank = new scala.collection.mutable.LongMap[Long](nodeIds.length * 2)
      nodeIds.foreach(rank.update(_, scale))
      var it = 0
      while (it < iterations) {
        it += 1
        val contrib = degLocal.map { case (id, d) => (id, rank(id) / d) }
        val sums = ew.join(broadcast(contrib.toSeq.toDF("src", "c")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(sum(col("c")).as("s"))
          .as[(Long, Long)].collect()
        val next = new scala.collection.mutable.LongMap[Long](nodeIds.length * 2)
        nodeIds.foreach(next.update(_, base)) // no in-edges ⇒ base rank
        sums.foreach { case (id, s) =>
          next.update(id, base + Math.floorDiv(dampingScaled * s, scale))
        }
        rank = next
      }
      // a LocalRelation — no lineage into the caches, so no checkpoint
      // needed before releasing them
      checkpointResult = false
      nodeIds.map(id => (id, rank(id))).toSeq.toDF("id", "rank")
    } else {
      // ---- fully distributed loop for node sets beyond driver memory.
      def damped(sums: DataFrame): DataFrame = {
        // symmetric ⇒ every node has an in-edge ⇒ the contribution sums
        // already cover the whole node set — skip the nodes left-join
        val withBase = nodes match {
          case Some(n) => n.join(sums, Seq("id"), "left")
          case None    => sums
        }
        // Per-round eager checkpoint: keeps the plan flat (AQE re-plans
        // a small fresh tree each round instead of a growing nest of
        // join subqueries) and releases the previous round's shuffle.
        withBase.select(col("id"),
          (lit(base) + expr(s"($dampingScaled * coalesce(s, CAST(0 AS BIGINT))) div $scale"))
            .as("rank"))
          .localCheckpoint(true)
      }
      def propagate(contrib: DataFrame): DataFrame =
        damped(ew.join(contrib, Seq("src"))
          .select(col("dst").as("id"), col("c"))
          .groupBy("id").agg(sum(col("c")).as("s")))
      var ranks = propagate( // round 1 propagates the flat rank — no ranks join
        deg.select(col("id").as("src"), expr(s"$scale div deg").as("c")))
      var it = 1
      while (it < iterations) {
        it += 1
        ranks = propagate(ranks.join(deg, Seq("id"))
          .select(col("id").as("src"), expr("rank div deg").as("c")))
      }
      checkpointResult = false // the last damped() already checkpointed
      ranks
    }
    // pin the result before releasing the working tables it derives from
    val out = if (checkpointResult) result.localCheckpoint(true) else result
    nodes.foreach(_.unpersist(blocking = false))
    deg.unpersist(blocking = false)
    ew.unpersist(blocking = false)
    out
  }
}
