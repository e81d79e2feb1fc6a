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
  * Scale shape: per iteration one join edges⋈ranks (shuffle on src — or
  * zero shuffle if edges and ranks are co-bucketed by src, see
  * io/Bucketing) + one groupBy(dst) partial/final agg. localCheckpoint
  * per iteration keeps the plan flat (same discipline as the CC loop).
  * At 1e9+ nodes switch the accumulator to DECIMAL(38,0): the long
  * accumulator holds while n·scale·damping < 2⁶³ (n ≲ 1e10).
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
    // cache, not eager checkpoint: every iteration re-reads the edge
    // list, but the first materialization can fold into iteration 1
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .cache()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).cache()
    val nodes =
      (if (symmetric) deg.select("id")
       else e.select(col("src").as("id"))
         .unionByName(e.select(col("dst").as("id"))).distinct()).cache()
    // Adaptive plan, same idea as the CC edge threshold: the rank/degree
    // tables are node-sized; below the limit broadcast them so the edge
    // table NEVER shuffles (each iteration = map-side joins + one
    // groupBy(dst) with map-side partial agg). Above it, fall back to
    // shuffle joins — there, co-bucketing edges and ranks by src
    // (io/Bucketing) is the cluster-scale answer. Checkpointed loop
    // tables lose stats, so AQE cannot make this call on its own.
    val small = nodes.count() <= broadcastNodeLimit
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val base = scale - dampingScaled
    var ranks = nodes.withColumn("rank", lit(scale)).localCheckpoint(true)
    var it = 0
    while (it < iterations) {
      val contribs = e
        .join(maybeB(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .join(maybeB(deg.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(maybeB(contribs), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampingScaled * coalesce(s, CAST(0 AS BIGINT))) div $scale"))
            .as("rank"))
        .localCheckpoint(true)
      it += 1
    }
    // final ranks are checkpointed (no lineage into the caches) — release
    // the working tables so repeated invocations don't leak storage
    nodes.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    e.unpersist(blocking = false)
    ranks
  }
}
