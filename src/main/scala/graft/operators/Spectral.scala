package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral embedding analytics — the dominant principal direction of
  * the corpus Gram matrix (Aᵀ·A, A = row-per-vector) by fixed-point
  * power iteration. The leading direction is the workhorse for
  * embedding-drift monitoring, whitening and 1-bit semantic hashing;
  * at corpus scale the only tractable route is exactly this matvec
  * pair, never an explicit d×d eigensolve of materialized floats.
  * (Reference analog: embedding-space analytics staging,
  * dataengineering/clickhouse/v1/utils.py:214-266.)
  *
  * All-integer arithmetic (the [[KMeans]] discipline): components
  * quantize to `quantScale`-ths at the scan, the iterate re-normalizes
  * to max-abs = `normScale` after every half-matvec with truncating
  * integer division (Spark `div` and DuckDB `//` both truncate toward
  * zero — measured, not assumed), so every round is bit-reproducible
  * across engines, partitionings and reruns. Overflow headroom: the
  * renormalization multiply routes through DECIMAL(38,0) (DuckDB runs
  * the same product in HUGEINT — both truncate toward zero, so parity
  * holds while neither side can wrap 64 bits), leaving the matvec sum
  * |Σ qx·u'| ≤ quantScale·normScale·rows as the only 64-bit bound —
  * safe through ~9e8 rows at the defaults; drop `normScale` for more.
  *
  * Scale shape per round: one (vid)-keyed agg for the forward matvec
  * (u = A·v, broadcast of the d-row iterate into the scan), one
  * (pos)-keyed agg for the transpose matvec (w = Aᵀ·u', d-row output),
  * two single-row max-abs aggregates. The quantized triple store
  * (vid, pos, qx) is cached once; nothing wider than the corpus ever
  * shuffles, and the iterate state is d rows.
  */
object Spectral {

  /** @param rounds full power-iteration rounds (v ← norm(Aᵀ norm(A v)))
    * @return (pos, v) — the direction after `rounds` rounds, 0-based
    *         component index, max-abs component = `normScale` */
  def dominantDirection(embeddings: DataFrame, idCol: String,
      vecCol: String, rounds: Int, quantScale: Long = 10000L,
      normScale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(quantScale >= 1 && normScale >= 1, "scales must be >= 1")
    val q = embeddings.select(col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vid"), col("pos"),
        floor(col("x").cast("double") * quantScale + 0.5).cast("long")
          .as("qx"))
      .cache()
    var v = q.select("pos").distinct()
      .select(col("pos"), lit(normScale).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val u = q.join(broadcast(v), Seq("pos"))
        .groupBy("vid").agg(sum(col("qx") * col("v")).as("u"))
        .localCheckpoint(true)
      val mu = u.agg(max(abs(col("u")))).first().getLong(0)
      require(mu > 0, "power iteration hit an all-zero iterate")
      val un = u.select(col("vid"),
        expr(s"(CAST(u AS DECIMAL(38,0)) * $normScale) div $mu").as("un"))
      val w = q.join(un, Seq("vid"))
        .groupBy("pos").agg(sum(col("qx") * col("un")).as("w"))
        .localCheckpoint(true)
      val mw = w.agg(max(abs(col("w")))).first().getLong(0)
      require(mw > 0, "power iteration hit an all-zero iterate")
      v = w.select(col("pos"),
        expr(s"(CAST(w AS DECIMAL(38,0)) * $normScale) div $mw").as("v"))
        .localCheckpoint(true)
    }
    q.unpersist(blocking = false)
    v
  }

  /** Per-label mean projection onto the [[dominantDirection]] — the
    * embedding-drift monitor: when a label's (class's, source's,
    * epoch's) mass shifts along the corpus's leading direction, its
    * mean projection moves. Same integer fixed-point discipline; the
    * projection is one broadcast join of the d-row direction into the
    * scan + a label-keyed agg, so the corpus is read once past the
    * iteration itself.
    *
    * @return (label, n, mean_proj) — mean in qx·v units, floor div */
  def labelProjections(embeddings: DataFrame, idCol: String,
      vecCol: String, labelCol: String, rounds: Int,
      quantScale: Long = 10000L, normScale: Long = 1000000L): DataFrame = {
    val v = dominantDirection(embeddings, idCol, vecCol, rounds,
      quantScale, normScale)
    val proj = embeddings.select(col(idCol).as("vid"),
        col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vid"), col("label"), col("pos"),
        floor(col("x").cast("double") * quantScale + 0.5).cast("long")
          .as("qx"))
      .join(broadcast(v), Seq("pos"))
      .groupBy("vid", "label").agg(sum(col("qx") * col("v")).as("proj"))
    proj.groupBy("label")
      .agg(count(lit(1)).as("n"),
        expr("sum(proj) div count(1)").as("mean_proj"))
  }
}
