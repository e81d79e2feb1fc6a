package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral embedding analytics — the dominant principal direction of
  * the corpus Gram matrix (Aᵀ·A, A = row-per-vector) by fixed-point
  * power iteration, and the deflated SECOND direction (the top-2 drift
  * plane). The leading directions are the workhorse for
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
  * The deflated pass runs its sums in DECIMAL(38,0) outright (residual
  * magnitudes carry the v₁ Gram factor), pushing its bound to ~1e13
  * rows at the defaults.
  *
  * Scale shape per round: one (vid)-keyed agg for the forward matvec
  * (u = A·v, broadcast of the d-row iterate into the scan), one
  * (pos)-keyed agg for the transpose matvec (w = Aᵀ·u', d-row output),
  * two single-row max-abs aggregates. The quantized triple store
  * (vid, pos, qx) is cached once; nothing wider than the corpus ever
  * shuffles, and the iterate state is d rows.
  */
object Spectral {

  private def quantize(embeddings: DataFrame, idCol: String,
      vecCol: String, quantScale: Long): DataFrame =
    embeddings.select(col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vid"), col("pos"),
        floor(col("x").cast("double") * quantScale + 0.5).cast("long")
          .as("qx"))

  /** Eager checkpoint of a half-matvec with its max-abs OBSERVED
    * during the materialization job (`Dataset.observe`, the round-15
    * loop-action fusion — see [[GraphTuning.checkpointWithCount]]):
    * the old loop paid a separate max-abs aggregate job per
    * half-matvec on top of the checkpoint job. Fails loudly on an
    * all-zero iterate exactly as the separate agg did. */
  private def checkpointMaxAbs(df: DataFrame,
      colName: String): (DataFrame, Any) = {
    val obs = org.apache.spark.sql.Observation()
    val out = df.observe(obs, max(abs(col(colName))).as("m"))
      .localCheckpoint(true)
    val m = obs.get.get("m").orNull
    require(m != null && java.math.BigDecimal.valueOf(0)
      .compareTo(new java.math.BigDecimal(m.toString)) < 0,
      "power iteration hit an all-zero iterate")
    (out, m)
  }

  /** The fixed-point loop over a (vid, pos, qx) triple frame. With
    * `decimalSums` the matvec aggregates run in DECIMAL(38,0) (for the
    * deflated pass, whose triples carry the v₁ Gram factor); the
    * returned iterate components are BIGINT either way.
    *
    * Round shape (round-15): TWO jobs per round — the u and w
    * half-matvec checkpoints, each with its max-abs observed in the
    * materialization job. The normalized iterates (`un`, and `v`
    * itself) are LAZY narrow projections over the checkpointed
    * half-matvecs: d-row (or corpus-row) maps whose re-evaluation per
    * use costs nothing, where the old loop materialized v with a
    * third checkpoint job per round and paid two more max-abs agg
    * jobs. */
  private def powerLoop(q: DataFrame, rounds: Int, normScale: Long,
      decimalSums: Boolean): DataFrame = {
    val acc = if (decimalSums) "CAST(qx AS DECIMAL(38,0))" else "qx"
    var v = q.select("pos").distinct()
      .select(col("pos"), lit(normScale).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val (u, mu) = checkpointMaxAbs(
        q.join(broadcast(v), Seq("pos"))
          .groupBy("vid").agg(sum(expr(s"$acc * v")).as("u")), "u")
      val un = u.select(col("vid"),
        expr(s"CAST((CAST(u AS DECIMAL(38,0)) * $normScale) div " +
          s"CAST('$mu' AS DECIMAL(38,0)) AS BIGINT)").as("un"))
      val (w, mw) = checkpointMaxAbs(
        q.join(un, Seq("vid"))
          .groupBy("pos").agg(sum(expr(s"$acc * un")).as("w")), "w")
      v = w.select(col("pos"),
        expr(s"CAST((CAST(w AS DECIMAL(38,0)) * $normScale) div " +
          s"CAST('$mw' AS DECIMAL(38,0)) AS BIGINT)").as("v"))
    }
    v
  }

  /** @param rounds full power-iteration rounds (v ← norm(Aᵀ norm(A v)))
    * @return (pos, v) — the direction after `rounds` rounds, 0-based
    *         component index, max-abs component = `normScale` */
  def dominantDirection(embeddings: DataFrame, idCol: String,
      vecCol: String, rounds: Int, quantScale: Long = 10000L,
      normScale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(quantScale >= 1 && normScale >= 1, "scales must be >= 1")
    val q = quantize(embeddings, idCol, vecCol, quantScale).cache()
    val v = powerLoop(q, rounds, normScale, decimalSums = false)
    q.unpersist(blocking = false)
    v
  }

  /** Second principal direction by exact integer deflation: remove
    * each row's v₁ component in the v₁-Gram-scaled residual
    * qr = qx·g − p·v₁(pos) (g = Σ v₁², p = ⟨qx, v₁⟩ per row — both
    * exact integers, so the residual is EXACTLY v₁-orthogonal up to
    * quantization, no truncating division enters the deflation
    * itself), then power-iterate the residual triples with
    * DECIMAL(38,0) matvec sums. The (v₁, v₂) pair is the drift PLANE:
    * one direction flags scale drift, two separate rotation from
    * translation. Two extra exchanges over [[dominantDirection]]: the
    * d-row projection agg (vid-keyed) and the residual build — the
    * corpus triples shuffle no more than the single-direction pass.
    *
    * @return (pos, v1, v2) — both max-abs-normalized to `normScale` */
  def deflatedDirections(embeddings: DataFrame, idCol: String,
      vecCol: String, rounds: Int, quantScale: Long = 10000L,
      normScale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(quantScale >= 1 && normScale >= 1, "scales must be >= 1")
    val q = quantize(embeddings, idCol, vecCol, quantScale).cache()
    val v1 = powerLoop(q, rounds, normScale, decimalSums = false)
    val g = v1.agg(sum(col("v") * col("v"))).first().getLong(0)
    val p = q.join(broadcast(v1), Seq("pos"))
      .groupBy("vid").agg(sum(col("qx") * col("v")).as("p"))
    val resid = q.join(p, Seq("vid"))
      .join(broadcast(v1), Seq("pos"))
      .select(col("vid"), col("pos"),
        expr(s"CAST(qx AS DECIMAL(38,0)) * $g - CAST(p AS DECIMAL(38,0)) * v")
          .as("qx"))
      .cache()
    val v2 = powerLoop(resid, rounds, normScale, decimalSums = true)
    resid.unpersist(blocking = false)
    q.unpersist(blocking = false)
    v1.withColumnRenamed("v", "v1")
      .join(v2.withColumnRenamed("v", "v2"), Seq("pos"))
      .orderBy("pos")
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
