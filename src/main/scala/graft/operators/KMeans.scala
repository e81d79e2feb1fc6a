package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means clustering over embedding columns — the
  * semantic-clustering primitive a training-data pipeline uses for
  * data mixing, cluster-balanced sampling, and semantic dedup at the
  * cluster level (reference analog: the corpus-bucketing stage of its
  * enrichment flows, e.g. dataengineering/clickhouse/v1/utils.py
  * query templating over labeled groups).
  *
  * Classic Lloyd is float-mean iteration — irreproducible across
  * engines (summation order changes the means). This variant runs the
  * WHOLE loop in integer space: vectors quantize once to a fixed-point
  * grid (`floor(x·scale + 0.5)`, exact in IEEE doubles for float32
  * inputs), distances are exact integer squared-L2, and the centroid
  * update rounds the per-dimension mean back onto the grid
  * (`floor(sum/n + 0.5)` — sums ≪ 2⁵³, so the double division is
  * exact-input and its floor is engine-independent). Every round is
  * therefore bit-reproducible in any engine with 64-bit integers,
  * which is what puts a multi-round Lloyd under a SQL oracle at all
  * (q43's IVF had to ship with `lloydIterations = 0` for that).
  *
  * Scale shape (the IVF/PQ codebook discipline, `Ann.ivfTopK`): the
  * corpus never shuffles — assignment is a map against the k·dim
  * centroid literals baked into the plan; each round's update is ONE
  * partial-agg shuffle of (cluster, dim, sum, n) — k·dim rows after
  * map-side combine — and the driver collect is bounded by k·dim
  * (the licensed codebook-sized pattern). At 100 TB you train on a
  * sample and apply `assign` to the full corpus as a pure map.
  */
object KMeans {

  /** Quantize a float-array column onto the integer grid. */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  private def dist2(v: Column, cent: Seq[Long]): Column =
    aggregate(
      zip_with(v, typedLit(cent), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** (vec_id, cluster, dist2) after `rounds` integer Lloyd rounds.
    *
    * Init = the k lowest-id vectors (oracle-reproducible, like
    * `Ann.ivfTopK(initById = true)`); assignment ties break toward the
    * lower cluster index (struct min = lexicographic (d2, i)); a
    * cluster that loses all members keeps its previous centroid.
    */
  /** Final centroid array after `rounds` integer Lloyd rounds over the
    * quantized frame `q` (columns `id`, `v`) — the shared trainer
    * behind [[integerLloydAssign]] and [[simplifiedSilhouette]]. */
  private def trainCentroids(q: DataFrame, k: Int,
      rounds: Int): Array[Seq[Long]] = {
    var centroids: Array[Seq[Long]] = q.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Long](0))
    def nearest(v: Column): Column = {
      val scored = centroids.zipWithIndex.map { case (cent, i) =>
        struct(dist2(v, cent).as("d"), lit(i).as("i"))
      }
      array_min(array(scored: _*))
    }
    var round = 0
    while (round < rounds - 1) {
      val assigned = q.withColumn("cell", nearest(col("v")).getField("i"))
      val means = assigned.select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos")
        .agg(floor(sum(col("col")).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("c"))
        .collect()
      means.foreach(r => centroids =
        centroids.updated(r.getAs[Int]("cell"), r.getSeq[Long](1)))
      round += 1
    }
    centroids
  }

  def integerLloydAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int = 2, scale: Int = 1000): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1 (got $k, $rounds)")
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol), scale).as("v"))
      .cache()
    val centroids = trainCentroids(q, k, rounds)
    val scored = centroids.zipWithIndex.map { case (cent, i) =>
      struct(dist2(col("v"), cent).as("d"), lit(i).as("i"))
    }
    q.withColumn("best", array_min(array(scored: _*)))
      .select(col("id").as(idCol),
        col("best").getField("i").cast("long").as("cluster"),
        col("best").getField("d").as("dist2"))
  }

  /** Per-cluster simplified (centroid-distance) silhouette — the
    * clustering-quality gate next to [[integerLloydAssign]]: for each
    * vector, a = d² to its own (nearest) centroid, b = min d² to any
    * OTHER centroid, s = (b − a)/max(a, b) ∈ [0, 1] in integer ppm
    * (the full silhouette's point-to-point distances are O(n²); the
    * centroid form is the standard large-scale surrogate and shares
    * its [0-bad, 1-good] reading). Reported per cluster: member count
    * and mean s ppm — a cluster whose mean is near 0 is not separated
    * from its neighbor and should be merged or re-k'd.
    *
    * Scale shape: identical to assignment — one map against the k·dim
    * centroid literals (a and b both come from the same per-row
    * distance array, no second pass, no shuffle beyond the k-row
    * rollup). Degenerate max(a,b) = 0 (a point equal to two identical
    * centroids) reads s = 0.
    *
    * @return (cluster, n, avg_sil_ppm) */
  def simplifiedSilhouette(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int = 2, scale: Int = 1000): DataFrame = {
    require(k >= 2 && rounds >= 1, s"need k >= 2, rounds >= 1 (got $k, $rounds)")
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol), scale).as("v"))
      .cache()
    val centroids = trainCentroids(q, k, rounds)
    val ds = centroids.zipWithIndex.map { case (cent, i) =>
      struct(dist2(col("v"), cent).as("d"), lit(i).as("i"))
    }
    q.withColumn("ds", array(ds: _*))
      .withColumn("best", array_min(col("ds")))
      .withColumn("a", col("best").getField("d"))
      .withColumn("cluster", col("best").getField("i").cast("long"))
      .withColumn("b", array_min(expr(
        "filter(ds, s -> s.i != best.i)")).getField("d"))
      .withColumn("sp", when(greatest(col("a"), col("b")) === 0L, 0L)
        .otherwise(expr("((b - a) * 1000000) div greatest(a, b)")))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        expr("sum(sp) div count(1)").as("avg_sil_ppm"))
  }
}
