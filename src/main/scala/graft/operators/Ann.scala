package graft.operators

import graft.expressions.VectorExpressions.{cosineF, hyperplaneBucket}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, one narrow map stage + per-query top-k via
  *    window. The corpus is never shuffled; at 100 TB this is a single
  *    scan. Correct baseline for recall measurement.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed
  *    by packed sign bits; candidates = bucket collisions (multi-probe via
  *    several independent tables), then exact re-rank within candidates.
  *    Shuffles only (bucket, id) pairs; the standard recall/cost dial is
  *    (nBits, nTables).
  */
object Ann {

  /** Exact top-k neighbors for each query vector. Queries must be small
    * enough to broadcast (the usual case: a probe set). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosineF(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** IVF (inverted-file) ANN: k-means-style coarse quantizer, corpus
    * partitioned by nearest centroid, queries probe only the `nProbe`
    * closest cells, exact cosine re-rank within the probed cells.
    *
    * Centroids are trained with a few Lloyd iterations directly in
    * DataFrame algebra (assign = argmax cosine against the broadcast
    * centroid array; update = element-wise mean via posexplode +
    * two-level agg). At 100 TB you train on a sample and keep the
    * centroid table as a tiny broadcast dimension — the corpus-side
    * assignment is one narrow map + one shuffle by cell id, and queries
    * touch nProbe/nCentroids of the data.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, lloydIterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initById: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v")).cache()

    // deterministic init: the nCentroids rows with smallest hash(id) for
    // a spread sample, or smallest id (`initById`) for the sampled-coarse-
    // quantizer variant that a SQL oracle can reproduce (with
    // lloydIterations = 0 the whole operator is engine-independent).
    var centroids: Array[Seq[Float]] = c
      .orderBy(if (initById) col("id") else hash(col("id")), col("id"))
      .limit(nCentroids)
      .select("v").collect().map(_.getSeq[Float](0))

    def nearestCell(v: Column): Column = {
      val scored = centroids.zipWithIndex.map { case (cent, i) =>
        struct(cosineF(v, typedLit(cent)).as("s"), lit(i).as("i"))
      }
      array_max(array(scored: _*)).getField("i")
    }

    var iter = 0
    while (iter < lloydIterations) {
      val assigned = c.withColumn("cell", nearestCell(col("v")))
      val means = assigned
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          transform(col("pm"), p => p.getField("m").cast("float")).as("centroid"))
        .collect()
      means.foreach(r => centroids = centroids.updated(
        r.getAs[Int]("cell"), r.getSeq[Float](1)))
      iter += 1
    }

    val cells = c.withColumn("cell", nearestCell(col("v")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("probe", {
        val scored = centroids.zipWithIndex.map { case (cent, i) =>
          struct(cosineF(col("q_vec"), typedLit(cent)).as("s"), lit(i).as("i"))
        }
        slice(reverse(array_sort(array(scored: _*))), 1, nProbe)
      })
      .select(col("query_id"), col("q_vec"),
        explode(col("probe").getField("i")).as("cell"))
    val cand = cells.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", cosineF(col("q_vec"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"), col("sim"))
  }

  /** LSH-bucketed ANN: hyperplane signatures with `nTables` independent
    * tables; exact cosine re-rank over the union of bucket collisions. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 12, nTables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      portableHash: Boolean = false): DataFrame = {
    // all tables' bucket keys in one fused pass, one corpus scan;
    // `portableHash` switches to md5-seeded Rademacher hyperplanes so the
    // bucketing (and thus the candidate set) is reproducible in any
    // engine with md5 — the oracle-checkable family.
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(
            if (portableHash)
              graft.expressions.VectorExpressions
                .rademacherBuckets(col(vecCol), nBits, nTables)
            else
              graft.expressions.VectorExpressions
                .hyperplaneBuckets(col(vecCol), nBits, nTables, 7919)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val c = bucketed(corpus, "neighbor_id", "c_vec")
    val q = bucketed(queries, "query_id", "q_vec")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosineF(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
