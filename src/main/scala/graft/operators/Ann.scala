package graft.operators

import graft.expressions.VectorExpressions.{cosineF, hyperplaneBucket}
import org.apache.spark.sql.DataFrame
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

  /** LSH-bucketed ANN: hyperplane signatures with `nTables` independent
    * tables; exact cosine re-rank over the union of bucket collisions. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 12, nTables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // each table uses an independent hyperplane family (distinct seed)
    def bucketed(df: DataFrame, id: String, vec: String) =
      (0 until nTables).map { t =>
        df.select(col(idCol).as(id), col(vecCol).as(vec))
          .withColumn("table", lit(t))
          .withColumn("bucket", hyperplaneBucket(col(vec), nBits, 7919 + t))
      }.reduce(_ unionByName _)
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
