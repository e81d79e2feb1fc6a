package graft

import graft.operators.Ann
import graft.sources.Tables
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k returns known nearest neighbors on a toy grid") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Array(-1.0f, 0.0f)))  // opposite to 0
      .toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), k = 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))     // similarity order
    assert(out(0)._4 > 0.99)
  }

  test("LSH ANN achieves reasonable recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(e, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // these embeddings are near-random (top-10 cosine ≈ 0.25-0.39), the
    // hardest case for hyperplane LSH: measured recall ≈ 0.94 at 4×16
    val approx = Ann.lshTopK(e, q, k = 10, nBits = 4, nTables = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("PQ ANN: codes in range, Lloyd refinement helps, recall reasonable") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(e, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (k, s) => (s & got.getOrElse(k, Set())).size }.sum
        .toDouble / exact.values.map(_.size).sum
    }
    // near-random 64-dim embeddings are PQ's hardest case: pure ADC at
    // 8×16 books measures ≈0.16 recall@10 here. The production dial is
    // exact re-rank of the top n·k ADC candidates — measure both.
    val adc = recallOf(Ann.pqTopK(e, q, 10, lloydIterations = 1))
    val rr = recallOf(Ann.pqTopK(e, q, 10, lloydIterations = 1,
      rerankFactor = 8))
    assert(adc >= 0.05, s"ADC recall collapsed: $adc")
    assert(rr >= 0.5, s"re-ranked PQ recall too low: $rr")
    assert(rr >= adc, s"re-rank should not hurt: $rr < $adc")
  }

  test("PQ ANN is deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 3)
    val a = Ann.pqTopK(e.repartition(1), q, 5, initById = true)
      .as[(Long, Long, Int)].collect().toSet
    val b = Ann.pqTopK(e.repartition(13), q, 5, initById = true)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
  test("cellKnnLabelConsistency: mislabeled point surfaces as suspect") {
    // one cell (nCentroids=1), k=1: v0<->v1 agree (label 0); v3 is
    // v2's nearest but carries label 0 while v2 has 1 -> both suspect
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.14f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.14f, 0.99f), 0)) // mislabeled
      .toDF("vec_id", "embedding", "label")
    val got = Ann.cellKnnLabelConsistency(vecs, k = 1, nCentroids = 1)
      .orderBy("label").as[(Long, Long, Long, Long)].collect().toSeq
    // label 0: {v0 agree, v1 agree, v3 disagree} -> avg 666666, 1 suspect
    // label 1: {v2 disagree} -> 0 ppm, 1 suspect
    assert(got == Seq((0L, 3L, 666666L, 1L), (1L, 1L, 0L, 1L)), s"got $got")
  }

}
