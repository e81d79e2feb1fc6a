package graft

import graft.operators.{Dedup, Sketch}
import graft.sources.Tables
import org.apache.spark.sql.Row

/** The whole custom-expression layer must be reachable from `spark.sql`
  * (round-5 verdict task #5): these tests rebuild the q104 (KMV) and
  * q115 (containment) DataFrame shapes purely in SQL via the
  * GraftExtensions registrations and assert row-for-row equality with
  * the operator API. */
class SqlSurfaceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("q104 KMV shape in pure SQL: md5_uniform32 + topk_pairs") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_sql")
    val sql = spark.sql(
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag, md5_uniform32(l_partkey) AS h
        |  FROM li_sql WHERE l_partkey IS NOT NULL),
        |s AS (
        |  SELECT l_returnflag,
        |    topk_pairs(-CAST(h AS DOUBLE), h, 256) AS mins,
        |    count(1) AS ndv
        |  FROM h GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CASE WHEN ndv < 256 THEN ndv
        |       ELSE (255L * 4294967296L) div element_at(mins, 256).id
        |  END AS est_ndv,
        |  ndv AS exact_ndv
        |FROM s ORDER BY l_returnflag""".stripMargin)
    val api = Sketch.kmvDistinct(Tables.lineitem(spark, sfDir), "l_partkey",
      Seq("l_returnflag"), k = 256).orderBy("l_returnflag")
    assert(rows(sql) == rows(api))
    assert(rows(sql).nonEmpty)
  }

  test("HLL register construction in pure SQL matches Sketch.hllRegisters") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_sql")
    // b = 6: suffix = 26 bits, mask = 2^26 - 1
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(shiftright(h, 26) AS INT) AS bucket,
        |  max(CAST(CASE WHEN (h & 67108863L) = 0 THEN 27
        |       ELSE 27 - length(bin(h & 67108863L)) END AS INT)) AS register
        |FROM (SELECT l_returnflag, md5_uniform32(l_partkey) AS h
        |      FROM li_sql WHERE l_partkey IS NOT NULL)
        |GROUP BY l_returnflag, bucket
        |ORDER BY l_returnflag, bucket""".stripMargin)
    val api = Sketch.hllRegisters(Tables.lineitem(spark, sfDir), "l_partkey",
      Seq("l_returnflag"), b = 6).orderBy("l_returnflag", "bucket")
    assert(rows(sql) == rows(api))
    assert(rows(sql).nonEmpty)
  }

  test("q115 containment shape in pure SQL: shingle_hashes + containment_sorted") {
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_sql")
    val sql = spark.sql(
      """WITH t AS (
        |  SELECT doc_id, lang, source, shingle_hashes(text, 2) AS tk
        |  FROM docs_sql),
        |f AS (SELECT * FROM t WHERE size(tk) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  containment_sorted(a.tk, b.tk) AS containment
        |FROM f a JOIN f b
        |  ON a.lang = b.lang AND a.source = b.source
        |  AND a.doc_id <> b.doc_id
        |WHERE containment_sorted(a.tk, b.tk) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin)
    val api = Dedup.ngramContainmentPairs(Tables.documents(spark, sfDir),
      "doc_id", "text", blockCols = Seq("lang", "source"),
      threshold = 0.5, shingleSize = 2).orderBy("id_a", "id_b")
    assert(rows(sql) == rows(api))
  }

  test("adjacent_pairs / intersect_sorted / gram_upper_triangle from SQL") {
    val ap = spark.sql(
      "SELECT adjacent_pairs(array('a', 'b', 'c')) AS p").head().getSeq[String](0)
    assert(ap == Seq("a b", "b c"))
    val is = spark.sql(
      "SELECT intersect_sorted(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS x")
      .head().getSeq[Long](0)
    assert(is == Seq(3L, 5L))
    val g = spark.sql(
      """SELECT gram_upper_triangle(v) AS g FROM VALUES
        |  (array(1L, 2L)), (array(3L, 4L)) AS t(v)""".stripMargin)
      .selectExpr("inline(g)").collect().toSeq
    // G = [[1,2],[3,4]] outer sums: (1,1)=1+9, (1,2)=2+12, (2,2)=4+16
    assert(g == Seq(Row(1L, 1L, 10L), Row(1L, 2L, 14L), Row(2L, 2L, 20L)))
  }

  test("wrong-typed input to the long-array expressions fails at analysis") {
    val e1 = intercept[Exception](spark.sql(
      "SELECT intersect_sorted(array(1, 2), array(2, 3))").collect())
    assert(e1.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT gram_upper_triangle(v) FROM VALUES (array(1.5D)) AS t(v)").collect())
    assert(e2.getMessage.toLowerCase.contains("type"))
    // the full ArrayData-consuming family is guarded (round-6 review):
    // int arrays must not silently mis-read as longs, and adjacent_pairs
    // must reject non-string arrays
    val e3 = intercept[Exception](spark.sql(
      "SELECT containment_sorted(array(1, 2), array(2, 3))").collect())
    assert(e3.getMessage.toLowerCase.contains("type"))
    val e4 = intercept[Exception](spark.sql(
      "SELECT adjacent_pairs(array(1, 2))").collect())
    assert(e4.getMessage.toLowerCase.contains("type"))
  }
}
