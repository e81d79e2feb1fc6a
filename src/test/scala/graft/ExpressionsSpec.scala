package graft

import graft.expressions.{MinHashSig, VectorExpressions => VE}
import graft.functions.VectorFunctions
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(-1.0f, 0.5f, 2.0f))).toDF("vec_id", "embedding")

  test("codegen'd dot/norm/cosine agree with the HOF formulations") {
    val r = vecs.filter(col("vec_id") === 0L)
      .crossJoin(vecs.filter(col("vec_id") === 1L)
        .select(col("embedding").as("other")))
      .select(
        VE.dotF(col("embedding"), col("other")).as("d1"),
        VectorFunctions.dot(col("embedding"), col("other")).as("d2"),
        VE.norm2F(col("embedding")).as("n1"),
        VectorFunctions.normSq(col("embedding")).as("n2"),
        VE.cosineF(col("embedding"), col("other")).as("c1"),
        VectorFunctions.cosine(col("embedding"), col("other")).as("c2"))
      .head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) == 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0)
    assert(r.getDouble(2) == r.getDouble(3))
    assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-12)
  }

  test("adjacentPairs matches the HOF transform formulation") {
    val docs = Seq("the cat sat on the mat", "one", "", "a b")
      .toDF("text")
      .select(TextFunctions.tokens(lower(trim(col("text")))).as("toks"))
    val fused = docs.select(
      graft.expressions.TextHash.adjacentPairs(col("toks")).as("p"))
      .as[Seq[String]].collect().toSeq
    val hof = docs.select(when(size(col("toks")) >= 2, expr(
      "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
      .otherwise(array()).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(fused == hof)
    assert(fused.head == Seq("the cat", "cat sat", "sat on", "on the", "the mat"))
  }

  test("hyperplane bucket: deterministic, equal vectors collide, opposite differ") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("id", "v")
    val b = df.select(VE.hyperplaneBucket(col("v"), 16, 42).as("b")).as[Long].collect()
    assert(b(0) == b(1))
    assert(b(0) == (~b(2) & 0xFFFFL)) // sign flip inverts every bit
  }

  test("minhash signature: identical sets equal; overlap fraction ≈ jaccard") {
    val df = Seq(
      (0L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (2L, Seq("a", "b", "c", "d", "w", "x", "y", "z"))).toDF("id", "sh")
    val sigs = df.select(MinHashSig.minhash(col("sh"), 256).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val agree = sigs(0).zip(sigs(2)).count { case (a, b) => a == b } / 256.0
    // true jaccard = 4/12 = 0.333; 256 hashes → ±0.1 easily
    assert(math.abs(agree - 1.0 / 3.0) < 0.12, s"minhash agreement $agree")
  }

  test("prefixJaccardPairs returns exactly the quadratic result") {
    val docs = Tables5docs
    val quad = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang"), 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // same tokens: unigram == shingleSize 1
    val fast = Dedup.prefixJaccardPairs(docs, "doc_id", "text", Seq("lang"),
      shingleSize = 1, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == quad)
  }

  private def Tables5docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "the quick brown fox leaps over the lazy dog"),
    (3L, "en", "a completely different sentence about engines"),
    (4L, "de", "der schnelle braune fuchs springt"),
    (5L, "de", "der schnelle braune fuchs rennt")).toDF("doc_id", "lang", "text")

  test("topKPairs agrees with the window spelling and bounds ties") {
    val ev = sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "value")
    val viaHeap = ev.groupBy("user_id")
      .agg(graft.expressions.TopKHeap.topKPairs(col("value"), col("event_id"), 3)
        .as("top"))
      .select(col("user_id"), explode(col("top")).as("p"))
      .select(col("user_id"), col("p.id").as("event_id"))
      .as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc, col("event_id").desc)
    val viaWindow = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    assert(viaHeap == viaWindow)
  }

  test("topKPairs is partition-independent and emits a sorted array") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 7.0, 9L), (1L, 1.0, 99L),
      (2L, 3.0, 1L)).toDF("g", "score", "id")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(graft.expressions.TopKHeap.topKPairs(col("score"), col("id"), 2).as("t"))
      .select(col("g"), col("t").cast("string").as("t"))
      .as[(Long, String)].collect().toMap
    val a = run(df)
    // score desc, tie → larger id first; only k kept
    assert(a(1L) == "[{7.0, 9}, {5.0, 11}]")
    assert(a(2L) == "[{3.0, 1}]")
    assert(run(df.repartition(7)) == a)
  }

  test("topk_pairs over a running window frame (non-destructive eval)") {
    Seq((1L, 1.0), (2L, 3.0), (3L, 2.0)).toDF("i", "s")
      .createOrReplaceTempView("tkw")
    val out = spark.sql(
      """SELECT i, CAST(topk_pairs(s, i, 2) OVER
        |  (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS STRING) AS t FROM tkw ORDER BY i""".stripMargin)
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "[{1.0, 1}]"),
      (2L, "[{3.0, 2}, {1.0, 1}]"),
      (3L, "[{3.0, 2}, {2.0, 3}]")))
  }

  test("topk_pairs coerces numeric inputs at analysis time") {
    Seq((1, 5), (2, 9)).toDF("i", "s").createOrReplaceTempView("tkc")
    val out = spark.sql(
      "SELECT CAST(topk_pairs(s, i, 1) AS STRING) FROM tkc")
      .as[String].collect()
    assert(out.toSeq == Seq("[{9.0, 2}]"))
  }

  test("topk_pairs is callable from SQL via GraftExtensions") {
    Seq((1L, 2.0, 5L), (1L, 9.0, 6L)).toDF("g", "s", "i")
      .createOrReplaceTempView("tkp")
    val out = spark.sql(
      "SELECT g, topk_pairs(s, i, 1) AS t FROM tkp GROUP BY g")
      .select(col("t").cast("string")).as[String].collect()
    assert(out.toSeq == Seq("[{9.0, 6}]"))
  }

  test("pq_codes / pq_lut / pq_adc are callable from SQL and agree") {
    // 1 subspace, 2 codewords of dim 2: cb = [[1,0],[0,1]]
    // v=[3,1] → dot c0=3, c1=1 → code 0; q=[0,2] → lut [0,2] → adc 0
    Seq((Seq(3f, 1f), Seq(0f, 2f))).toDF("v", "q")
      .createOrReplaceTempView("pqt")
    val out = spark.sql(
      """SELECT pq_codes(v, array(1.0F, 0.0F, 0.0F, 1.0F), 1, 2) AS c,
        |  pq_adc(pq_codes(v, array(1.0F, 0.0F, 0.0F, 1.0F), 1, 2),
        |         pq_lut(q, array(1.0F, 0.0F, 0.0F, 1.0F), 1, 2), 2) AS s
        |FROM pqt""".stripMargin)
      .select(col("c").cast("string"), col("s")).as[(String, Double)].head()
    assert(out == (("[0]", 0.0)))
    // tie goes to the LARGER codeword index (array_max struct semantics)
    val tie = spark.sql(
      "SELECT CAST(pq_codes(array(1.0F, 1.0F), " +
        "array(1.0F, 0.0F, 0.0F, 1.0F), 1, 2) AS STRING) AS c FROM pqt")
      .as[String].head()
    assert(tie == "[1]")
  }

  test("gramUpperTriangle: hand-computed cells, partition-independent, empty in") {
    import graft.expressions.GramAggregate
    // [(1,2),(3,4)]: G11 = 1+9, G12 = 2+12, G22 = 4+16
    val vecs = Seq(Seq(1L, 2L), Seq(3L, 4L))
    def cells(partitions: Int) =
      vecs.toDF("q").repartition(partitions)
        .agg(GramAggregate.gramUpperTriangle(col("q")).as("c"))
        .select(explode(col("c")).as("cell"))
        .select("cell.i", "cell.j", "cell.g")
        .as[(Long, Long, Long)].collect().toSet
    val want = Set((1L, 1L, 10L), (1L, 2L, 14L), (2L, 2L, 20L))
    assert(cells(1) == want)
    assert(cells(5) == want) // merge path: more partitions than rows
    // empty input → empty cells array → zero rows after explode
    val empty = Seq.empty[Seq[Long]].toDF("q")
      .agg(GramAggregate.gramUpperTriangle(col("q")).as("c"))
      .select(explode(col("c")).as("cell"))
    assert(empty.count() == 0L)
    // inconsistent vector lengths fail loudly, never mis-accumulate
    val e = intercept[Exception](
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("q").repartition(1)
        .agg(GramAggregate.gramUpperTriangle(col("q")).as("c")).collect())
    assert(e.getMessage.contains("vector length") ||
      Option(e.getCause).exists(_.getMessage.contains("vector length")))
    // null ELEMENTS fail loudly too (no sound 0-substitution exists)
    val en = intercept[Exception](
      Seq(Seq(Some(1L), None), Seq(Some(2L), Some(3L))).toDF("q").repartition(1)
        .agg(GramAggregate.gramUpperTriangle(col("q")).as("c")).collect())
    assert(en.getMessage.contains("null element") ||
      Option(en.getCause).exists(_.getMessage.contains("null element")))
  }

  test("intersectSorted: merge-scan matches array_intersect on sorted input") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L))
    ).toDF("a", "b")
    val got = df.select(
      graft.expressions.SortedArrays.intersectSorted(col("a"), col("b")))
      .as[Seq[Long]].collect().toSeq
    assert(got == Seq(Seq(3L, 5L), Seq.empty, Seq.empty))
  }

  test("containmentSorted: |a∩b|/|a|, asymmetric, empty-left = 0") {
    val df = Seq(
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),      // subset → 1.0
      (Seq(1L, 4L), Seq(1L, 2L, 3L)),      // half  → 0.5
      (Seq.empty[Long], Seq(1L, 2L))       // empty a → 0.0
    ).toDF("a", "b")
    val got = df.select(
      graft.expressions.TextHash.containmentSorted(col("a"), col("b")),
      graft.expressions.TextHash.containmentSorted(col("b"), col("a")))
      .as[(Double, Double)].collect().toSeq
    assert(got == Seq((1.0, 2.0 / 3), (0.5, 1.0 / 3), (0.0, 0.0)))
  }
}
