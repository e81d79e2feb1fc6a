package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy overlap semantics, weighted counts, early exhaustion") {
    // corpus: "aaaa" ×2, "ab" ×1
    // r1: (a,a) appears 3×/word × wc 2 = 6 > (a,b)=1 → merge "a a";
    //     greedy left-to-right: "a a a a" → "aa aa" (NOT "aa a a")
    // r2: (aa,aa)=2 → merge; "aaaa" becomes one symbol
    // r3: (a,b)=1 → merge
    // r4: no pairs left → stops early though steps=5
    val docs = Seq("aaaa aaaa ab").toDF("text")
    val got = Bpe.trainMerges(docs, "text", steps = 5)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a a", 6L), (2, "aa aa", 2L), (3, "a b", 1L)))
  }

  test("merge order is deterministic under ties (pair asc) and partitioning") {
    // "xy" and "yx" both have count 2 → tie broken by pair string order
    val docs = Seq("xy xy yx yx").toDF("text")
    val a = Bpe.trainMerges(docs, "text", steps = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(a == Seq((1, "x y", 2L)))
    val b = Bpe.trainMerges(docs.repartition(7), "text", steps = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("encodeCounts: per-doc subword widths after train-then-encode") {
    // vocab: aaaa (wc 3), ab (wc 1)
    // r1: (a,a) = 3 occurrences/word × wc 3 = 9 → aaaa encodes "aa aa"
    // r2: (aa,aa) = 3 → aaaa encodes as ONE symbol; ab stays "a b"
    val docs = Seq((1L, "aaaa ab"), (2L, "aaaa aaaa"))
      .toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, "doc_id", "text", steps = 2)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, 3L), (2L, 2L, 2L)))
  }

  test("encodeCounts is partitioning-independent") {
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran far"),
      (3L, "a cathedral")).toDF("doc_id", "text")
    val a = Bpe.encodeCounts(docs, "doc_id", "text", steps = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val b = Bpe.encodeCounts(docs.repartition(7), "doc_id", "text", steps = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(a == b && a.size == 3)
  }
}
