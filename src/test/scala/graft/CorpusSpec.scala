package graft

import graft.operators.{Corpus, Dedup}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "web", "the cat sat on the mat"),
    (2L, "en", "web", "a dog ran in the park"),
    (3L, "en", "web", "the cat and the dog"),
    (4L, "de", "web", "der hund lief im park"),
    (5L, "de", "book", "die katze saß auf der matte"))
    .toDF("doc_id", "lang", "source", "text")

  test("vocabulary counts tokens globally with stable tie-break") {
    val v = Corpus.vocabulary(docs, "text", 3).as[(String, Long)].collect()
    assert(v.head == ("the", 5L))
    // ties broken token-asc after count-desc
    assert(v.map(_._2).sorted.reverse.sameElements(v.map(_._2)))
  }

  test("stratifiedCap keeps at most cap rows per stratum, deterministically") {
    val capped = Corpus.stratifiedCap(docs, "doc_id", Seq("lang", "source"), 2)
    assert(capped.groupBy("lang", "source").count()
      .filter(col("count") > 2).isEmpty)
    // deterministic: two runs agree row-for-row
    val a = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Corpus.stratifiedCap(docs, "doc_id", Seq("lang", "source"), 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // full strata under the cap survive whole
    assert(capped.filter(col("source") === "book").count() == 1)
  }

  test("mixtureEpochs: integer repeat factors lift every source to the max") {
    val d = Seq(
      (1L, "A", "a b c"), (2L, "A", "d e"),          // A: 5 tokens
      (3L, "B", "t u v w x y z p q r"))              // B: 10 tokens
      .toDF("doc_id", "source", "text")
    val got = Corpus.mixtureEpochs(d, "source", "text")
      .select("source", "n_docs", "n_toks", "repeats", "eff_toks", "share_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("A", 2L, 5L, 2L, 10L, 333333L),
      ("B", 1L, 10L, 1L, 10L, 666666L)))
    // repeated under a different partitioning: identical
    val rep = Corpus.mixtureEpochs(d.repartition(7), "source", "text")
      .select("source", "n_docs", "n_toks", "repeats", "eff_toks", "share_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("hashSample is deterministic, nested by rate, and near the target rate") {
    val ids = Seq.tabulate(2000)(i => i.toLong).toDF("doc_id")
    val at20 = Corpus.hashSample(ids, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val at10 = Corpus.hashSample(ids, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    // same keep-set every run
    assert(at20 == Corpus.hashSample(ids, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet)
    // lower rate is a subset of higher (thresholds nest on the same hash)
    assert(at10.subsetOf(at20))
    // md5 uniformity: within a loose band of the target
    assert(at10.size > 120 && at10.size < 280)
    assert(at20.size > 280 && at20.size < 520)
  }

  test("tfIdfTopK surfaces distinctive tokens over common ones") {
    val r = Corpus.tfIdfTopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk")
      .select("doc_id", "rnk", "token", "tf", "df")
      .as[(Long, Int, String, Long, Long)].collect()
    assert(r.length == 10) // 5 docs × top-2
    // "the" appears in 3 of 5 docs (df=3) — a doc-unique token (df=1)
    // always outscores it at equal tf, so no doc's top-1 is "the"
    assert(!r.filter(_._2 == 1).exists(_._3 == "the"))
    // doc 1: "the" has tf=2, df=3 → score 2·(5/3)=3.33; unique tokens
    // tf=1, df=1 → 5.0 → a unique token wins rank 1
    val d1 = r.filter(_._1 == 1L)
    assert(d1.head._5 == 1L && d1.head._4 == 1L)
    // deterministic tie-break: rank-1 token is the alphabetically first
    // of doc 1's df=1 tokens (mat/on/sat → "mat")
    assert(d1.head._3 == "mat")
  }

  test("topKPerGroup attaches ranks and respects sort order") {
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (2, 5.0))
      .toDF("g", "v")
    val top = Corpus.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .orderBy("g", "rank").as[(Int, Double, Int)].collect()
    assert(top.toSeq == Seq((1, 30.0, 1), (1, 20.0, 2), (2, 5.0, 1)))
  }

  test("portable simhash: near-identical docs differ in few bits, distinct docs in many") {
    def hamming(a: String, b: String): Int =
      a.zip(b).map { case (x, y) =>
        Integer.bitCount(Integer.parseInt(x.toString, 16) ^
          Integer.parseInt(y.toString, 16))
      }.sum
    val sigs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the creek"),
      (3L, "columnar execution engines vectorize expression evaluation pipelines"))
      .toDF("id", "text")
      .select(col("id"), Dedup.simHashHex(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(sigs(1L).length == 16)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("portable minhash estimates match planted duplicates") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words without any overlap here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDuplicates(d, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.5,
      exactVerify = false, portableHash = true)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 1.0) // identical docs agree on every component
  }

  test("thresholded jaccard equals plain jaccard for survivors") {
    val d = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val ge = Dedup.ngramJaccardPairs(d, "doc_id", "text", Nil,
      threshold = 0.3, shingleSize = 1)
      .as[(Long, Long, Double)].collect().toSet
    // shingle sets of 1&2 share 5 of 7 distinct tokens → J = 5/7
    assert(ge.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(math.abs(ge.head._3 - 5.0 / 7.0) < 1e-12)
  }

  test("mixture sample: per-group rates, nesting, partition-independence") {
    val docs = sources.Tables.documents(spark, sfDir)
    val kept = Corpus.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.25), defaultRate = 0.0)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("src0") == totals("src0"))       // rate 1.0 keeps all
    assert(bySource.getOrElse("src1", 0L) < totals("src1"))
    assert(bySource.keySet.subsetOf(Set("src0", "src1"))) // default 0 drops rest

    // rate-r kept set nests inside rate-2r (monotone thresholds)
    val at25 = Corpus.mixtureSample(docs, "doc_id", "source",
      Map.empty, defaultRate = 0.25).select("doc_id").as[Long].collect().toSet
    val at50 = Corpus.mixtureSample(docs, "doc_id", "source",
      Map.empty, defaultRate = 0.5).select("doc_id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
    assert(at25.nonEmpty && at25.size < at50.size)

    // same rows regardless of physical partitioning
    val rep = Corpus.mixtureSample(docs.repartition(13), "doc_id", "source",
      Map.empty, defaultRate = 0.25).select("doc_id").as[Long].collect().toSet
    assert(rep == at25)
  }

  test("weightedSample: max-weight rows always kept, zero never, monotone in weight") {
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, if (i % 10 == 0) 0 else i % 100)).toDF("id", "w")
    val kept = Corpus.weightedSample(df, "id", "w")
      .select("id").as[Long].collect().toSet
    val byId = df.as[(Long, Int)].collect().toMap
    assert(kept.forall(byId(_) > 0))                   // weight 0 → never
    assert(byId.filter(_._2 == 99).keySet.subsetOf(kept)) // max w → always
    // uniformly rescaling all weights leaves the kept set unchanged
    // (probability is w/max(w) — scale-free)
    val scaled = Corpus.weightedSample(
      df.withColumn("w", col("w") * 2), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(scaled == kept)
    // partitioning-independent
    val rep = Corpus.weightedSample(df.repartition(7), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(rep == kept)
  }

  test("invertedIndex: tf-desc doc-asc postings, cap, df filter") {
    val docs = Seq(
      (1L, "a a a b"), (2L, "a b b"), (3L, "a c"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val out = Corpus.invertedIndex(docs, "doc_id", "text", k = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // token a: tf 3@1, 1@{2,3,4} → top2 = 1:3 then doc-asc tie 2:1
    assert(out("a") == ((4L, "1:3,2:1")))
    assert(out("b") == ((3L, "2:2,1:1")))
    assert(out("c") == ((2L, "3:1,4:1")))
    // minDf prunes the tail
    val pruned = Corpus.invertedIndex(docs, "doc_id", "text", k = 2, minDf = 3L)
      .select("token").as[String].collect().toSet
    assert(pruned == Set("a", "b"))
    // partitioning-independent
    val rep = Corpus.invertedIndex(docs.repartition(5), "doc_id", "text", k = 2)
      .as[(String, Long, String)].collect().toSet
    assert(rep == out.map { case (t, (d, p)) => (t, d, p) }.toSet)
  }

  test("benchmarkContamination: containment counts, threshold flag, short-doc absence") {
    val probe = Seq((10L, "a b c"), (11L, "x y z w"), (12L, "a"))
      .toDF("doc_id", "text")
    val bench = Seq(("b c d e"), ("q r")).toDF("text")
    // probe 10: grams {a b, b c} -> hits {b c} = 1/2 >= 20% -> flagged
    // probe 11: grams {x y, y z, z w} -> 0 hits -> clean
    // probe 12: single token, no 2-grams -> absent from output
    val got = Corpus.benchmarkContamination(probe, "doc_id", "text",
      bench, "text", shingleSize = 2, thresholdPpm = 200000L)
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((10L, 2L, 1L, 1), (11L, 3L, 0L, 0)))
    // threshold above the containment ratio clears the flag
    val strict = Corpus.benchmarkContamination(probe, "doc_id", "text",
      bench, "text", shingleSize = 2, thresholdPpm = 600000L)
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect().toSeq
    assert(strict.map(_._4) == Seq(0, 0))
  }

  test("heavyHitters: exact under MG eviction, partitioning-independent") {
    // skewed corpus over a 31-word vocab with capacity 12: evictions
    // fire constantly, yet the exact pass must recover true counts
    val words = (0 until 30).map(i => s"w$i")
    val text = (0 until 3000).map { i =>
      if (i % 3 == 0) "hot" // 1000 of 4000 tokens = 25%
      else words(i % 30)    // each ~3.3% => under a 10% threshold
    } :+ "warm " * 600      // 600 tokens of warm = 13%
    val docs = text.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // N = 3000 + 600; threshold 10% = 360: expect hot(1000), warm(600)
    val got = Corpus.heavyHitters(docs, "text",
      thresholdPpm = 100000L, capacity = 12)
      .orderBy("token").as[(String, Long)].collect().toSeq
    assert(got == Seq(("hot", 1000L), ("warm", 600L)))
    // exactness is partitioning-independent (MG summaries differ per
    // partitioning; the verified counts must not)
    val got17 = Corpus.heavyHitters(docs.repartition(17), "text",
      thresholdPpm = 100000L, capacity = 12)
      .orderBy("token").as[(String, Long)].collect().toSeq
    assert(got17 == got)
    // completeness guard: capacity too small for the ppm is rejected
    intercept[IllegalArgumentException] {
      Corpus.heavyHitters(docs, "text", thresholdPpm = 1000L, capacity = 4)
    }
  }

  test("bigram LM score: add-one ppm arithmetic, pairless docs absent") {
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    // c(a b)=3, c(b a)=1; prefix c_a=3, c_b=1; V={a,b,c}=3
    // ppm(a b) = 4000000 div 6 = 666666; ppm(b a) = 2000000 div 4 = 500000
    val r = Corpus.bigramLmScore(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, (2 * 666666L + 500000L) / 3),  // 611110
      (2L, 1L, 666666L)))                     // doc 3 has no pairs
  }

  test("winnowedFingerprints: coverage, validity, rightmost ties, short docs") {
    val text = "the quick brown fox jumps over the lazy dog near the bank"
    val docs = Seq(
      (1L, text),
      (2L, s"prefix tokens here $text"),  // shares an 11-token run with 1
      (3L, "too short"),                  // < n tokens -> absent
      (4L, "x x x x x x")).toDF("doc_id", "text")
    val n = 3; val w = 4
    val fps = Corpus.winnowedFingerprints(docs, "doc_id", "text", n, w)
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = fps.groupBy(_._1)
    assert(!byDoc.contains(3L))
    // validity: every selected (pos, fp) is the md5-31 hash of the gram
    // actually at pos; density: every window of w grams holds a selection
    for ((id, t) <- Seq(1L -> text, 2L -> s"prefix tokens here $text")) {
      val toks = t.split("\\s+")
      val grams = toks.sliding(n).map(_.mkString(" ")).toVector
      val h = grams.map { g =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5").digest(
            g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
          16) % 2147483647L
      }
      val sel = byDoc(id).map(r => r._2 -> r._3).toMap
      sel.foreach { case (p, fp) => assert(h(p.toInt) == fp) }
      (0 to grams.size - w).foreach { s =>
        assert((s until s + w).exists(p => sel.contains(p.toLong))) }
    }
    // winnowing guarantee: a shared run of w+n-1 tokens shares >= 1 fp
    assert(byDoc(1L).map(_._3).toSet
      .intersect(byDoc(2L).map(_._3).toSet).nonEmpty)
    // identical grams: the window min takes the RIGHTMOST occurrence,
    // so "x x x x x x" (n=1: 6 equal grams) selects exactly pos w-1..5
    val ties = Corpus.winnowedFingerprints(docs.filter($"doc_id" === 4),
      "doc_id", "text", n = 1, w = 3)
      .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    assert(ties.map(_._2) == Seq(2L, 3L, 4L, 5L))
    assert(ties.map(_._3).distinct.size == 1)
    // partitioning-independent
    val rep = Corpus.winnowedFingerprints(docs.repartition(7),
      "doc_id", "text", n, w).as[(Long, Long, Long)].collect().toSet
    assert(rep == fps.toSet)
  }

  test("winnowedNearClonePairs: clone pair found, stop fingerprints dropped") {
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val boiler = "terms of service apply to all users everywhere always"
    val docs = Seq(
      (1L, s"$clone and some trailing words here"),
      (2L, s"leading words then $clone again"),
      (3L, s"$boiler plus unique content one two three four"),
      (4L, s"$boiler with different tail tokens five six seven"),
      (5L, s"$boiler and another unrelated ending eight nine ten"),
      (6L, "completely unrelated text with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    // clone run: 10 shared tokens >> w+n-1 = 6 -> docs 1/2 share prints
    val got = Corpus.winnowedNearClonePairs(docs, "doc_id", "text",
      n = 3, w = 4, minShared = 2, maxDf = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)))
    // maxDf = 2 drops every boilerplate fingerprint (df = 3): the
    // boiler trio must not pair while the clone pair survives
    val strict = Corpus.winnowedNearClonePairs(docs, "doc_id", "text",
      n = 3, w = 4, minShared = 2, maxDf = 2)
      .as[(Long, Long, Long)].collect().toSeq.map(p => (p._1, p._2))
    assert(strict.contains((1L, 2L)))
    assert(!strict.exists { case (a, b) => Set(a, b).subsetOf(Set(3L, 4L, 5L)) })
    // shared counts are exact: recompute from the fingerprint sets
    val fpSets = Corpus.winnowedFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._3).toSet }
    val dfAll = fpSets.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).collect { case (f, o) if o.size <= 8 => f }.toSet
    got.foreach { case (a, b, s) =>
      assert((fpSets(a).intersect(fpSets(b)).intersect(dfAll)).size == s) }
  }

  test("bm25Scores: hand-computed integer ppm, absent when no term hits") {
    val docs = Seq(
      (1L, "spark merge spark"), (2L, "merge table"), (3L, "table row"))
      .toDF("doc_id", "text")
    // n=3, avglen = 7 div 3 = 2; df(spark)=1, df(merge)=2
    // idf(spark) = 1000000*3 div 2 = 1500000; idf(merge) = 2000000 div 3
    // nm(doc1) = 250 + 2250 div 2 = 1375; nm(doc2) = 250 + 750 = 1000
    // doc1 spark: tf=2 -> (2*2200e9) div (2e6 + 1200*1375) = 1205479
    //      merge: tf=1 -> 2200e9 div (1e6 + 1650000) = 830188
    //      score = (1500000*1205479) div 1e6 + (666666*830188) div 1e6
    // doc2 merge: tf=1 -> 2200e9 div 2200000 = 1000000 -> 666666
    val got = Corpus.bm25Scores(docs, "doc_id", "text",
      Seq("spark", "merge")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> (1808218L + 553458L), 2L -> 666666L))
    // partitioning-independent
    val rep = Corpus.bm25Scores(docs.repartition(5), "doc_id", "text",
      Seq("spark", "merge")).as[(Long, Long)].collect().toMap
    assert(rep == got)
    // injection guard
    intercept[IllegalArgumentException] {
      Corpus.bm25Scores(docs, "doc_id", "text", Seq("a'b"))
    }
  }

  test("rrfFuse: rank arithmetic, topK cut, absent-list zeros") {
    val a = Seq((1L, 90L), (2L, 80L), (3L, 70L), (4L, 60L))
      .toDF("id", "score")
    val b = Seq((3L, 99L), (1L, 50L), (5L, 10L)).toDF("id", "score")
    val got = Corpus.rrfFuse(Seq(a, b), kRrf = 60L, topK = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a ranks: 1->1, 2->2, 3->3 (4 cut by topK); b: 3->1, 1->2, 5->3
    assert(got(1L) == ((1L, 2L, 1000000L / 61 + 1000000L / 62)))
    assert(got(2L) == ((2L, 0L, 1000000L / 62)))
    assert(got(3L) == ((3L, 1L, 1000000L / 63 + 1000000L / 61)))
    assert(got(5L) == ((0L, 3L, 1000000L / 63)))
    assert(!got.contains(4L))
    // score ties break by id ascending
    val t = Seq((7L, 5L), (6L, 5L)).toDF("id", "score")
    val ranks = Corpus.rrfFuse(Seq(t), topK = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(ranks == Map(6L -> 1L, 7L -> 2L))
  }

  test("ngramNovelty: first-seen attribution, within-doc dedup, partitioning") {
    // bucketSize=2: bucket 0 = docs {0,1}, bucket 1 = docs {2,3}.
    // doc 0: grams {a b, b a} (the repeat "a b" dedups within-doc)
    // doc 1: {a b}           — seen (doc 0)
    // doc 2: {c d}           — new
    // doc 3: {a b, b c}      — "a b" seen, "b c" new
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "c d"),
      (3L, "a b c")).toDF("doc_id", "text")
    val got = Corpus.ngramNovelty(docs, "doc_id", "text",
      shingleSize = 2, bucketSize = 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 666666L), (1L, 3L, 2L, 666666L)))
    val rep = Corpus.ngramNovelty(docs.repartition(7), "doc_id", "text",
      shingleSize = 2, bucketSize = 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == got)
    // docs shorter than the gram width contribute nothing
    val tiny = Corpus.ngramNovelty(Seq((1L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text", shingleSize = 2, bucketSize = 2L)
    assert(tiny.count() == 0L)
  }

  test("hashedBagOfWords: signed sums match a driver-side md5 replay") {
    val docs = Seq((1L, "a b a c"), (2L, "b b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.hashedBagOfWords(docs, "doc_id", "text", bins = 8)
      .as[(Long, Long, Long)].collect().toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bin(t: String) =
      java.lang.Long.parseLong(md5hex(t).take(8), 16) % 2147483647L % 8L
    def sgn(t: String) =
      1L - 2L * (java.lang.Long.parseLong(md5hex(t).substring(8, 9), 16) % 2L)
    val want = Seq((1L, Seq("a", "b", "a", "c")), (2L, Seq("b", "b")))
      .flatMap { case (id, ts) => ts.map(t => (id, bin(t), sgn(t))) }
      .groupBy(p => (p._1, p._2))
      .map { case ((id, b), xs) => (id, b, xs.map(_._3).sum) }.toSet
    assert(got == want && got.nonEmpty)
    // empty doc contributes nothing
    assert(!got.exists(_._1 == 3L))
  }

  test("tokenMixDrift: exact hand case incl. absent-token mass, single group reads 0") {
    // corpus = {x:2, y:1, z:1}, N=4. Group A = "x x y" (ns=3):
    //   dev = |2·4−2·3| + |1·4−1·3| + |0·4−1·3| = 6 → 6e6/(2·3·4) = 250000
    // Group B = "z" (ns=1):
    //   dev = |0−2·1| + |0−1·1| + |1·4−1·1| = 6 → 6e6/(2·1·4) = 750000
    val docs = Seq(("A", "x x y"), ("B", "z")).toDF("source", "text")
    val byGroup = Corpus.tokenMixDrift(docs, "source", "text")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byGroup == Map("A" -> ((3L, 250000L)), "B" -> ((1L, 750000L))))
    // one group IS the corpus: zero drift by definition
    val solo = Corpus.tokenMixDrift(
      Seq(("A", "p q"), ("A", "r")).toDF("source", "text"), "source", "text")
      .as[(String, Long, Long)].collect().toSeq
    assert(solo == Seq(("A", 3L, 0L)))
  }

  test("boilerplate: df>=minDf sentences flagged, ratio and mostly-boiler exact") {
    // footer "ad here" appears in docs 1..3 (df=3); "unique N" df=1;
    // doc 4 is ONLY the footer → mostly-boiler
    val docs = Seq(
      (1L, "s", "unique one. ad here."),
      (2L, "s", "unique two words. ad here."),
      (3L, "s", "unique three more words! ad here."),
      (4L, "s", "ad here.")).toDF("doc_id", "source", "text")
    val got = Corpus.boilerplate(docs, "doc_id", "source", "text", minDf = 3L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // chars: "unique one"=10, "unique two words"=16,
    // "unique three more words"=23, footer "ad here"=7 ×4
    val tot = 10L + 16L + 23L + 4 * 7L
    assert(got == Seq(("s", 4L, tot, 28L, 1L, 28L * 1000000L / tot)))
    // below the df threshold nothing is flagged
    val none = Corpus.boilerplate(docs, "doc_id", "source", "text",
      minDf = 5L).as[(String, Long, Long, Long, Long, Long)].collect()
    assert(none.head._4 == 0L && none.head._5 == 0L)
  }

  test("cdcChunkDedup: identical passages dedup, offset shifts preserve tail chunks") {
    val body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one two three four five six seven eight nine ten").trim
    // two identical docs: every chunk collides pairwise
    val twin = Seq(("g", body), ("g", body)).toDF("source", "text")
    val t = Corpus.cdcChunkDedup(twin, "source", "text", modulus = 4)
      .as[(String, Long, Long, Long)].collect().head
    assert(t._2 == 2 * t._3 && t._4 == 500000L, s"got $t")
    // prepending a prefix shifts every byte offset, but chunks after
    // the first content boundary are identical — the CDC property a
    // fixed-width chunker lacks
    val shifted = Seq(("g", body), ("g", "zzz qqq vvv " + body))
      .toDF("source", "text")
    val sft = Corpus.cdcChunkDedup(shifted, "source", "text", modulus = 4)
      .as[(String, Long, Long, Long)].collect().head
    assert(sft._4 > 0L, s"no shared chunks after shift: $sft")
    // partitioning invariance
    val rep = Corpus.cdcChunkDedup(twin.repartition(5), "source", "text",
      modulus = 4).as[(String, Long, Long, Long)].collect().head
    assert(rep == t)
  }

  test("importanceWeights: exact Scala replay; target-like docs score higher") {
    val raw = Seq((1L, "alpha alpha beta"), (2L, "omega omega gamma"),
      (3L, "alpha omega")).toDF("doc_id", "text")
    val tgt = Seq((9L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val got = Corpus.importanceWeights(raw, tgt, "doc_id", "text",
      bins = 64).orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq

    // driver-side replay of the md5 bucket + fixed-point-log2 pipeline
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2147483647L % 64L
    }
    def lg(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      (e.toLong << 20) + ((x << 20) >> e) - (1L << 20)
    }
    val rawToks = Map(
      1L -> Seq("alpha", "alpha", "beta"),
      2L -> Seq("omega", "omega", "gamma"),
      3L -> Seq("alpha", "omega"))
    val tgtToks = Seq("alpha", "alpha", "alpha", "beta")
    val cr = rawToks.values.flatten.toSeq.groupBy(bucket)
      .view.mapValues(_.size.toLong).toMap
    val ct = tgtToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val c0 = lg(rawToks.values.map(_.size).sum + 64L) -
      lg(tgtToks.size + 64L)
    def score(ts: Seq[String]): Long = ts.map { t =>
      val b = bucket(t)
      lg(ct.getOrElse(b, 0L) + 1) - lg(cr(b) + 1) + c0
    }.sum
    val want = rawToks.toSeq.sortBy(_._1)
      .map { case (id, ts) => (id, ts.size.toLong, score(ts)) }
    assert(got == want, s"got $got want $want")
    // fixed-point log2 anchors: exact at powers of two, monotone between
    assert(lg(1L) == 0L && lg(2L) == (1L << 20) && lg(4L) == (2L << 20))
    assert(lg(3L) > lg(2L) && lg(3L) < lg(4L))
    // semantic reading (skipped under bucket collision): the all-target-
    // token doc outranks the never-in-target doc
    if (Seq("alpha", "omega", "beta", "gamma").map(bucket).distinct.size == 4)
      assert(got.find(_._1 == 1L).get._3 > got.find(_._1 == 2L).get._3)
  }
}
