package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operators for training-data curation: vocabulary
  * building, deterministic stratified capping, and per-group top-k —
  * the post-dedup steps that shape a corpus before tokenization.
  *
  * Scale notes: vocabulary is explode → partial+final hash agg (shuffle
  * bytes are O(|vocab|), not O(corpus)); stratified capping and top-k
  * are one window shuffle on the stratum key. All deterministic — no
  * RNG, no partition dependence — so reruns and engine ports agree
  * row-for-row (the property the md5 rank key buys; reference analog:
  * the reproducible-split discipline of `stableSplit`).
  */
object Corpus {

  /** Capped inverted index: token → document frequency + the top-`k`
    * postings "doc:tf" ranked (tf desc, doc_id asc) — the search-engine
    * build step over a curated corpus.
    *
    * Scale shape: tf is explode → (token, doc) partial+final hash agg;
    * the posting cap then rides a SECOND agg keyed on token alone whose
    * per-group state is the O(k) bounded heap (`TopKHeap`) with map-side
    * combine — a stopword token costs k pairs per map task, where the
    * window spelling (the oracle) would sort the full hot-token
    * partition. Shuffle bytes are O(|vocab|·k), never O(corpus).
    * doc_id is negated into the heap's id-DESC tie-break to get the
    * conventional doc-asc posting order. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Long = 1L): DataFrame = {
    val tf = df.select(col(idCol).cast("long").as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("token")
      .agg(count(lit(1)).as("df"),
        graft.expressions.TopKHeap.topKPairs(
          col("tf").cast("double"), -col("doc_id"), k).as("top"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df"),
        array_join(transform(col("top"), p =>
          concat((-p.getField("id")).cast("string"), lit(":"),
            p.getField("score").cast("long").cast("string"))), ",")
          .as("postings"))
  }

  /** Global token-frequency vocabulary: the `k` most frequent whitespace
    * tokens of the lowercased corpus with stable tie-break (count desc,
    * token asc). At 100 TB this is the canonical map-side-combine shape:
    * per-partition partial counts, one shuffle of O(|vocab|) rows. */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** EXACT global heavy hitters in two corpus scans with bounded memory
    * everywhere — the pattern for "which tokens exceed x% of a 100 TB
    * corpus" where a plain groupBy would shuffle O(|vocab|) rows and
    * [[vocabulary]]'s top-k needs a global sort of them.
    *
    * Pass 1 runs Misra-Gries(`capacity`) per partition (mapPartitions —
    * genuinely imperative per-partition state, the documented last-resort
    * case) and emits each partition's ≤`capacity` (token, est) counters
    * plus one (null, n_p) total row: O(partitions × capacity) rows total,
    * independent of corpus size. Their token-summed estimates undercount
    * a true count by at most slack = N/(capacity+1) (each MG decrement
    * consumes capacity+1 token occurrences), so
    * `est_sum >= threshold − slack` is a PROVABLY COMPLETE candidate
    * filter for `count >= threshold`, and the candidate set has at most
    * N/(threshold − slack) members — broadcast-sized by construction
    * (no driver collect; the semi-join broadcasts the filtered frame).
    * Pass 2 exact-counts ONLY the candidates (scan + semi-join +
    * O(candidates) agg) and applies the threshold to the exact counts —
    * the result is therefore exact and partitioning-independent, which
    * is what puts a sketch-pruned operator under the DuckDB hash gate.
    *
    * @param thresholdPpm heaviness cutoff in parts-per-million of the
    *   total token count N: heavy ⟺ count >= max(N·ppm/1e6, 1). Must
    *   satisfy ppm·(capacity+1) > 1e6 (checked, plus the exact runtime
    *   form) or candidate completeness is lost.
    * @return (token, cnt) — every token with exact cnt >= threshold */
  def heavyHitters(df: DataFrame, textCol: String, thresholdPpm: Long,
      capacity: Int = 4096): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      "thresholdPpm must be in (0, 1e6]")
    require(thresholdPpm * (capacity + 1L) > 1000000L,
      s"capacity $capacity too small for thresholdPpm $thresholdPpm: " +
        "need ppm*(capacity+1) > 1e6 for the completeness guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    def toks = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    val cap = capacity
    val summaries = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val t = it.next(); n += 1
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None if counts.size < cap => counts.update(t, 1L)
          case None => // decrement-all eviction; amortized O(1)/token
            counts.mapValuesInPlace((_, v) => v - 1)
            counts.filterInPlace((_, v) => v > 0)
        }
      }
      Iterator.single((null: String, 0L, n)) ++
        counts.iterator.map { case (t, c) => (t, c, 0L) }
    }.toDF("token", "est", "pn")
      .groupBy("token").agg(sum("est").as("est"), sum("pn").as("pn"))
      .localCheckpoint(true) // P·capacity rows, computed once
    val n = summaries.agg(sum("pn")).first().getLong(0)
    val threshold = math.max(n * thresholdPpm / 1000000L, 1L)
    val slack = n / (capacity + 1L)
    require(threshold > slack,
      s"threshold $threshold <= slack $slack at N=$n — raise capacity")
    val cand = summaries
      .filter(col("token").isNotNull && col("est") >= threshold - slack)
      .select("token")
    toks.join(broadcast(cand), Seq("token"), "semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Per-document distinctive terms: top-`k` tokens per doc scored by
    * tf × (N / df). The idf factor is the rational N/df rather than
    * ln(N/df): ranking stays tf-idf-monotone per document for fixed tf,
    * and the score is pure per-row multiply/divide — bit-identical
    * across engines, where libm `ln` implementations differ in the last
    * ulp and would break exact verification. Shape at scale: partial-agg
    * shuffle for tf (O(doc·distinct-token) rows), token-keyed agg for df
    * (O(|vocab|)), a token-keyed join back (AQE broadcasts the df side
    * when the vocabulary is small), one doc-keyed window. Nothing
    * quadratic, everything map-side combined. */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, broadcastDf: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
    // Materialize tf ONCE: both consumers (the df count and the score
    // join) read the checkpointed distinct-pair table. Without this the
    // two branches prune columns differently, the exchanges stop being
    // identical, and the plan re-explodes the ENTIRE corpus a second
    // time just to count document frequencies (observed in PLANS.md).
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq0 = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // df is vocabulary-sized — broadcast it explicitly (checkpointed
    // inputs have no stats, so AQE can't be relied on to pick this) and
    // the posting table never shuffles by token, which also sidesteps
    // stopword skew. Pass broadcastDf=false for extreme vocabularies
    // (≫10⁸ distinct tokens) to fall back to a shuffle join.
    val dfreq = if (broadcastDf) broadcast(dfreq0) else dfreq0
    val nDocs = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token")).crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * (col("n_docs").cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** Deterministic Bernoulli sample: keep rows whose md5-derived uniform
    * in [0, 2³²) falls below rate·2³². No RNG state — the kept set is
    * identical across engines, reruns, partitionings and cluster sizes,
    * and it composes (rate 0.5 of rate 0.2 = the same rows every time).
    * The standard reproducible-downsampling step for corpus curation. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(md5Uniform(idCol) < rateThreshold(rate))

  /** The portable md5 uniform in [0, 2³²) and its exact-long rate
    * threshold — the cross-engine determinism contract shared by every
    * sampling operator (DuckDB spelling:
    * `('0x'||substr(md5(CAST(id AS VARCHAR)),1,8))::BIGINT`). One
    * definition on purpose: a drift between copies would silently break
    * the documented nesting/composition guarantees. */
  private def md5Uniform(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("bigint")
  private def rateThreshold(rate: Double): Long = (rate * 4294967296.0).toLong

  /** Deterministic weighted (importance) Bernoulli sample: keep each row
    * with probability weight/max(weight) — the "sample proportional to
    * document length / quality score" curation step, where long or
    * high-value documents must survive downsampling more often than
    * short ones. The acceptance test is ALL-INTEGER
    * (`u32 · maxW < w · 2³²`), so the kept set is bit-identical across
    * engines, reruns and partitionings; no float RNG, no pow/ln.
    * Contract: integer weights in [0, 2³¹) — keeps both products inside
    * a 64-bit long. The global max is one scalar agg broadcast back
    * (never a global window, which would single-partition the table).
    * Composes with [[hashSample]]/[[mixtureSample]] (same uniform):
    * raising a row's weight can only keep it, never drop it. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val mx = df.agg(max(col(weightCol).cast("long")).as("__mxw"))
    df.crossJoin(broadcast(mx))
      .filter(md5Uniform(idCol) * col("__mxw") <
        col(weightCol).cast("long") * lit(4294967296L))
      .drop("__mxw")
  }

  /** Deterministic mixture sampling: per-group Bernoulli rates (the
    * "hit a target source mixture" curation step — web at 100%, forums
    * at 25%, …). Same md5 uniform as [[hashSample]], with the threshold
    * chosen per row by `groupCol`; thresholds are computed driver-side
    * as exact longs (never a runtime double→int cast, which truncates in
    * Spark but rounds in other engines). Composes with [[hashSample]]:
    * the kept set is identical across engines, reruns and partitionings,
    * and a row kept at rate r is kept at every rate ≥ r — so mixture
    * weights can be re-tuned and old samples remain subsets. Pure
    * scan-stage filter: no shuffle, no join, pushdown-friendly. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(md5Uniform(idCol) < threshold)
  }

  /** Deterministic stratified cap: keep at most `cap` rows per stratum,
    * chosen by md5 of the id (a reproducible pseudo-random order, so the
    * kept subset is unbiased but stable across runs/engines/cluster
    * sizes). The standard "cap documents per domain" step. */
  def stratifiedCap(df: DataFrame, idCol: String, strataCols: Seq[String],
      cap: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Top-k rows per group by an explicit sort (rank attached). One
    * window shuffle; with AQE the skewed-group case splits fine. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Mixture epoch balancing: per-source token budgets for an
    * epoch-repeated training mixture — the static "how many times do we
    * repeat each source so every source contributes its target share"
    * computation (the deployment-side complement of [[mixtureSample]]:
    * sampling DOWN-weights over-represented sources, epoch repeats
    * UP-weight scarce ones). For each `groupCol` value: document count,
    * token count, the exact repeat factor `ceil(max_toks / toks)` that
    * lifts it to the largest source's budget, the resulting effective
    * token count, and its pre-balance corpus share in ppm. ALL-INTEGER
    * (ceil as `(a + b - 1) div b`, share as `toks·10⁶ div total`) — no
    * float proportions, so the emitted plan is bit-identical across
    * engines and reruns.
    *
    * Scale shape: ONE corpus scan into a per-source partial+final agg
    * (O(#sources) rows), then a 1-row global agg broadcast back as the
    * scalar pair (max_toks, total) — never a global window over the
    * source table, never a second scan. At 100 TB the scan dominates;
    * everything after it is metrics-sized. */
  def mixtureEpochs(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val per = docs.select(col(groupCol),
        size(TextFunctions.tokens(lower(trim(col(textCol))))).cast("long")
          .as("__nt"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_toks"))
    val tot = per.agg(max(col("n_toks")).as("__mx"), sum(col("n_toks")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("n_toks"),
        // integer `div`, NOT `/`: Column./ is double division in Spark
        // (would round-trip through a double and disagree with DuckDB's
        // `//` above 2⁵³), while `div` is exact 64-bit in both engines
        expr("(__mx + n_toks - 1) div n_toks").as("repeats"),
        col("__mx"), col("__tot"))
      .withColumn("eff_toks", col("n_toks") * col("repeats"))
      .withColumn("share_ppm", expr("(n_toks * 1000000) div __tot"))
      .drop("__mx", "__tot")
  }

  /** Collocation extraction: adjacent token pairs whose observed count
    * beats independence by at least `liftNum/liftDen` — the corpus step
    * that surfaces multi-word terms ("new york") before tokenizer
    * training. Scoring is LIFT, the exp of PMI under the unigram-space
    * convention: lift(x,y) = c_xy·N / (c_x·c_y) with N = total token
    * occurrences. The threshold is applied by exact integer
    * cross-multiplication (c_xy·N·liftDen ≥ liftNum·c_x·c_y) — no
    * log(), no float division, so the selected pair set is bit-identical
    * in any engine (the same reason tfIdfTopK uses rational idf).
    *
    * Scale shape: two partial-agg shuffles (bigram counts O(|bigram
    * vocab|), unigram counts O(|vocab|)); the unigram table and the
    * 1-row total are broadcast into the bigram stream, which never
    * re-shuffles. Products stay < 2⁶³ while c_xy·N·liftDen < 9·10¹⁸ —
    * at larger corpora scale the counts down or move to DECIMAL.
    *
    * Output: w1, w2, c_xy, c_x, c_y, n_uni (counts kept so downstream
    * can re-rank with any PMI variant without rescanning the corpus). */
  def collocations(df: DataFrame, textCol: String, minPairCount: Long,
      liftNum: Long, liftDen: Long = 1L): DataFrame = {
    val toks = df.select(TextFunctions.tokens(lower(trim(col(textCol)))).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w")).filter(col("w") =!= "")
    val uniCnt = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val nUni = uni.agg(count(lit(1)).as("n_uni"))
    val bi = toks
      .select(explode(graft.expressions.TextHash.adjacentPairs(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairCount)
      .select(split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"), col("c_xy"))
    bi.join(broadcast(uniCnt.select(col("w").as("w1"), col("c").as("c_x"))), Seq("w1"))
      .join(broadcast(uniCnt.select(col("w").as("w2"), col("c").as("c_y"))), Seq("w2"))
      .crossJoin(broadcast(nUni))
      .filter(col("c_xy") * col("n_uni") * lit(liftDen) >=
        lit(liftNum) * col("c_x") * col("c_y"))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "n_uni")
  }

  /** Bigram language-model quality score — the perplexity-style filter
    * of a training-data pipeline (docs whose word transitions are
    * improbable under the corpus's own bigram statistics are boilerplate
    * / gibberish candidates), in EXACT integer arithmetic so the score
    * is hash-identical cross-engine. Model: add-one-smoothed bigram
    * conditionals over the whole corpus,
    * `ppm(w1 w2) = (10⁶ · (c(w1,w2)+1)) div (c(w1,·)+V)` where
    * `c(w1,·)` is the bigram-prefix count and V the corpus vocabulary
    * size; a doc's `lm_ppm` is the k-weighted mean ppm over its
    * adjacent pairs (integer div — no float ever enters).
    *
    * Scale shape: pairs reduce map-side to per-(doc, bigram)
    * multiplicities; the global bigram table derives from THAT (one
    * extra vocab²-bounded partial agg, never a second corpus scan);
    * scoring is one shuffle join keyed on bigram (both sides already
    * bigram-keyed) plus a vocab-sized broadcast of prefix counts and a
    * 1-row vocab count; the final per-doc agg is the only other
    * exchange. Docs with < 2 tokens have no pairs and are absent —
    * both engines agree.
    *
    * @return (doc_id, n_pairs, lm_ppm) */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(lower(trim(col(textCol)))).as("toks"))
    val docBi = toks
      .select(col(idCol),
        explode(graft.expressions.TextHash.adjacentPairs(col("toks"))).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("k"))
    val biCnt = docBi.groupBy("bigram").agg(sum("k").as("c_xy"))
    val preCnt = biCnt
      .select(split(col("bigram"), " ").getItem(0).as("w1"), col("c_xy"))
      .groupBy("w1").agg(sum("c_xy").as("c_x"))
    val vocab = toks.select(explode(col("toks")).as("w"))
      .filter(col("w") =!= "").agg(count_distinct(col("w")).as("v"))
    docBi
      .join(biCnt, Seq("bigram"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(broadcast(preCnt), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("ppm",
        expr("(1000000 * (c_xy + 1)) div (c_x + v)"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_pairs"),
        sum(col("k") * col("ppm")).as("wsum"))
      .select(col(idCol), col("n_pairs"),
        expr("wsum div n_pairs").as("lm_ppm"))
  }

  /** Benchmark decontamination: for every probe document, how much of
    * it is CONTAINED in a benchmark corpus — the n-gram containment
    * check run before training so eval sets don't leak into the
    * training mix (the C4/Pile decontamination discipline). Asymmetric
    * by design: containment of the DOC in the benchmark (n_hit /
    * n_grams), not symmetric overlap ([[graft.operators.Dedup]] covers
    * near-dup; q97 covers corpus-pair overlap).
    *
    * Scale shape: per-doc gram sets are built MAP-SIDE
    * (`array_distinct` on the shingle array before explode — no
    * corpus-wide distinct shuffle), the benchmark gram set is distinct
    * grams of the (small by nature) benchmark corpus and is BROADCAST
    * into a left join marking hits, and the only shuffle is the
    * (doc_id) count partial-agg. A 100 TB probe corpus streams through
    * scan → broadcast-probe → partial agg with zero wide exchanges.
    * Portable md5 gram family ⇒ hash-exact oracle. Docs shorter than
    * `shingleSize` tokens have no grams and are absent from the output
    * (both engines agree: exploding an empty gram list yields no rows).
    *
    * @param thresholdPpm containment flag threshold in ppm of the
    *        doc's distinct grams (integer arithmetic — no float
    *        division crosses the engine boundary)
    * @return (id, n_grams, n_hit, contaminated) one row per probe doc
    *         with >= 1 gram */
  def benchmarkContamination(probe: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchTextCol: String,
      shingleSize: Int = 8, thresholdPpm: Long = 200000L): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column], text: String): DataFrame =
      df.select(keep :+ explode(array_distinct(
        graft.expressions.TextHash.shingleHashes31(col(text), shingleSize)))
        .as("__g"): _*)
    val bench = grams(benchmark, Nil, benchTextCol)
      .select(col("__g")).distinct().withColumn("__hit", lit(1L))
    grams(probe, Seq(col(idCol)), textCol)
      .join(broadcast(bench), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("contaminated",
        (col("n_hit") * 1000000L >= lit(thresholdPpm) * col("n_grams"))
          .cast("int"))
  }

  /** First-seen n-gram novelty curve — the marginal-value telemetry a
    * crawl / training-mix pipeline tracks as data accumulates: bucket
    * the corpus by ingest order (`idCol div bucketSize`) and report,
    * per bucket, the distinct gram occurrences it contributes and the
    * fraction never seen in any earlier document. A flattening curve
    * is the "additional data is redundant" signal that gates further
    * ingestion from a source. (Reference analog: incremental-load
    * accounting, dataengineering/airflow/bitquery.py sync windows.)
    *
    * Scale shape: per-doc gram sets build MAP-SIDE (`array_distinct`
    * before explode — no corpus-wide distinct shuffle) over the
    * portable md5-31 gram family. First-seen attribution is a
    * PARTIAL-AGG `groupBy(gram).agg(min(id))` — never a gram-keyed
    * window: a window's `partitionBy(gram)` puts each gram's FULL
    * document-frequency partition on one task, and at 100× a stopword
    * bigram's partition is corpus-sized (the skewed-key straggler the
    * Profile/Expand lesson warns about). The partial agg collapses hot
    * grams map-side, so the gram exchange carries O(distinct grams)
    * rows regardless of df skew. `n_new` per bucket then needs NO join
    * back to the pairs: it is exactly the count of grams whose
    * first-seen id falls in the bucket — a second bucket-keyed partial
    * agg over the gram-min table. The (bucket, n_grams) side is its
    * own partial agg over the pairs, and the two bucket tables meet in
    * a bucket-count-sized join. Recomputing the scan+shingle stage for
    * the two branches is deliberate: the upstream is pure scan-stage
    * expression work, and materializing corpus-sized (id, gram) pairs
    * would cost more at 100 TB than a second columnar scan. Integer
    * ppm keeps the ratio hash-exact cross-engine.
    *
    * @return (bucket, n_grams, n_new, novelty_ppm) ordered by bucket */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 2, bucketSize: Long = 50L): DataFrame = {
    require(shingleSize >= 1, "shingleSize must be >= 1")
    require(bucketSize >= 1, "bucketSize must be >= 1")
    val pairs = docs.select(col(idCol).cast("long").as("__id"),
      explode(array_distinct(graft.expressions.TextHash.shingleHashes31(
        col(textCol), shingleSize))).as("__g"))
    val perBucket = pairs
      .groupBy(expr(s"__id div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_grams"))
    val newPerBucket = pairs.groupBy(col("__g"))
      .agg(min(col("__id")).as("__first"))
      .groupBy(expr(s"__first div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    perBucket.join(newPerBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("n_grams"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty_ppm", expr("(n_new * 1000000) div n_grams"))
      .orderBy("bucket")
  }

  /** Exact total-variation distance between each group's unigram token
    * distribution and the whole corpus's — the composition-drift score
    * a dataset release tracks per source / per snapshot (TV is the
    * integer-exact sibling of KL divergence: ½·Σ_t |p_g(t) − p(t)|,
    * no logarithms, so the statistic replays exactly cross-engine
    * where KL's floating log cannot). Tokens PRESENT in the corpus but
    * ABSENT from a group contribute their full p(t) mass — dropping
    * them (the sparse-join formulation) understates drift for small
    * sources. The dense vocab × groups grid is NOT materialized: an
    * absent token's term is exactly c_t·N_g, so the absent mass
    * telescopes to N_g·(N − Σ_present c_t) — one arithmetic correction
    * per group instead of a grid join (the first cut of this operator
    * built the grid and Catalyst broadcast the full (group, token)
    * counts table into it — a vocab-sized broadcast at 100 TB).
    *
    * Scale shape: ONE (group, token)-keyed partial+final count agg is
    * the only corpus-sized exchange; it is localCheckpointed once and
    * feeds three branches (token margins, group margins, the deviation
    * join — the shared-branch rule). The deviation join is keyed by
    * TOKEN over present pairs only, O(distinct pairs); group margins
    * are a genuinely group-sized BROADCAST. All products ride
    * DECIMAL(38,0) ≙ DuckDB HUGEINT; one truncating div per group at
    * the very end.
    *
    * @return (groupCol, n_tokens, tv_ppm) — drift in [0, 1e6] */
  def tokenMixDrift(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val counts = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__s"),
        explode(TextFunctions.tokens(lower(trim(col(textCol))))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__s", "__t").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val tokTot = counts.groupBy("__t").agg(sum("__c").as("__ct"))
    val grpTot = counts.groupBy("__s").agg(sum("__c").as("__ns"))
    val total = tokTot.agg(sum("__ct").cast("decimal(38,0)").as("__n"))
    counts.join(tokTot, Seq("__t"))
      .join(broadcast(grpTot), Seq("__s"))
      .crossJoin(broadcast(total))
      .groupBy(col("__s").as(groupCol))
      .agg(max(col("__ns")).as("n_tokens"),
        sum(abs(col("__c").cast("decimal(38,0)") * col("__n") -
          col("__ct").cast("decimal(38,0)") * col("__ns"))).as("__devp"),
        sum(col("__ct").cast("decimal(38,0)")).as("__ctp"),
        max(col("__ns").cast("decimal(38,0)")).as("__nsd"),
        max(col("__n")).as("__nd"))
      .select(col(groupCol), col("n_tokens"),
        expr("CAST(((__devp + __nsd * (__nd - __ctp)) * 1000000) " +
          "div (2 * __nsd * __nd) AS BIGINT)").as("tv_ppm"))
  }

  /** Boilerplate detection by sentence document-frequency — the
    * C4/RefinedWeb cleaning step: a sentence appearing verbatim in many
    * documents (headers, footers, cookie banners, license blurbs) is
    * template noise, and a training mix wants to know how much of each
    * source it is. Sentences split on `[.!?]+`, trim, hash with the
    * PORTABLE md5-32 family (DuckDB: `('0x'||substr(md5(s),1,8))
    * ::BIGINT`); a sentence is boilerplate when its df — distinct
    * documents containing it — reaches `minDf`. Per group: doc count,
    * total/boilerplate chars, corpus-level boilerplate ppm, and the
    * count of documents that are MOSTLY boilerplate (>50% of chars).
    * Documents with no non-empty sentence drop out of n_docs.
    *
    * Scale shape: sentence split + hash are scan-stage; ONE
    * (doc, sentence-hash) partial agg is the corpus-sized exchange,
    * localCheckpointed because it feeds BOTH the df pass and the
    * ratio pass (shared-branch rule). The df agg shuffles O(distinct
    * sentences) after map-side combine; the flag join is hash-keyed
    * (AQE handles a viral sentence's skew); rollups are group-sized.
    *
    * @return (groupCol, n_docs, total_chars, boiler_chars,
    *         n_mostly_boiler, boiler_ppm) */
  def boilerplate(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, minDf: Long): DataFrame = {
    require(minDf >= 2, "minDf < 2 would flag every sentence")
    val sent = docs.select(col(idCol).as("__id"), col(groupCol).as("__g"),
        explode(split(col(textCol), "[.!?]+")).as("__s0"))
      .select(col("__id"), col("__g"), trim(col("__s0")).as("__s"))
      .filter(col("__s") =!= "")
    val perDocHash = sent.select(col("__id"), col("__g"),
        conv(substring(md5(col("__s").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("__h"),
        length(col("__s")).cast("long").as("__ch"))
      .groupBy("__id", "__g", "__h")
      .agg(sum(col("__ch")).as("__chars"))
      .localCheckpoint(true)
    val flagged = perDocHash.groupBy("__h")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__h"), lit(1L).as("__b"))
    perDocHash.join(flagged, Seq("__h"), "left")
      .groupBy("__id", "__g")
      .agg(sum(col("__chars")).as("__tot"),
        sum(when(col("__b").isNotNull, col("__chars")).otherwise(0L))
          .as("__boiler"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tot")).as("total_chars"),
        sum(col("__boiler")).as("boiler_chars"),
        sum(when(col("__boiler") * 2 > col("__tot"), 1L).otherwise(0L))
          .as("n_mostly_boiler"))
      .withColumn("boiler_ppm",
        expr("(boiler_chars * 1000000) div total_chars"))
  }

  /** Content-defined chunking + storage-dedup accounting — the
    * rsync/LBFS/backup-dedup primitive applied to corpus curation: cut
    * each document into variable-size chunks at CONTENT-DETERMINED
    * boundaries (after any token whose portable md5-32 hash ≡ 0 mod
    * `modulus`, expected chunk ≈ `modulus` tokens), so shared passages
    * produce IDENTICAL chunks regardless of how edits shift their
    * byte offsets — the property fixed-size chunking lacks and the
    * reason CDC is the standard for dedup storage. Reported per group:
    * chunk count, distinct-chunk count, and duplicated-chunk ppm (the
    * redundancy a chunk-level store would reclaim).
    *
    * Scale shape: tokenize, boundary selection, chunk assembly and
    * chunk hashing are ALL per-row array expressions in the scan stage
    * (the HOF lambdas evaluate interpreted — per-token md5 is the
    * honest cost, linear in corpus bytes); the only exchange is the
    * (group, chunk-hash) partial+final agg, O(distinct chunks) after
    * map-side combine. Cut positions use INT arrays (per-doc token
    * counts bound by 2³¹ — a 2-billion-token single document is not a
    * document). DuckDB replays the identical cut rule via md5 +
    * list_filter, so the whole pipeline is oracle-checkable.
    *
    * @return (groupCol, n_chunks, n_distinct, dup_ppm) */
  def cdcChunkDedup(docs: DataFrame, groupCol: String, textCol: String,
      modulus: Int = 16): DataFrame = {
    require(modulus >= 2, "modulus < 2 cuts after every token")
    val hashed = docs
      .select(col(groupCol).as("__g"),
        expr(s"split(lower(trim($textCol)), '\\\\s+')").as("__toks"))
      .withColumn("__cuts", expr(
        "concat(array(0), filter(sequence(1, size(__toks)), " +
          "i -> CAST(conv(substring(md5(CAST(element_at(__toks, i) AS " +
          s"BINARY)), 1, 8), 16, 10) AS BIGINT) % $modulus = 0), " +
          "array(size(__toks)))"))
      .select(col("__g"), explode(expr(
        "transform(sequence(1, size(__cuts) - 1), " +
          "j -> concat_ws(' ', slice(__toks, element_at(__cuts, j) + 1, " +
          "element_at(__cuts, j + 1) - element_at(__cuts, j))))"))
        .as("__chunk"))
      .filter(col("__chunk") =!= "")
      .select(col("__g"),
        conv(substring(md5(col("__chunk").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("__h"))
    hashed.groupBy("__g", "__h").agg(count(lit(1)).as("__c"))
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__c")).as("n_chunks"),
        count(lit(1)).as("n_distinct"))
      .withColumn("dup_ppm",
        expr("((n_chunks - n_distinct) * 1000000) div n_chunks"))
  }

  /** Winnowed document fingerprints (the MOSS local fingerprinting
    * scheme): hash every word `n`-gram, slide a window over `w`
    * consecutive gram hashes, keep each window's minimum — rightmost
    * occurrence on ties — and emit the distinct selected (position,
    * hash) pairs per document. The winnowing guarantee: any two
    * documents sharing a run of `w + n − 1` tokens share at least one
    * fingerprint, while only ~2/(w+1) of all grams are kept — the
    * sub-linear sketch that powers plagiarism / near-clone detection
    * over corpora too big for full shingle sets. (Reference analog:
    * content fingerprinting for dedup staging,
    * dataengineering/clickhouse/v1/utils.py:214-266.)
    *
    * Scale shape: gram construction and hashing are SCAN-STAGE
    * expression work (no shuffle); the only exchange is the per-doc
    * window partitioning on `idCol`, and the output is ~2·grams/(w+1)
    * rows per doc — a 100 TB corpus streams scan → window → distinct
    * with one doc-keyed shuffle. The rightmost-on-ties rule is encoded
    * arithmetically so ONE `min` window aggregate implements the full
    * tie-break: key = hash·2³² + (2³²−1 − pos) makes the window min the
    * smallest hash with the LARGEST position. Portable md5-31 gram
    * hashes (same family as [[graft.expressions.TextHash.shingles31]])
    * keep the whole pipeline integer-exact cross-engine.
    *
    * @param n gram width in tokens; @param w winnowing window in grams
    * @return (idCol, pos, fp) — selected gram start positions
    *         (0-based) and their 31-bit fingerprints */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1, "gram width must be >= 1")
    require(w >= 2, "winnow window must be >= 2")
    val grams = docs
      .select(col(idCol),
        TextFunctions.tokens(lower(trim(col(textCol)))).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> named_struct(" +
          s"'pos', i, 'g', concat_ws(' ', slice(toks, i + 1, $n))))"))
        .as("pg"))
      .select(col(idCol), col("pg.pos").as("pos"),
        expr("CAST(conv(substring(md5(pg.g), 1, 8), 16, 10) AS BIGINT)" +
          " % 2147483647").as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .select(col(idCol), col("pos"),
        min(col("h") * 4294967296L + (lit(4294967295L) - col("pos")))
          .over(win).as("mk"))
      .filter(col("pos") >= w - 1)
      .select(col(idCol), col("mk")).distinct()
      .select(col(idCol),
        (lit(4294967295L) - col("mk") % 4294967296L).as("pos"),
        expr("mk div 4294967296").as("fp"))
  }

  /** Near-clone candidate pairs from winnowed fingerprints: documents
    * sharing at least `minShared` distinct [[winnowedFingerprints]]
    * values, after dropping "stop fingerprints" that occur in more than
    * `maxDf` documents (boilerplate phrases carry no clone signal and
    * are the only source of hot buckets). (Reference analog: staging
    * near-duplicate candidates for manual review,
    * dataengineering/clickhouse/v1/utils.py:214-266.)
    *
    * Scale shape: the fingerprint sketch is ~2/(w+1) of the gram
    * stream; the df filter is one fp-keyed partial-agg shuffle whose
    * output is vocabulary-sized; the self-join is BLOCKED on fp with
    * every bucket provably ≤ maxDf docs, so the pair explosion is
    * bounded at maxDf²/2 per fingerprint BEFORE it happens — no cap
    * that silently drops recall (contrast CollectLongPairsCapped),
    * which is what keeps the operator oracle-exact. One final
    * (id_a, id_b) agg shuffle counts shared prints.
    *
    * @return (id_a, id_b, shared) with id_a < id_b */
  def winnowedNearClonePairs(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 8): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDf >= 2, "maxDf must allow at least one pair")
    // The fingerprint sketch feeds three plan branches (df counts, the
    // semi-filter, both self-join sides) — materialize it ONCE or the
    // md5 window pipeline re-executes per branch (2.04 s → 1.78 s min
    // at sf0.1). The checkpoint is sketch-sized (~2/(w+1) of the gram
    // stream), the same storage class the LSH family pays.
    val fps = winnowedFingerprints(docs, idCol, textCol, n, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
      .localCheckpoint(true)
    val kept = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val blocked = fps.join(kept, "fp")
    blocked.as("x").join(blocked.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** BM25 relevance scores for a FIXED query-term set, in exact integer
    * parts-per-million — the lexical-retrieval ranking half of a hybrid
    * (BM25 + embedding) retrieval pipeline. Classic Okapi shape with a
    * rational IDF (plus-one odds ratio `(N − df + 1)/(df + 1)` instead
    * of its log — keeps every step in exact integer arithmetic (the
    * two wide products route through DECIMAL(38,0), matching DuckDB's
    * HUGEINT promotion, so neither engine can wrap 64 bits at any
    * corpus size), so the ranking is bit-reproducible cross-engine;
    * the log is monotone in the odds ratio, so top-k ORDER is the
    * classic one for any single term and the blend differs only in how
    * multi-term scores mix).
    *
    * Scale shape: per-term tf columns are scan-stage `filter(toks, …)`
    * expressions (the query is a handful of literals — NO explode, NO
    * token shuffle); corpus stats (N, integer avg length, per-term df)
    * are ONE single-row aggregate broadcast back over the scan. Total
    * exchanges: the 1-row stats agg. A 100 TB corpus is scored in one
    * pass.
    *
    * @param queryTerms lowercase alphanumeric tokens (literal-injected)
    * @return (idCol, score_ppm) for docs containing ≥ 1 query term */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1Milli: Long = 1200L,
      bMilli: Long = 750L): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.forall(_.matches("[a-z0-9]+")),
      "query terms must be lowercase alphanumeric tokens")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      "k1Milli >= 0 and bMilli in [0, 1000]")
    val idx = queryTerms.indices
    val d = docs.select(col(idCol),
        TextFunctions.tokens(lower(trim(col(textCol)))).as("toks"))
      .select(Seq(col(idCol), size(col("toks")).cast("long").as("len")) ++
        idx.map(i => expr(
          s"CAST(size(filter(toks, x -> x = '${queryTerms(i)}')) AS BIGINT)")
          .as(s"tf$i")): _*)
    val aggs = Seq(count(lit(1)).as("n"),
      expr("sum(len) div count(1)").as("avglen")) ++
      idx.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val st = d.agg(aggs.head, aggs.tail: _*)
    val scored = d.join(broadcast(st))
      .withColumn("nm",
        lit(1000L - bMilli) + expr(s"($bMilli * len) div avglen"))
    // idf_ppm reaches ~1e6·n for rare terms and the tf factor ~2.2e6, so
    // their product (and the tf numerator for multi-megatoken docs) runs
    // through DECIMAL(38,0) — DuckDB computes the same products in
    // HUGEINT, and both `div`s truncate toward zero, so parity holds
    // with no 64-bit wrap on any corpus size (the former bigint product
    // overflowed ANSI at ~8M documents).
    val score = idx.map { i =>
      expr(s"""CASE WHEN tf$i > 0 THEN
        |(CAST((1000000 * (CAST(n AS DECIMAL(38,0)) - df$i + 1)) div (df$i + 1)
        |   AS DECIMAL(38,0)) *
        | ((CAST(tf$i AS DECIMAL(38,0)) * ${k1Milli + 1000L} * 1000000000) div
        |  (tf$i * 1000000 + $k1Milli * nm))) div 1000000
        |ELSE CAST(0 AS BIGINT) END""".stripMargin.replace('\n', ' '))
    }.reduce(_ + _)
    scored
      .filter(idx.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(col(idCol), score.cast("long").as("score_ppm"))
  }

  /** Reciprocal-rank fusion of retrieval rankings — the standard hybrid
    * (lexical + semantic) list merge: each ranking contributes
    * `1e6 / (kRrf + rank)` ppm for its top-`topK` items, absent items
    * contribute 0. Ties break by id ascending, so ranks (and the
    * `topK` cut) are total-ordered and bit-reproducible.
    *
    * Scale shape: each ranking reduces through `ORDER BY … LIMIT topK`
    * — Spark plans TakeOrderedAndProject (per-partition top-k heaps +
    * one driver merge of P·topK rows), never a global sort; the
    * row_number window then runs on ≤ topK rows. The fusion join is
    * topK-row-sized. Fusing corpus-scale rankings whole is never the
    * workload — retrieval fuses candidate LISTS.
    *
    * @param rankings frames with columns (id, score), higher = better
    * @return (id, rank0…rankN-1, rrf_ppm); absent ranks are 0 */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Long = 60L,
      topK: Int = 100): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(topK >= 1 && kRrf >= 1, "topK and kRrf must be >= 1")
    val ranked = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("id"), col("score"))
        .orderBy(col("score").desc, col("id")).limit(topK)
        .select(col("id"), row_number().over(
          Window.orderBy(col("score").desc, col("id"))).as(s"rank$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val idxs = rankings.indices
    val rrf = idxs.map(i =>
      coalesce(expr(s"1000000 div ($kRrf + rank$i)"), lit(0L)))
      .reduce(_ + _)
    joined.select(Seq(col("id")) ++
      idxs.map(i =>
        coalesce(col(s"rank$i"), lit(0)).cast("long").as(s"rank$i")) :+
      rrf.cast("long").as("rrf_ppm"): _*)
  }

  /** Signed feature hashing (the hashing trick): each token lands in
    * `md5_31(token) mod bins` with a ±1 sign from an independent md5
    * nibble, giving every document a fixed-width sparse vector with
    * unbiased collisions — the vocabulary-free featurizer for linear
    * probes / classifiers at corpus scale (no vocab table, no OOV).
    * Portable md5 family keeps bins and signs identical in DuckDB.
    *
    * Scale shape: token explode is scan-stage; the only exchange is the
    * (doc, bin) partial+final agg, output ≤ bins rows per doc. No
    * vocabulary state of any size exists anywhere.
    *
    * @return (idCol, bin, v) — signed collision-summed counts */
  def hashedBagOfWords(docs: DataFrame, idCol: String, textCol: String,
      bins: Int = 64): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    docs.select(col(idCol),
        explode(TextFunctions.tokens(lower(trim(col(textCol))))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol),
        expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)" +
          s" % 2147483647 % $bins").as("bin"),
        (lit(1L) - lit(2L) *
          expr("CAST(conv(substring(md5(tok), 9, 1), 16, 10) AS BIGINT) % 2"))
          .as("sgn"))
      .groupBy(col(idCol), col("bin")).agg(sum(col("sgn")).as("v"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each RAW
    * document by how much more likely its hashed-token bag is under the
    * TARGET domain's unigram bucket distribution than under the raw
    * corpus's own —
    *
    *   dsir_fp(doc) = Σ_tok [ log2(p_target(b(tok))) − log2(p_raw(b(tok))) ]
    *
    * with add-1 smoothing per bucket. High scores = target-like docs;
    * resampling by these weights is the standard pretraining-data
    * selection recipe when the target domain is small and curated.
    *
    * log2 runs in FIXED POINT (2⁻²⁰ units): lg(x) = (e«20) +
    * ((x«20)»e) − (1«20) with e = bitlength(x) − 1 — the linear
    * interpolation between powers of two, monotone, exact at powers of
    * two, max error ~0.086 bits, and PURE 64-bit integer arithmetic
    * (`length(bin(x))`, shifts) that evaluates bit-identically in any
    * engine — a float log2 diverges in the last ulp between libms and
    * breaks hash parity. Safe for counts up to 2⁴³ (the «20 headroom).
    *
    * Scale shape: two scan-stage tokenize+bucket passes per corpus
    * (deliberately re-evaluated: at 100 TB an extra columnar scan beats
    * materializing a token-exploded corpus); bucket tables are
    * bins-row frames (checkpointed — each feeds its census and its
    * total) joined and broadcast into the per-doc agg; the per-doc
    * constant c0 rides a one-row broadcast. The only corpus-sized
    * exchange is the (doc, bucket) partial agg.
    *
    * @return per raw doc: (idCol, n_toks, dsir_fp) — dsir_fp in 2⁻²⁰
    *         log2 units, comparable across docs of similar length
    *         (normalize by n_toks for a per-token score) */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, bins: Int = 256): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    def binned(df: DataFrame): DataFrame = df
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(trim(col(textCol))))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol),
        expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)" +
          s" % 2147483647 % $bins").as("b"))
    // fixed-point log2 over a named BIGINT column, spelled so DuckDB's
    // ((x << 20) >> e) replays it exactly (shiftright ≡ >> on longs)
    def lgS(x: String): String =
      s"((length(bin($x)) - 1) * 1048576 + " +
        s"shiftright(shiftleft($x, 20), length(bin($x)) - 1) - 1048576)"
    val rtk = binned(raw)
    val ttk = binned(target)
    // bins-row frames, each read twice (bucket scores + totals)
    val cr = rtk.groupBy("b").agg(count(lit(1)).as("cr"))
      .localCheckpoint(true)
    val ct = ttk.groupBy("b").agg(count(lit(1)).as("ct"))
      .localCheckpoint(true)
    // every bucket a raw doc touches exists in cr (the doc IS raw), so
    // building scores FROM cr covers the scoring join; absent target
    // buckets smooth to +1
    val bs = cr.join(ct, Seq("b"), "left")
      .withColumn("ctp", coalesce(col("ct"), lit(0L)) + lit(1L))
      .withColumn("crp", col("cr") + lit(1L))
      .select(col("b"), (expr(lgS("ctp")) - expr(lgS("crp"))).as("lg_b"))
    val c0 = cr.agg(sum("cr").as("rtot"))
      .crossJoin(ct.agg(sum("ct").as("ttot")))
      .withColumn("rp", col("rtot") + lit(bins.toLong))
      .withColumn("tp", col("ttot") + lit(bins.toLong))
      .select((expr(lgS("rp")) - expr(lgS("tp"))).as("c0"))
    rtk.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(bs), Seq("b")) // bins-bounded — licensed
      .crossJoin(broadcast(c0))
      .groupBy(idCol)
      .agg(sum("cnt").as("n_toks"),
        sum(col("cnt") * (col("lg_b") + col("c0"))).as("dsir_fp"))
  }
}
