package graft.pipelines

import graft.functions.TextFunctions
import graft.io.Layout
import graft.operators.{Corpus, Dedup, PrefixSum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data curation flagship: the operators of this engine
  * composed into the pipeline a 100 TB pretraining corpus actually runs,
  * in the order the stages are cheapest —
  *
  *   1. exact dedup        (one narrow window over the 128-bit hash)
  *   2. quality gate       (scan-stage token/stopword/repetition rules)
  *   3. near-dedup         (MinHash-LSH pairs → CC clusters → keep min)
  *   4. decontamination    (8-gram collision vs a heldout set)
  *   5. mixture sampling   (per-source md5 Bernoulli)
  *   6. split assignment   (deterministic md5 split)
  *   7. shard assignment   (distributed prefix sum over token counts)
  *   8. clustered write    (range-partitioned, sorted parquet shards)
  *
  * Cheap row-local filters run before expensive pairwise stages so the
  * quadratic work sees the smallest candidate set; every stage is
  * deterministic (md5-derived, partition-independent), so the whole
  * pipeline is reproducible corpus-in → corpus-out on any cluster size.
  * Stages mirror the oracle-checked queries (q23/q56, q25/q88, q28/q48,
  * q63, q89, q55, q94) — each piece is hash-verified individually; this
  * object is the composition a library user calls.
  */
object TrainingData {

  final case class Config(
      minTokens: Int = 20,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to"),
      minStopRatio: Double = 0.02,
      nearDupThreshold: Double = 0.10,
      heldoutNgram: Int = 8,
      mixtureRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      tokensPerShard: Long = 20000L)

  final case class Report(
      input: Long, afterExactDedup: Long, afterQuality: Long,
      afterNearDedup: Long, afterDecontamination: Long, afterMixture: Long,
      shards: Long)

  /** Full curation over a documents frame with (doc_id, text, source)
    * and a heldout frame with (text). Returns the curated frame with
    * (split, shard) attached, plus the per-stage survivor counts. */
  def curate(docs: DataFrame, heldout: DataFrame, cfg: Config = Config())
      : (DataFrame, Report) = {
    val nIn = docs.count()

    // 1. exact dedup, keep min doc_id per 128-bit content hash
    val exact = Dedup.dropTextDuplicates(docs, "doc_id", "text",
      key = Some(md5(col("text").cast("binary"))))
    val nExact = exact.count()

    // 2. row-local quality gate before any pairwise stage. Cached: the
    // gated table feeds the near-dedup pair join, the cluster semi-join
    // and the survivor count — without persistence the dedup window and
    // gate would recompute for each (same for `near`/`clean` below,
    // whose shingling passes are the expensive stages).
    val gated = exact
      .withColumn("__ntok", TextFunctions.tokenCount(col("text")))
      .filter(col("__ntok") >= cfg.minTokens &&
        TextFunctions.stopwordRatio(col("text"), cfg.stopwords) >= cfg.minStopRatio)
      .cache()
    val nQual = gated.count()

    // 3. near-dedup: LSH pairs → connected components → keep cluster min
    val pairs = Dedup.minHashNearDuplicates(gated, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 32,
      threshold = cfg.nearDupThreshold, exactVerify = false,
      portableHash = true)
    val clusters = Dedup.duplicateClusters(gated, "doc_id", pairs)
    val near = gated.join(
      clusters.filter(col("cluster_id") === col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi").cache()
    val nNear = near.count()

    // 4. decontamination vs heldout n-grams (hashes only cross the wire)
    val heldGrams = heldout.select(explode(
      graft.expressions.TextHash.shingleHashes31(col("text"), cfg.heldoutNgram))
      .as("g")).distinct()
    val clean = near.join(
      near.select(col("doc_id"), explode(graft.expressions.TextHash
        .shingleHashes31(col("text"), cfg.heldoutNgram)).as("g"))
        .join(heldGrams, Seq("g"), "left_semi").select("doc_id").distinct(),
      Seq("doc_id"), "left_anti").cache()
    val nClean = clean.count()

    // 5-6. mixture sampling + deterministic split
    val mixed = Corpus.mixtureSample(clean, "doc_id", "source",
      cfg.mixtureRates, cfg.defaultRate)
      .withColumn("split", TextFunctions.stableSplit(col("doc_id")))
    val nMix = mixed.count()

    // 7. shard = starting token offset div tokensPerShard, global order
    val sharded = PrefixSum.globalRunningSum(
      mixed.withColumn("__ntok", col("__ntok").cast("long")),
      "doc_id", "__ntok", "__cum")
      .withColumn("shard",
        expr(s"(__cum - __ntok) div ${cfg.tokensPerShard}"))
      .drop("__cum", "__ntok")
    val nShards = sharded.agg(countDistinct("shard")).head().getLong(0)

    // PrefixSum materialized `sharded` from its own cache, so the
    // working tables can be released now
    gated.unpersist(blocking = false)
    near.unpersist(blocking = false)
    clean.unpersist(blocking = false)
    (sharded, Report(nIn, nExact, nQual, nNear, nClean, nMix, nShards))
  }

  /** 8. write curated docs as range-clustered parquet: one directory per
    * split, files clustered by shard so a shard read touches one file
    * range. */
  def writeShards(curated: DataFrame, basePath: String): Unit =
    curated.select("split").distinct().collect().map(_.getString(0))
      .foreach { sp =>
        // the split lives in the directory name (Hive-style partition);
        // keeping the column in the files too would make a partition-
        // discovering read of basePath fail on the duplicate column
        val part = curated.filter(col("split") === sp).drop("split")
        val nFiles = math.max(1,
          part.agg(countDistinct("shard")).head().getLong(0).toInt / 4)
        Layout.clusteredWrite(part, s"$basePath/split=$sp",
          Seq("shard", "doc_id"), nFiles)
      }
}
