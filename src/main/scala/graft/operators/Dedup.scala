package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact, MinHash-LSH,
  * SimHash and n-gram-Jaccard near-dup detection.
  *
  * Reference analog: the reference deduplicates storage-side with
  * `OPTIMIZE TABLE … FINAL DEDUPLICATE` per month partition
  * (`clickhouse/v1/utils.py:159-193`, SURVEY.md §2.9 D1/D2); here the same
  * semantics are `dropDuplicates`/groupBy over natural keys, extended with
  * the near-dup family a 100 TB text corpus needs.
  *
  * Scale design:
  *  - exact dedup = one hash shuffle on the (hashed) key, never on the
  *    full text — group on a 128-bit fingerprint, keep min id.
  *  - MinHash-LSH = per-row signature (narrow), explode to (band,
  *    bucket-hash) keys, shuffle on band-hash only, pair within buckets.
  *    Candidate pairs are verified with true Jaccard so false positives
  *    from banding never survive. Signature width and band count are the
  *    standard precision/recall dials (r rows × b bands, s-curve
  *    threshold ≈ (1/b)^(1/r)).
  *  - SimHash = 64-bit per-row signature; near-dups = signatures equal on
  *    all-but-k rotated bands; here exact-band match (hamming radius via
  *    multi-probe is a follow-up).
  */
object Dedup {

  /** D1 — exact duplicate groups by content fingerprint: one row per
    * distinct text with the surviving (min) id and the duplicate count.
    * Grouping on xxhash64(text) keeps shuffle rows narrow; the min-id
    * survivor rule matches "keep first". */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** D1 as a filter: keep one representative row per distinct text. */
  def dropTextDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min
    * over the document's shingle set of an independent 64-bit hash.
    * Implemented per-row with higher-order functions — no shuffle, no UDF. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingles, s => xxhash64(s, i))))

  /** MinHash-LSH candidate pairs with Jaccard verification.
    *
    * @param bands  number of LSH bands (b); rowsPerBand = numHashes / b
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    */
  def minHashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val r = numHashes / bands
    val sigs = df.select(
      col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
    // band key = hash of the band's signature slice → narrow shuffle key
    val banded = sigs.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * r + 1, lit(r)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash: 64-bit signature = sign of per-bit weighted sums of token
    * hashes. Near-dup candidates share the full signature (or a band). */
  def simHash(textCol: Column): Column = {
    val toks = array_distinct(tokens(lower(textCol)))
    val bits = (0 until 64).map { bit =>
      val contrib = aggregate(toks, lit(0L), (acc, t) =>
        acc + when(shiftright(xxhash64(t), bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(contrib >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.foldLeft(lit(0L))((acc, b) => shiftleft(acc, 1) + b)
  }

  /** n-gram Jaccard similarity join: all pairs (within an optional
    * blocking key) with word-set Jaccard ≥ threshold. O(n²) within a
    * block — callers block on cheap keys (lang, length bucket) so the
    * cross product never materializes globally. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCols: Seq[String],
      threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id") +:
      array_distinct(tokens(lower(col(textCol)))).as("tk") +:
      blockCols.map(col): _*)
    val l = base.select(col("id").as("id_a") +: col("tk").as("tk_a") +: blockCols.map(col): _*)
    val r = base.select(col("id").as("id_b") +: col("tk").as("tk_b") +: blockCols.map(col): _*)
    val joined = if (blockCols.nonEmpty) l.join(r, blockCols) else l.crossJoin(r)
    joined.filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("tk_a"), col("tk_b"))).cast("double") /
          size(array_union(col("tk_a"), col("tk_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
