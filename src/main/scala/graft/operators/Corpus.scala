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
}
