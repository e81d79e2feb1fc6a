package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** D1/D2/D4 — storage maintenance (SURVEY.md §2.9).
  *
  * The reference delegates these to ClickHouse (`OPTIMIZE TABLE …
  * PARTITION … FINAL DEDUPLICATE` per YYYYMM × shard,
  * `clickhouse/v1/utils.py:159-193`; BigQuery `DELETE WHERE` flushes,
  * `bigquery/utils.py:114-128`). On a parquet lake the equivalents are
  * partition-scoped rewrite with dynamic partition overwrite — only the
  * touched partitions are replaced, never the whole table, which is the
  * property that keeps the operation feasible at 100 TB.
  */
object Maintenance {

  /** D1 whole-table dedup → D2 when `partitions` restricts the rewrite:
    * read only the named partition values, dropDuplicates on the natural
    * key, overwrite just those partitions (dynamic overwrite). */
  def dedupPartitions(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String,
      keyCols: Seq[String],
      partitions: Seq[String]): Long = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val slice = spark.read.parquet(tablePath)
      .filter(col(partitionCol).isin(partitions: _*))
    val deduped = slice.dropDuplicates(keyCols)
    val n = deduped.count()
    deduped.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(tablePath)
    n
  }

  /** D4 partition flush (`run_flush_sqls`): drop the rows matching the
    * partition predicate by overwriting those partitions with the empty
    * complement — a no-op if the table doesn't exist, like the
    * reference's absent-table guard (`bigquery/utils.py:121-124`). */
  def flushPartitions(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String,
      partitions: Seq[String]): Boolean = {
    val fs = new java.io.File(tablePath)
    if (!fs.exists()) return false
    partitions.foreach { p =>
      val dir = new java.io.File(fs, s"$partitionCol=$p")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    true
  }

  /** Monthly partition enumeration (`_YYYY_MM`, `v1/utils.py:159-170`). */
  def yyyymm(startYear: Int, endYear: Int): Seq[String] =
    for (y <- startYear to endYear; m <- 1 to 12) yield f"$y$m%02d"
}
