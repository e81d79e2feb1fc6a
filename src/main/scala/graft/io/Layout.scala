package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Data-layout control for write paths: range-clustered parquet.
  *
  * At 100 TB the dominant read cost is scanning files whose row groups
  * cannot be skipped. Parquet footers carry per-column min/max, and the
  * reader prunes row groups whose range misses the pushed predicate —
  * but only if the write produced files where the filter column is
  * CLUSTERED. A hash-partitioned write scatters every value range into
  * every file (min/max spans everything, nothing prunes); a
  * range-partition + sort-within-partitions write makes file and
  * row-group ranges disjoint, so a selective filter touches O(matching)
  * bytes instead of O(corpus).
  *
  * `repartitionByRange` samples the keys to build balanced range bounds
  * (skew-tolerant, reservoir-sampled — the same machinery as a global
  * sort), and the per-partition sort makes row groups within each file
  * internally tight. This is exactly the layout discipline the
  * reference's warehouse applies via its monthly partition grain
  * (`clickhouse/v1/utils.py:159-185` ORDER BY/PARTITION BY) re-expressed
  * as a Spark write. Combine with `maxRecordsPerFile` to bound file size
  * at cluster scale.
  */
object Layout {

  /** Write `df` as parquet range-clustered on `clusterCols`:
    * `numFiles` range partitions, each sorted within. */
  def clusteredWrite(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
}
