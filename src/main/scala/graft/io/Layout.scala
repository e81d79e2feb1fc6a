package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, lit, shiftleft}

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

  /** Morton bit-spread: the low 16 bits of `c` with a zero inserted
    * between each (magic-mask doubling — pure codegen'd integer ops). */
  def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) value of two 16-bit dimensions: interleaved bits,
    * `x` on even positions, `y` on odd. Single-dim range clustering
    * (`clusteredWrite`) prunes ONE predicate column and scatters every
    * other; clustering on the z-value gives every √-proportional 2-D
    * rectangle locality in BOTH dimensions — a range filter on either
    * column maps to O(√buckets) Morton runs, so parquet min/max skips
    * most row groups for x-filters AND y-filters from one layout. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write parquet clustered on the z-order of (`xCol`, `yCol`). */
  def zorderedWrite(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("__z", zorder2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
}
