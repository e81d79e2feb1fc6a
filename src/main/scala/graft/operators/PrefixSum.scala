package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global prefix sum — the scalable spelling of
  * `sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`, which Spark
  * plans as a SINGLE-partition window (the whole dataset through one
  * task: the canonical 100 TB anti-pattern; Spark even warns
  * "No Partition Defined for Window operation").
  *
  * Three-phase classic: (1) range-repartition by the order key and sort
  * within partitions — a global sort's shuffle, nothing more; (2) one
  * pass for per-partition totals (P longs to the driver), exclusive
  * offsets by scan; (3) a map-only carry pass adds the partition offset
  * to the running local sum. Phases 2 and 3 both read the cached sorted
  * table, so the sort happens once. This is genuine per-partition
  * imperative logic (the carry), hence the one deliberate RDD hop in the
  * engine.
  *
  * The order key must be a total order (unique) for cross-run
  * determinism; `valCol` must be LongType (cast first), nulls count 0.
  */
object PrefixSum {

  def globalRunningSum(df: DataFrame, orderCol: String, valCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    require(df.schema(valCol).dataType == LongType,
      s"$valCol must be LongType (cast first)")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol).cache()
    val valIdx = sorted.schema.fieldIndex(valCol)
    val totals = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(valIdx)) s += r.getLong(valIdx))
      Iterator((i, s))
    }.collect().toMap
    val nParts = math.max(totals.keySet.maxOption.getOrElse(-1) + 1, 1)
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L)).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val outRdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        if (!r.isNullAt(valIdx)) run += r.getLong(valIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    // Materialize the carry pass eagerly (it reads the cached sort, so
    // this is one map-only job), then release the working cache — the
    // checkpointed result's blocks are reclaimed by the ContextCleaner
    // once unreferenced, where a .cache() would pin the sorted input for
    // the session lifetime across repeated invocations.
    val out = spark.createDataFrame(outRdd, sorted.schema.add(outCol, LongType))
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    out
  }
}
