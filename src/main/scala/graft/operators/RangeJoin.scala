package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast point-in-interval lookup (range join): each left row is
  * matched to the dimension interval `[lo, hi]` that contains its probe
  * value (intervals disjoint per key; IP→geo blocks, block-range→batch,
  * tier tables). Spark has no native range join — the naive spelling is
  * a cross join with a BETWEEN filter, O(|left|·|dim|).
  *
  * Realization: reuse of the custom broadcast as-of operator
  * ([[graft.plans.BroadcastAsOfJoin]]) — an interval lookup IS an as-of
  * backward join on `lo` followed by a coverage check against that
  * interval's `hi`. The probe side is never shuffled or sorted, the
  * dimension travels once as per-key sorted arrays, and each probe costs
  * one binary search: O(|left|·log|dim|) with zero exchanges.
  *
  * Left-outer semantics: probes in a gap between intervals (or beyond
  * them) surface NULL values. Requires disjoint intervals per key — for
  * overlapping intervals only the one with the greatest `lo` ≤ probe
  * matches (document order is not considered).
  */
object RangeJoin {

  def broadcastRangeLookup(
      left: DataFrame, intervals: DataFrame, probeCol: String,
      loCol: String, hiCol: String, valueCols: Seq[String],
      keyCols: Seq[String] = Nil): DataFrame = {
    require(!left.columns.contains("__hi"), "left must not contain __hi")
    // The dim projection below aliases hiCol to __hi and loCol to the
    // probe name: a keyCol/valueCol named __hi, or a valueCol that is
    // also loCol/hiCol, would produce duplicate/ambiguous columns and a
    // confusing analysis error (or a silently wrong coverage check).
    require(!keyCols.contains("__hi") && !valueCols.contains("__hi"),
      "keyCols/valueCols must not contain __hi")
    require(valueCols.forall(v => v != loCol && v != hiCol),
      "valueCols must be disjoint from loCol/hiCol")
    val dim = intervals.select(
      (keyCols.map(col) :+ col(loCol).as(probeCol) :+ col(hiCol).as("__hi")) ++
        valueCols.map(col): _*)
    val joined = AsOfJoin.asofBroadcast(left, dim, keyCols, probeCol,
      valueCols :+ "__hi")
    // as-of matched the greatest lo <= probe; a probe past that
    // interval's end sits in a gap → null out the values (left-outer)
    val covered: Column = col("__hi").isNotNull && col(probeCol) <= col("__hi")
    valueCols.foldLeft(joined)((d, v) =>
      d.withColumn(v, when(covered, col(v))))
      .drop("__hi")
  }
}
