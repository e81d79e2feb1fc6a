package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream equi-join within an event-time band — the
  * Structured Streaming join discipline: an unbounded stream-stream
  * join would have to hold BOTH streams' full history as state, so
  * Spark requires (and this operator encodes) the two bounds that make
  * state finite: a watermark on each input and a time-range predicate
  * tying the two event times together. State per side is then
  * O(events inside the band + watermark horizon), dropped by the
  * runtime as the watermarks advance — never O(stream). Inner matches
  * emit in the micro-batch that completes them.
  *
  * The attribution shape (view ⋈ purchase-within-30-minutes) is the
  * canonical instance; the same call on BATCH frames degrades to a
  * plain range-predicate join (watermarks are no-ops), which is the
  * parity path the DuckDB oracle checks (q198).
  *
  * Column contract: `keyCols` must exist on both sides (right copies
  * are dropped from the output); all other columns must be
  * pre-renamed disjoint — including the two event-time columns.
  */
object StreamJoin {

  /** @param band right event time must fall in
    *        [left ts, left ts + band], e.g. "30 minutes"
    * @param joinType "inner" (default) or "left_outer" — outer rows
    *        (left events that never matched) emit with null right
    *        columns once the watermark proves no match can still
    *        arrive; Structured Streaming supports exactly this because
    *        the watermark + band bound when "never" is known */
  def bandedEquiJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      leftDelay: String, rightDelay: String, band: String,
      joinType: String = "inner"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one equi-join key")
    require(Set("inner", "left_outer")(joinType),
      "joinType must be inner or left_outer")
    val l = if (left.isStreaming) left.withWatermark(leftTs, leftDelay)
            else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, rightDelay)
            else right
    val cond: Column = keyCols.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $band")
    keyCols.foldLeft(l.join(r, cond, joinType))((df, k) => df.drop(r(k)))
  }
}
