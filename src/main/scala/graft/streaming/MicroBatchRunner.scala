package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T2-T5 — the reference's manual micro-batch loop
  * (`clickhouse/v1/operator.py:440-499` + `airflow/bitquery.py:208-351`),
  * re-expressed as a driver loop over bounded block ranges:
  *
  *   1. read state (T1)                       → SyncState.get
  *   2. advance decision w/ lag + cap (T2)    → SyncState.advance
  *   3. bounded batch read (T3)               → filter block ∈ (last, latest]
  *   4. user pipeline + sink write
  *   5. commit from the DESTINATION's max (T4) — offsets are re-derived
  *      from what actually landed, not from the loop's own counter, so a
  *      crash between write and commit replays (idempotent with dedup,
  *      T5) instead of skipping.
  *
  * This matches the reference's crash semantics exactly (SURVEY.md §7.4
  * risk 5) and is equivalent to `Trigger.AvailableNow` with
  * `maxOffsetsPerTrigger`-style admission control.
  */
object MicroBatchRunner {

  final case class BatchResult(
      ranges: Seq[(Long, Long)], batchesRun: Int, rowsWritten: Long)

  def run(
      spark: SparkSession,
      source: DataFrame,
      blockCol: String,
      state: SyncState,
      stateKey: String,
      streamingLag: Long,
      batchSize: Long,
      pipeline: DataFrame => DataFrame,
      sinkPath: String,
      maxBatches: Int = Int.MaxValue): BatchResult = {

    val head = source.agg(max(col(blockCol))).head().getLong(0)
    var st = state.get(stateKey).getOrElse(SyncStatus(-1L, "", -1L, ""))
    var ranges = Vector.empty[(Long, Long)]
    var rows = 0L
    var landedSoFar = 0L
    var n = 0
    var go = true
    while (go && n < maxBatches) {
      val (latest, proceed) = SyncState.advance(st.lastSyncedBlock, head, streamingLag, batchSize)
      go = proceed
      if (proceed) {
        val prevLast = st.lastSyncedBlock
        val batch = source.filter(col(blockCol) > prevLast && col(blockCol) <= latest)
        pipeline(batch).write.mode("append").parquet(sinkPath)
        // Count what LANDED (delta vs previous total) rather than
        // re-running the pipeline; tolerate an empty/absent sink.
        val landedNow = scala.util.Try(
          spark.read.parquet(sinkPath).count()).getOrElse(0L)
        rows += landedNow - landedSoFar
        landedSoFar = landedNow
        // The loop watermark advances to the END of the processed range —
        // an empty or fully-filtered batch must still make progress
        // (deriving it from the sink's max would loop forever on sparse
        // ranges). The destination remains the recovery authority: on a
        // crash between write and commit the state file still points at
        // the last committed range end, the batch replays, and replay
        // duplicates are handled by dedup (T5, SURVEY.md §7.4 risk 5).
        st = SyncStatus(latest, "", latest, "")
        state.put(stateKey, st)
        ranges :+= (prevLast, latest)
        n += 1
      }
    }
    BatchResult(ranges, n, rows)
  }
}
