package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based stream deduplication bounded by a watermark — the
  * exactly-once ingestion guard in front of every downstream operator
  * when the upstream delivers at-least-once (replayed micro-batches,
  * retried producers, the reference's replay+dedup discipline on its
  * sync loop, SURVEY §2 T5). `dropDuplicatesWithinWatermark` keeps the
  * FIRST arrival of each key and suppresses re-deliveries that arrive
  * within the watermark horizon; state for a key is dropped once the
  * watermark passes its event time + delay, so state is O(keys per
  * horizon), never O(stream) — the unbounded-state trap of plain
  * streaming `dropDuplicates` on an eternal stream.
  *
  * Contract: duplicates are only guaranteed suppressed when they
  * arrive within `delay` of the first copy's event time — size the
  * delay to the upstream's redelivery window. Re-deliveries of the
  * SAME row (identical payload) make the output deterministic; for
  * divergent payloads under one key the first arrival wins (arrival
  * order — which is why the batch-parity oracle only asserts on
  * payload-identical duplicates).
  *
  * Scale shape: one hash exchange on the dedup key into the state
  * store, micro-batch input pre-deduped map-side; the payload rides
  * the exchange once and never again. On a BATCH frame the same call
  * degrades to exact `dropDuplicates` (watermark is a no-op), which is
  * the parity path the oracle checks.
  *
  * Companion: [[StatefulDedup.firstOccurrences]] is the
  * flatMapGroupsWithState form — custom state, NO timeout, so it
  * suppresses replays across ANY horizon at O(all keys ever) state;
  * this operator is the bounded-state production default.
  */
object StreamDedup {

  /** @param keyCols  dedup identity (e.g. the event id)
    * @param tsCol    event-time TIMESTAMP column the watermark tracks
    * @param delay    redelivery horizon to hold state for ("10 minutes") */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String, delay: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one dedup key column")
    if (events.isStreaming)
      events.withWatermark(tsCol, delay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)
  }

  /** Deduped per-key rollup: the dedup feeding a downstream windowed
    * aggregate in ONE streaming plan (dedup state + agg state compose;
    * Spark chains them stage-to-stage). Batch form is the oracle's
    * parity path. */
  def dedupedCounts(events: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String, groupCol: String, valueCol: String): DataFrame =
    dedupWithinWatermark(events, keyCols, tsCol, delay)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,10)")).as("total"))
}
