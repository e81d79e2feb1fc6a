package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the canonical
  * Structured Streaming realization (`readStream` → watermark → window
  * groupBy → `writeStream`) of the batch per-window rollups the
  * reference schedules as periodic queries (SURVEY §1: the cron'd
  * per-interval aggregation jobs). In append mode a window emits
  * exactly once, when the event-time watermark passes `window.end +
  * delay` — so a downstream sink sees each (window, key) row once,
  * final, which is what makes the stream a drop-in for the nightly
  * batch rollup it replaces.
  *
  * Scale shape: Spark keeps ONE state row per open (window, keys)
  * group in the state store, partial-aggregates micro-batch input
  * map-side before the state update, and DROPS state as the watermark
  * closes windows — state is O(open windows × keys), never O(stream).
  * Late events beyond the watermark are discarded by the runtime, not
  * by user code. The sum is an exact DECIMAL(28,10) (the cross-engine
  * determinism discipline — float stream sums drift by arrival order).
  *
  * @param tsCol event-time TIMESTAMP column the watermark tracks
  * @param watermarkDelay how long to wait for stragglers ("10 minutes")
  * @param windowDuration tumbling width ("1 hour"); pass `slide` for a
  *        sliding window (an event then contributes to width/slide
  *        overlapping windows)
  * @return (window_start, window_end, keyCols..., n, total) — in
  *         streaming append mode rows materialize as windows close;
  *         the same call on a BATCH frame computes the identical
  *         rollup eagerly (used by the spec's batch-parity check)
  */
object WindowedAgg {
  def eventTimeRollup(events: DataFrame, tsCol: String,
      watermarkDelay: String, windowDuration: String,
      keyCols: Seq[String], valueCol: String,
      slide: Option[String] = None): DataFrame = {
    val win = slide match {
      case Some(sd) => window(col(tsCol), windowDuration, sd)
      case None     => window(col(tsCol), windowDuration)
    }
    val watermarked =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    watermarked
      .groupBy(win.as("win") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,10)")).as("total"))
      .select(Seq(col("win.start").as("window_start"),
        col("win.end").as("window_end")) ++ keyCols.map(col) ++
        Seq(col("n"), col("total")): _*)
  }
}
