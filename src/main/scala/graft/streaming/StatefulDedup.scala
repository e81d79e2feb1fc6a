package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T5 — cross-batch duplicate suppression as Structured Streaming custom
  * state (SURVEY.md §2.10): the reference achieves idempotent re-inserts
  * by deduplicating in the storage engine after the fact (D1); the
  * Spark-native form suppresses duplicates ON THE WAY IN with
  * `flatMapGroupsWithState` — per-key state ("have I emitted this key?")
  * survives across micro-batches via the checkpoint, so a replayed batch
  * (the crash-between-write-and-commit case, §7.4 risk 5) emits nothing
  * the second time.
  *
  * State is one boolean per key, hash-partitioned by the state store —
  * at 100 TB the state size is O(distinct keys in the retention window);
  * pair with a watermark + timeout to bound it.
  */
object StatefulDedup {

  final case class Keyed(key: Long, payload: String)

  /** Emit each key's FIRST occurrence only, across all micro-batches. */
  def firstOccurrences(events: Dataset[Keyed]): Dataset[Keyed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }
}
