package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC merge: the Structured Streaming realization of
  * [[graft.operators.Merge.mergeChangelog]] — a changelog stream folds
  * into per-key latest-version state that survives micro-batches via
  * the checkpoint, emitting a key's new latest version only when a
  * batch actually advances it. Out-of-order arrivals with a stale
  * sequence (including whole replayed batches, the crash-recovery case)
  * change nothing and emit nothing, so the downstream sink converges to
  * exactly the batch operator's answer.
  *
  * State is one (seq, payload, deleted) record per key, hash-partitioned
  * across the state store — O(live keys), the same bound as the batch
  * kernel's shuffle; pair with a timeout/watermark to retire idle keys
  * when the key space is unbounded.
  */
object StreamingMerge {

  final case class Change(key: Long, seq: Long, value: String, op: String)
  final case class Latest(key: Long, seq: Long, value: String, deleted: Boolean)

  /** Emit each key's latest version whenever a batch advances it;
    * strictly-greater sequences win (sequences are unique per key, the
    * same precondition as the batch operator's oracle). */
  def latestByKey(changes: Dataset[Change]): Dataset[Latest] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[Latest, Latest](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Change], state: GroupState[Latest]) =>
          val cur = state.getOption
          val best = rows.foldLeft(cur) { (acc, r) =>
            if (acc.isEmpty || r.seq > acc.get.seq)
              Some(Latest(key, r.seq, r.value, r.op == "D"))
            else acc
          }
          if (best != cur) {
            state.update(best.get)
            Iterator.single(best.get)
          } else Iterator.empty
      }
  }
}
