package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session summaries as Structured Streaming CUSTOM state with
  * an EVENT-TIME timeout — the third `flatMapGroupsWithState` realization
  * (after StatefulDedup's boolean state and StreamingSketch's KMV state),
  * and the one that exercises the timeout machinery: a session is held
  * open in per-key state while events keep arriving within `gap`, and is
  * emitted exactly once when the WATERMARK passes its close time — not
  * when a wall clock does, so replays and late-but-in-watermark events
  * still extend the right session. The batch operator
  * [[graft.operators.Sessions.sessionize]] computes the same sessions
  * with a lag/running-sum window; the streaming form never re-reads
  * history, holding only ONE open (start, end, count) triple per active
  * key — state is O(active keys), bounded by the watermark.
  *
  * Scale shape: state store is hash-partitioned by key; each micro-batch
  * shuffles only that batch's events. Within a batch a key's events are
  * sorted in memory (bounded by per-batch per-key volume) and sessions
  * closed by in-batch gaps are emitted immediately; only the trailing
  * open session waits for the watermark.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, ts: Timestamp)
  /** Open-session state: [start, end] plus the event count so far. */
  final case class Open(start: Long, end: Long, n: Long)
  final case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** @param events   watermarked stream (caller applies `withWatermark`
    *                 on `ts` — the timeout needs one)
    * @param gapMillis a new session starts when the gap to the previous
    *                 event of the same key exceeds this */
  def gapSessions(events: Dataset[Ev], gapMillis: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // watermark passed close time: finalize and emit
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.end, s.n))
          } else {
            val ts = rows.map(_.ts.getTime).toArray.sorted
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            ts.foreach { t =>
              open =
                if (open == null) Open(t, t, 1L)
                else if (t - open.end > gapMillis) {
                  closed += SessionOut(uid, open.start, open.end, open.n)
                  Open(t, t, 1L)
                } else Open(open.start, math.max(open.end, t), open.n + 1L)
            }
            if (open != null) {
              state.update(open)
              // fires once the EVENT-TIME watermark passes end + gap
              state.setTimeoutTimestamp(open.end + gapMillis)
            }
            closed.result().iterator
          }
      }
  }
}
