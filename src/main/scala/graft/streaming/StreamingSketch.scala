package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cardinality sketching: the KMV bottom-k estimator
  * (`operators/Sketch`) as `flatMapGroupsWithState` custom state — the
  * streaming face of the sketch's mergeability. Each micro-batch folds
  * its hashes into the per-group bottom-k (state is ≤ k longs per
  * group, checkpoint-backed), and the emitted estimate after batch N
  * equals the batch estimator over the union of batches 1..N exactly —
  * same hash family, same integer arithmetic (`StreamingSketchSpec`
  * asserts bit-equality against `Sketch.kmvDistinct`).
  *
  * At scale: state size is O(groups·k) regardless of stream length —
  * the property that makes per-day distinct-user style metrics feasible
  * as always-on streams rather than nightly rescans. Pair with a
  * watermark/timeout when groups churn (state TTL bounds the store).
  */
object StreamingSketch {

  /** (group, portable 32-bit hash) input row — hash upstream with
    * [[graft.operators.Sketch.md5Uniform32]] so stream and batch
    * estimates agree bit-for-bit. */
  final case class KeyedHash(group: String, h: Long)

  /** Per-group estimate after folding the current batch: `est_ndv`
    * matches `Sketch.kmvDistinct` over everything seen so far;
    * `n_kept` = bottom-k occupancy (= exact ndv while < k). */
  final case class KmvEstimate(group: String, est_ndv: Long, n_kept: Int)

  def kmvEstimates(hashes: Dataset[KeyedHash], k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import hashes.sparkSession.implicits._
    hashes.groupByKey(_.group)
      .flatMapGroupsWithState[Array[Long], KmvEstimate](
        // Append (not Update): one estimate row per (group, batch) —
        // file sinks accept it, and each batch's emission is the
        // fold-to-date estimate either way
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[KeyedHash], state: GroupState[Array[Long]]) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(h => set.add(h)))
          rows.foreach { r =>
            set.add(r.h)
            if (set.size > k) set.remove(set.last) // evict the largest
          }
          val kept = new Array[Long](set.size)
          val it = set.iterator(); var i = 0
          while (it.hasNext) { kept(i) = it.next(); i += 1 }
          state.update(kept)
          val est =
            if (kept.length < k) kept.length.toLong
            else ((k - 1).toLong * 4294967296L) / kept(k - 1)
          Iterator.single(KmvEstimate(g, est, kept.length))
      }
  }
}
