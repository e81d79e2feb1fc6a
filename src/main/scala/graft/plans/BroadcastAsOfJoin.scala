package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension (the strategy tier of the ladder:
  * functions < expressions < optimizer rules < THIS): an as-of join whose
  * build side is broadcast as per-key sorted timelines and probed with
  * binary search — the fact side is NEVER shuffled or sorted.
  *
  * The window realization in `operators/AsOfJoin` (reference pattern:
  * "(symbol, day) → latest price", SURVEY.md §1.1) unions both sides and
  * shuffles + sorts EVERYTHING by key: the right cost when both sides are
  * large. But the reference's actual shape — and the dominant shape at
  * 100 TB — is a huge fact stream probing a small dimension timeline
  * (prices per symbol per day). For that shape this operator moves only
  * the dimension over the wire (like a broadcast hash join), keeps the
  * probe side's partitioning AND ordering (`outputPartitioning` /
  * `outputOrdering` delegate to the left child, so downstream stages see
  * an exchange-free plan), and pays O(log timeline) per probe row.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN` and the window operator):
  * backward = latest right row with `right.ts <= left.ts` per key,
  * forward = earliest with `right.ts >= left.ts`; ties inclusive; no
  * match / NULL key / NULL ts → NULL values (SQL join semantics: NULL
  * keys never match). Duplicate (key, ts) build rows are ordered by a
  * byte-lexicographic secondary sort on the value row, so the winner is
  * deterministic across cluster sizes and partition layouts (backward
  * picks the byte-greatest duplicate, forward the byte-least).
  */
case class BroadcastAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    leftTs: Attribute,
    rightKeys: Seq[Attribute],
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for the engine's custom logical operators; injected
  * via `GraftExtensions` (`injectPlannerStrategy`). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: BroadcastAsOfJoin =>
      BroadcastAsOfJoinExec(
        j.leftKeys, j.leftTs, j.rightKeys, j.rightTs, j.rightValues,
        j.output.drop(j.left.output.length), j.forward,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: collect + broadcast the right side as per-key
  * ts-sorted parallel arrays; probe with binary search per left row.
  * Build cost is one pass + per-key sort over the (small) right side on
  * the driver; probe cost is O(log n) lookups in-place in whatever
  * stage the left child already runs in — no exchange, no sort, no
  * materialization of the fact side.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    leftTs: Expression,
    rightKeys: Seq[Expression],
    rightTs: Expression,
    rightValues: Seq[Expression],
    valueAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs
  // The whole point: probe-side physical properties survive the join.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "broadcast timeline rows"))

  /** Per-key timeline: ts ascending, values[i] aligned with ts[i]. */
  private type Timeline = (Array[Long], Array[UnsafeRow])

  /** Build once per plan instance: repeated actions over the same plan
    * (bench reps, count-then-collect) reuse ONE broadcast rather than
    * re-collecting the build side and leaking a fresh broadcast block
    * per action. Guarded by `spark.sql.graft.asofBroadcastMaxRows`
    * (default 10M) so a misjudged "dimension" fails fast instead of
    * OOMing the driver mid-build. */
  private lazy val buildBroadcast
      : org.apache.spark.broadcast.Broadcast[java.util.HashMap[UnsafeRow, Timeline]] = {
    val buildRowsMetric = longMetric("buildRows")
    val maxRows = conf.getConfString(
      "spark.sql.graft.asofBroadcastMaxRows", "10000000").toLong
    // --- driver-side build: key -> ts-sorted timeline ---
    val keyProj = UnsafeProjection.create(rightKeys, right.output)
    val valProj = UnsafeProjection.create(rightValues, right.output)
    val tsBound = BindReferences.bindReference(rightTs, right.output)
    val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]]()
    var nBuild = 0L
    right.executeCollect().foreach { row =>
      val ts = tsBound.eval(row)
      val k = keyProj(row)
      if (ts != null && !k.anyNull) {     // SQL semantics: NULLs never match
        nBuild += 1
        if (nBuild > maxRows) throw new IllegalStateException(
          s"as-of build side exceeds $maxRows rows " +
            "(spark.sql.graft.asofBroadcastMaxRows); use the window " +
            "realization (AsOfJoin.asofBackward/asofForward) instead")
        var buf = grouped.get(k)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]()
          grouped.put(k.copy(), buf)
        }
        buf += ((ts.asInstanceOf[Long], valProj(row).copy()))
        buildRowsMetric += 1
      }
    }
    val built = new java.util.HashMap[UnsafeRow, Timeline](grouped.size())
    grouped.forEach { (k, buf) =>
      // Secondary sort on value-row bytes: with duplicate (key, ts) rows
      // the winning duplicate no longer depends on executeCollect order
      // (physical partition layout) — identical results on any cluster.
      val sorted = buf.sortWith { case ((t1, v1), (t2, v2)) =>
        t1 < t2 || (t1 == t2 &&
          BroadcastAsOfJoinExec.compareBytes(v1.getBytes, v2.getBytes) < 0)
      }
      built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    // Driver-side metric increments are invisible to the SQL UI unless
    // posted explicitly.
    val executionId = sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY)
    SQLMetrics.postDriverMetricUpdates(
      sparkContext, executionId, Seq(buildRowsMetric))
    sparkContext.broadcast(built)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val bcast = buildBroadcast
    val isForward = forward
    val (lKeys, lTs, lOut, vAttrs, out) = (leftKeys, leftTs, left.output, valueAttrs, output)

    left.execute().mapPartitions({ iter =>
      val timelines = bcast.value
      val probeKey = UnsafeProjection.create(lKeys, lOut)
      val probeTs = BindReferences.bindReference(lTs, lOut)
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(vAttrs.length)
      iter.map { row =>
        val ts = probeTs.eval(row)
        val k = probeKey(row)
        var matched: InternalRow = nullRow
        if (ts != null && !k.anyNull) {
          val tl = timelines.get(k)
          if (tl != null) {
            val idx = BroadcastAsOfJoinExec.search(tl._1, ts.asInstanceOf[Long], isForward)
            if (idx >= 0) matched = tl._2(idx)
          }
        }
        numOutputRows += 1
        resultProj(joined(row, matched))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  /** Unsigned lexicographic byte comparison — the deterministic
    * tie-break for duplicate (key, ts) timeline rows. */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Backward: greatest i with ts(i) <= t. Forward: least i with
    * ts(i) >= t. Returns -1 when no such element. Among duplicate ts,
    * backward returns the last duplicate, forward the first — both are
    * the inclusive-tie row nearest the probe. */
  def search(ts: Array[Long], t: Long, forward: Boolean): Int = {
    var lo = 0
    var hi = ts.length - 1
    var ans = -1
    if (forward) {
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ts(mid) >= t) { ans = mid; hi = mid - 1 } else lo = mid + 1
      }
    } else {
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
    }
    ans
  }
}
