package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, the most recent right row
  * with `right.ts <= left.ts` on the same key — the reference's
  * "(symbol, day) → latest price" lookup pattern (SURVEY.md §1.1)
  * generalized to event time.
  *
  * Spark-first realization (no custom strategy needed): tag and UNION
  * both sides, then a per-key `last(value, ignoreNulls)` running window
  * ordered by (ts, side) carries each right value forward to the left
  * rows that follow it. ONE shuffle (hash by key) + one sort — the same
  * cost as the sort-merge join a native as-of operator would do, and it
  * scales exactly like any windowed aggregation. Right rows sort before
  * left rows at equal ts, so ties are inclusive (ASOF >= semantics).
  */
object AsOfJoin {

  /** Most recent right row with `right.ts <= left.ts` per key. */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCols, tsCol, valueCols, forward = false)

  /** Earliest right row with `right.ts >= left.ts` per key — the "next
    * scheduled event" lookup. Identical single-shuffle window
    * realization, traversed in reverse time order. */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCols, tsCol, valueCols, forward = true)

  /** Broadcast realization: the right side (a small dimension timeline —
    * the reference's per-symbol price history) is collected, sorted per
    * key, broadcast, and probed with binary search; the left side keeps
    * its partitioning and ordering — NO exchange anywhere. Planned
    * through the custom `graft.plans.BroadcastAsOfJoin` logical node and
    * `GraftStrategy` (requires `GraftExtensions` on the session). `tsCol`
    * must be integral (cast first if needed); semantics match
    * `asofBackward`/`asofForward` and DuckDB ASOF LEFT JOIN.
    */
  def asofBroadcast(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graft.Bridge
    val lCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains), "valueCols must be in right")
    require(valueCols.forall(!lCols.contains(_)),
      "valueCols must not collide with left columns")
    // The exec probes a hash map of UnsafeRow keys and reads ts as Long:
    // a key dtype mismatch would silently never match (different physical
    // layouts), and a non-Long ts would ClassCastException mid-job —
    // reject both at plan time instead. Callers cast first.
    require(left.schema(tsCol).dataType == org.apache.spark.sql.types.LongType &&
      right.schema(tsCol).dataType == org.apache.spark.sql.types.LongType,
      s"tsCol $tsCol must be LongType on both sides (cast first)")
    keyCols.foreach { k =>
      require(left.schema(k).dataType == right.schema(k).dataType,
        s"key $k dtype mismatch: ${left.schema(k).dataType} vs " +
          s"${right.schema(k).dataType} (cast to a common type first)")
      // The exec matches keys by raw UnsafeRow byte equality. For float
      // types -0.0 vs 0.0 (and differing NaN bit patterns) are unequal
      // bytes though SQL join equality matches them; Spark's own joins
      // normalize via NormalizeFloatingNumbers, which does not fire on
      // custom nodes — so reject float-typed keys at plan time.
      def hasFloat(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType => true
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasFloat(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasFloat(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          hasFloat(m.keyType) || hasFloat(m.valueType)
        case _ => false
      }
      require(!hasFloat(left.schema(k).dataType),
        s"key $k is (or contains) FloatType/DoubleType, which byte-equality " +
          "matching cannot compare like SQL = (-0.0/NaN); cast to a " +
          "non-float type first")
    }
    val lPlan = Bridge.analyzed(left)
    // Fresh exprIds on the build side so self-joins (same source both
    // sides) never alias attributes across children.
    val rNarrow = Bridge.analyzed(
      right.select((keyCols :+ tsCol).distinct.map(col) ++
        valueCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*))
    val rPlan = Project(rNarrow.output.map(a => Alias(a, a.name)()), rNarrow)
    val rOut = rPlan.projectList.map(_.toAttribute)
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      sys.error(s"column $n not found on left"))
    def rAttr(n: String) = rOut.find(_.name == n).getOrElse(
      sys.error(s"column $n not found on right"))
    Bridge.ofRows(left.sparkSession, graft.plans.BroadcastAsOfJoin(
      lPlan, rPlan,
      keyCols.map(lAttr), lAttr(tsCol),
      keyCols.map(rAttr), rAttr(tsCol),
      valueCols.map(rAttr), forward))
  }

  /** Cost-based dispatch: broadcast realization when the right side's
    * Catalyst size estimate fits the session's
    * `spark.sql.autoBroadcastJoinThreshold` (the same statistic Spark's
    * own planner uses to pick BroadcastHashJoin), window realization
    * otherwise. `thresholdBytes` overrides for testing/tuning; -1
    * disables broadcasting entirely. */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], forward: Boolean = false,
      thresholdBytes: Option[Long] = None): DataFrame = {
    // conf accepts "-1" (broadcast disabled) and negative numbers, which
    // JavaUtils.byteStringAsBytes rejects — mirror Spark's own
    // ConfigHelpers.byteFromString minus-sign handling
    val thr = thresholdBytes.getOrElse {
      val s = left.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold").trim
      if (s.startsWith("-"))
        -org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.substring(1))
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
    }
    val rightBytes = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thr >= 0 && rightBytes <= thr)
      asofBroadcast(left, right, keyCols, tsCol, valueCols, forward)
    else if (forward) asofForward(left, right, keyCols, tsCol, valueCols)
    else asofBackward(left, right, keyCols, tsCol, valueCols)
  }

  private def asofImpl(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains), "valueCols must be in right")
    require(valueCols.forall(!lCols.contains(_)),
      "valueCols must not collide with left columns")
    // Right values travel inside ONE struct: the running last(ignoreNulls)
    // then matches "latest right ROW" even when that row's value columns
    // are genuinely NULL (filling the value columns directly would skip
    // null values and surface a stale older match).
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(valueCols.map(v =>
          org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))))
    val r0 = right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rv", struct(valueCols.map(v => col(v).as(v)): _*))
      .drop(valueCols: _*)
    val r = lCols.filterNot(c => keyCols.contains(c) || c == tsCol)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val u = l.select((lCols :+ "__rv" :+ "__side").map(col): _*)
      .unionByName(r.select((lCols :+ "__rv" :+ "__side").map(col): _*))
    // Right rows sort before left rows at equal ts (side 0 < 1), so the
    // tie is inclusive in both directions; forward just walks time
    // backwards so "running last right row seen" = "nearest following".
    val tsOrd = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    valueCols.foldLeft(filled.filter(col("__side") === 1))(
      (df, v) => df.withColumn(v, col("__rv").getField(v)))
      .drop("__rv", "__side")
  }
}
