package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Interval–interval overlap join: pair every left row whose interval
  * `[lLo, lHi]` overlaps a right row's `[rLo, rHi]` (closed bounds,
  * `lLo <= rHi && rLo <= lHi`), optionally under equi-keys — the
  * time-range / genomics / outage-window join Spark has no native
  * operator for. The naive spelling is a (per-key) cross join with the
  * overlap predicate, O(|L|·|R|) per key and a non-equi join Catalyst
  * can only plan as BroadcastNestedLoop or cartesian.
  *
  * Realization: fixed-width binning turns the inequality into an
  * equi-join. Each interval explodes to the bins it spans
  * (`floor(lo/w) .. floor(hi/w)`, exact integer floor-div), the join
  * runs on `keyCols :+ bin` — broadcast-hash when one side is small,
  * plain shuffle-hash at scale — and the exact overlap predicate
  * re-filters the candidates. A pair spanning several shared bins would
  * duplicate, so rows are emitted ONLY in the pair's first shared bin
  * (`bin == max(floor(lLo/w), floor(rLo/w))`, which every overlapping
  * pair shares): output is exactly-once with NO dedup shuffle — the
  * standard reporting trick from spatial bin joins.
  *
  * Scale shape: shuffle volume is rows × (span/w + 1) — pick `binWidth`
  * near the typical interval span so the explosion factor stays ~2.
  * Skewed giant intervals fan out to many bins but each bin's work is
  * local; the candidate count (not n²) bounds the filter stage.
  *
  * DateType lo/hi columns are converted to epoch-day numbers
  * automatically; any integral numeric works as-is.
  */
object IntervalJoin {

  private def num(df: DataFrame, c: String): Column =
    if (df.schema(c).dataType == DateType) unix_date(col(c)).cast("long")
    else col(c).cast("long")

  /** Exact floor division for longs (negative-safe; IntegralDivide via
    * Bridge because Column./ on longs returns double). */
  private def fdiv(x: Column, w: Long): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val exact = x - ((x % w + w) % w)
    Bridge.column(IntegralDivide(Bridge.expression(exact), Literal(w)))
  }

  /** @param keyCols      equi-key columns present on BOTH sides
    * @param binWidth     bin width in the lo/hi unit (days for dates)
    * @param broadcastRight hint: broadcast the exploded right side
    *                     (zero left shuffle); otherwise both sides
    *                     shuffle on (keys, bin)
    * @return left columns ++ right columns of every overlapping pair */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      keyCols: Seq[String] = Nil, binWidth: Long = 64L,
      broadcastRight: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lap = Seq("__bin", "__lo_bin")
    require(!(left.columns ++ right.columns).exists(lap.contains),
      s"inputs must not contain ${lap.mkString("/")}")
    require((left.columns.toSet -- keyCols).intersect(
      right.columns.toSet -- keyCols).isEmpty,
      "non-key output columns must not collide across sides")

    val l = left.withColumn("__lo_bin", fdiv(num(left, lLo), binWidth))
      .withColumn("__bin",
        explode(sequence(col("__lo_bin"), fdiv(num(left, lHi), binWidth))))
    val r0 = right.withColumn("__lo_bin", fdiv(num(right, rLo), binWidth))
      .withColumn("__bin",
        explode(sequence(col("__lo_bin"), fdiv(num(right, rHi), binWidth))))
      .withColumnRenamed("__lo_bin", "__rlo_bin")
    val r = if (broadcastRight) broadcast(r0) else r0

    l.join(r, keyCols :+ "__bin")
      .filter(num(left, lLo) <= num(right, rHi) &&
        num(right, rLo) <= num(left, lHi) &&
        col("__bin") === greatest(col("__lo_bin"), col("__rlo_bin")))
      .drop("__bin", "__lo_bin", "__rlo_bin")
  }
}
