package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC merge / snapshot compaction: apply a changelog of keyed upserts
  * and deletes onto a base snapshot, keeping the LATEST version of every
  * key (last-write-wins) — the MERGE INTO / compaction kernel of every
  * lakehouse table format.
  *
  * Realization: NOT a row_number window (which shuffles AND sorts whole
  * partitions, and at 100 TB sorts mostly-single-version keys for
  * nothing) and NOT `max(struct(...))`/`max_by` (struct agg buffers
  * are not hash-aggregable, so Catalyst silently degrades those to
  * SortAggregate — a by-key sort of every map partition). `latestByKey`
  * aggregates with [[graft.expressions.MaxByRowAgg]], a
  * TypedImperativeAggregate that ObjectHashAggregate runs hash-probed
  * with O(1) state per live key; each map task pre-collapses its keys
  * before the ONLY shuffle, so shuffle volume is bounded by distinct
  * keys per task, not input rows. `mergeChangelog` then unions base
  * (as sequence `baseSeq`) with the changelog and drops keys whose
  * latest op is the delete marker.
  *
  * Determinism: ties on the sequence resolve by payload bytes — the
  * winner is identical under any partitioning or merge order.
  */
object Merge {

  /** Latest row per key: the row with the greatest `seqCol` (numeric;
    * ties resolve deterministically by payload bytes). One hash
    * partial-agg shuffle via [[graft.expressions.MaxByRowAgg]] —
    * ObjectHashAggregate, never SortAggregate. */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keys required")
    require(!df.columns.contains("__m"), "input must not contain __m")
    val rest = df.columns.filterNot(c =>
      keyCols.contains(c) || c == seqCol).toSeq
    val packed = (seqCol +: rest).map(col)
    df.groupBy(keyCols.map(col): _*)
      .agg(graft.expressions.MaxByRowAgg.maxByRow(
        col(seqCol).cast("long"), struct(packed: _*)).as("__m"))
      .select(keyCols.map(col) ++ (seqCol +: rest).map(c =>
        col(s"__m.$c").as(c)): _*)
  }

  /** Merge `changelog` onto `base`. Base rows participate as sequence
    * `baseSeq` upserts (set it below every changelog sequence); a key
    * whose latest op equals `deleteOp` is dropped from the snapshot.
    * Columns of both inputs must match apart from `seqCol`/`opCol`,
    * which only the changelog carries. */
  def mergeChangelog(base: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String,
      deleteOp: String = "D", baseSeq: Long = 0L): DataFrame = {
    val valueCols = base.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.forall(changelog.columns.contains),
      "changelog must carry every base value column")
    val unioned = base
      .withColumn(seqCol, lit(baseSeq))
      .withColumn(opCol, lit("U"))
      .unionByName(changelog.select(
        (keyCols ++ valueCols ++ Seq(seqCol, opCol)).map(col): _*))
    latestByKey(unioned, keyCols, seqCol)
      .filter(col(opCol) =!= deleteOp)
      .drop(opCol)
  }
}
