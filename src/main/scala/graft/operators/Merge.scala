package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** SCD Type-2: turn a keyed change log into validity-ranged dimension
    * rows — the warehouse-standard history table (Kimball slowly-changing
    * dimension, type 2).
    *
    * Consecutive rows whose tracked attributes are unchanged are
    * compressed away (null-safely, via `<=>` on the packed attr struct),
    * then each surviving change opens a version: `valid_from` = its
    * sequence, `valid_to` = the next change's sequence (NULL while
    * current), `version` = 1-based per key, `is_current` = no successor.
    * Half-open semantics: a probe at sequence t matches the row with
    * `valid_from <= t < valid_to` — and [[graft.operators.AsOfJoin]] /
    * [[graft.operators.RangeJoin]] are the probe operators.
    *
    * Requires unique (key, seq) input rows — pre-aggregate duplicates
    * deterministically first (the q130 query keeps `min(state)`).
    *
    * Scale shape: ONE hash shuffle by key + one per-key sort; the
    * compression filter preserves partitioning AND ordering, so the
    * second window pass (lead/row_number) reuses the first's Exchange
    * and Sort — dimension change logs are key-bounded, never fact-sized.
    */
  def scdType2(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val reserved = Seq("__prev", "valid_from", "valid_to", "version", "is_current")
    require(reserved.forall(r => !changes.columns.contains(r)),
      s"input must not contain ${reserved.mkString("/")}")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val attrs = struct(attrCols.map(col): _*)
    changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(col("__prev") <=> attrs))   // first row: NULL <=> x = false
      .select(
        keyCols.map(col) ++ attrCols.map(col) ++ Seq(
          col(seqCol).as("valid_from"),
          lead(col(seqCol), 1).over(w).as("valid_to"),
          row_number().over(w).cast("long").as("version"),
          lead(col(seqCol), 1).over(w).isNull.as("is_current")): _*)
  }
}
