package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the ranked-dedup window idiom
  *
  * {{{
  * Project [child cols]                     Project [fields of __row]
  *   Filter (rn = 1)                 ==>      Aggregate [keys]
  *     Window [row_number() AS rn]              [min_by(struct(cols), key)]
  *       child                                  child
  * }}}
  *
  * into the aggregate form [[graft.operators.Dedup.rankedFirstAgg]]
  * chooses by hand: `min_by(row, sortKey)` over the partition keys, with
  * the mixed-direction ordering normalized into one ascending struct
  * key. The window form shuffles every row and sorts each hash
  * partition by (keys ++ ordering); the aggregate form partially
  * combines map-side — the shuffle carries one candidate row per (key,
  * map task) and the only sorts are keys-only. On a 100 TB day
  * partition with duplication that is shuffle-the-distinct-keys vs
  * shuffle-the-day; this rule gives the better shape to ANY consumer of
  * the classic SQL idiom (`QUALIFY rn = 1` portings, BI-generated SQL),
  * not just callers of the Scala API.
  *
  * Strictly-guarded (skip = keep the window form, never wrong results):
  *  - the Filter must be exactly `rn = 1` on this window's lone
  *    `row_number` output, and the Project above must NOT use `rn`;
  *  - every ORDER BY key must be deterministic and invertible-or-ascending:
  *    ASC NULLS FIRST passes through (struct ordering is null-first,
  *    matching); DESC keys need an order-reversing bijection — bitwise
  *    NOT for integral/date/timestamp, negation for float/double/
  *    decimal, NOT for boolean — and with the default NULLS LAST the
  *    key must be provably non-null (a null would flip to sort first);
  *    DESC NULLS FIRST accepts nullable keys (null-first is preserved).
  *    Strings (not cheaply invertible) and timestamp_ntz (inversion
  *    would depend on the session zone's DST behavior) only pass ASC.
  *  - ties: `row_number` over a non-total ordering is already
  *    nondeterministic in Spark; the rewrite picks the same class of
  *    arbitrary-but-single winner, so no determinism contract changes.
  *
  * Registered by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`), or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object RankedDedupRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(winExpr: Alias), partitionSpec, orderSpec, winChild, _)))
        if isRowNumber(winExpr.child) && isEqualsOne(cond, winExpr.toAttribute) &&
          !projectList.exists(_.references.contains(winExpr.toAttribute)) &&
          orderSpec.nonEmpty && orderSpec.forall(_.child.deterministic) &&
          partitionSpec.forall(_.deterministic) =>
      // the Window node's child may already carry an optimizer-inserted
      // WindowGroupLimit; the rewrite replaces the whole stack, so read
      // through it
      val child = winChild match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      normalizeAll(orderSpec) match {
        case None => p // some key not safely invertible: keep the window
        case Some(keyFields) =>
          val row = CreateStruct(child.output.toList)
          val key = CreateStruct(keyFields.toList)
          val minBy = AggregateExpression(MinBy(row, key), Complete, isDistinct = false)
          val rowAlias = Alias(minBy, "__ranked_row")()
          val agg = Aggregate(partitionSpec, Seq(rowAlias), child)
          // restore the child's attributes — SAME exprIds, so the
          // parent Project's references keep resolving
          val restored = child.output.zipWithIndex.map { case (attr, i) =>
            Alias(GetStructField(rowAlias.toAttribute, i, Some(attr.name)),
              attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
          }
          Project(projectList, Project(restored.toList, agg))
      }
  }

  private def isRowNumber(e: Expression): Boolean = e match {
    case WindowExpression(RowNumber(), _) => true
    case _ => false
  }

  private def isEqualsOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case _ => false
  }

  /** All sort keys normalized to ascending-null-first struct fields, or
    * None if any key has no safe normalization.
    */
  private def normalizeAll(orderSpec: Seq[SortOrder]): Option[Seq[Expression]] = {
    val fields = orderSpec.map { so =>
      (so.direction, so.nullOrdering) match {
        case (Ascending, NullsFirst) => Some(so.child) // struct order matches
        case (Ascending, NullsLast) =>
          // struct ordering would put nulls first — only safe null-free
          if (!so.child.nullable) Some(so.child) else None
        case (Descending, no) =>
          if (no == NullsLast && so.child.nullable) None
          else invert(so.child)
      }
    }
    if (fields.forall(_.isDefined)) Some(fields.map(_.get)) else None
  }

  /** Order-reversing bijection for a DESC key, or None. Mirrors
    * Dedup.rankedFirstAgg's table, minus timestamp_ntz (an automatic
    * rule must not depend on the session zone being DST-free).
    */
  private def invert(e: Expression): Option[Expression] = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(BitwiseNot(Cast(e, LongType)))
    case FloatType | DoubleType | _: DecimalType => Some(UnaryMinus(e))
    case DateType => Some(BitwiseNot(Cast(UnixDate(e), LongType)))
    case TimestampType => Some(BitwiseNot(UnixMicros(e)))
    case BooleanType => Some(Not(e))
    case _ => None
  }
}
