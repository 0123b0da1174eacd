package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and the public [[Column]] API.
  * Spark 4 made the converters `private[sql]` (Column is shared with the
  * Connect client and no longer wraps an Expression directly), so
  * libraries providing custom expressions reach them from inside the sql
  * package namespace — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Normalizes a [[Column]]'s node tree into plain catalyst comparison
  * shapes (`EqualTo`/`GreaterThan`/`In`/`IsNull`/...) over
  * `UnresolvedAttribute` + `Literal` leaves, WITHOUT running analysis.
  *
  * Spark 4's Column wraps an [[org.apache.spark.sql.internal.ColumnNode]]
  * (shared with the Connect client), so `ExpressionUtils.expression`
  * yields a lazy `ColumnNodeExpression` whose structure pattern matching
  * can't see — and resolving it properly would require an analyzed plan,
  * i.e. the full mergeSchema footer listing that manifest-level data
  * skipping exists to avoid. This converter needs no schema at all: a
  * function it doesn't know becomes an [[analysis.UnresolvedFunction]]
  * marker the stats evaluator treats as "cannot prune on this", which is
  * always sound.
  */
object PredicateBridge {
  import org.apache.spark.sql.{internal => in}
  import org.apache.spark.sql.catalyst.{analysis, expressions => ce}

  def normalize(c: Column): Expression = convert(c.node)

  private def unknown(name: String, args: Seq[Expression]): Expression =
    analysis.UnresolvedFunction(name, args, isDistinct = false)

  private def convert(n: in.ColumnNode): Expression = n match {
    case a: in.UnresolvedAttribute =>
      analysis.UnresolvedAttribute(a.nameParts)
    case l: in.Literal =>
      (l.dataType match {
        case Some(dt) => scala.util.Try(ce.Literal.create(l.value, dt)).toOption
        case None => None
      }).orElse(scala.util.Try(ce.Literal(l.value)).toOption)
        .getOrElse(unknown("literal", Nil))
    case f: in.UnresolvedFunction =>
      val args = f.arguments.map(convert)
      (f.functionName.toLowerCase, args) match {
        case ("=" | "==", Seq(a, b)) => ce.EqualTo(a, b)
        case ("!=" | "<>", Seq(a, b)) => ce.Not(ce.EqualTo(a, b))
        case ("<=>", Seq(a, b)) => ce.EqualNullSafe(a, b)
        case (">", Seq(a, b)) => ce.GreaterThan(a, b)
        case (">=", Seq(a, b)) => ce.GreaterThanOrEqual(a, b)
        case ("<", Seq(a, b)) => ce.LessThan(a, b)
        case ("<=", Seq(a, b)) => ce.LessThanOrEqual(a, b)
        case ("and", Seq(a, b)) => ce.And(a, b)
        case ("or", Seq(a, b)) => ce.Or(a, b)
        case ("not" | "!", Seq(a)) => ce.Not(a)
        case ("isnull", Seq(a)) => ce.IsNull(a)
        case ("isnotnull", Seq(a)) => ce.IsNotNull(a)
        case ("in", a +: rest) => ce.In(a, rest)
        case ("startswith", Seq(a, b)) => ce.StartsWith(a, b)
        case (name, as) => unknown(name, as)
      }
    case other => unknown(other.getClass.getSimpleName, Nil)
  }
}
