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

  /** `(child, isDescending)` when `c` is a sort-order wrapper
    * (`col.asc` / `col.desc`), None for a plain column. Spark 4 models
    * sort order as an [[org.apache.spark.sql.internal.SortOrder]]
    * ColumnNode (not a catalyst expression), so operators that accept
    * `orderBy`-style arguments and want to rewrite them into aggregate
    * shapes must unwrap at the node layer.
    */
  def unwrapSortOrder(c: Column): Option[(Column, Boolean)] = c.node match {
    case s: org.apache.spark.sql.internal.SortOrder =>
      Some((Column(s.child),
        s.sortDirection == org.apache.spark.sql.internal.SortOrder.Descending))
    case _ => None
  }
}

/** Internal aggregate constructors the SQL registry does not expose.
  * `bloom_filter_agg` exists in Spark's FunctionRegistry only as an
  * INTERNAL function (it backs the optimizer's runtime-filter
  * injection), so building the per-file key blooms means constructing
  * [[org.apache.spark.sql.catalyst.expressions.aggregate
  * .BloomFilterAggregate]] directly — same hashing (XxHash64 seed 42)
  * and same serialized form the public
  * `org.apache.spark.util.sketch.BloomFilter.readFrom` reads back.
  */
object AggBridge {
  import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** Bloom of `xxhash64(child)` sized (items, bits); BinaryType out. */
  def bloomAgg(child: Column, items: Long, bits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(child))),
        Literal(items), Literal(bits)).toAggregateExpression())

  /** Probe side of [[bloomAgg]]: `might_contain(bloom, xxhash64(value))`.
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * is the codegen'd predicate Spark's own runtime row-level filtering
    * injects; constructing it over a serialized-bloom LITERAL makes the
    * injection explicit and deterministic (no size/selectivity heuristics
    * deciding whether the filter exists). Hashing matches [[bloomAgg]]:
    * XxHash64 seed 42 of the key, probed with `mightContainLong`.
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(value)))))
}

/** BaseRelation → DataFrame for library-built relations (the
  * [[org.apache.spark.sql.execution.datasources.HadoopFsRelation]] over
  * a custom FileIndex). `baseRelationToDataFrame` lives on the CLASSIC
  * session type in Spark 4.
  */
object RelationBridge {
  def toDataFrame(spark: org.apache.spark.sql.SparkSession,
      rel: org.apache.spark.sql.sources.BaseRelation): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(rel)
}

/** Parquet-compatible schema union for the tx manifest's table-schema
  * line. [[org.apache.spark.sql.types.StructType.merge]] is the exact
  * routine Spark's own mergeSchema parquet read uses to reconcile file
  * footers, kept `private[sql]` in Spark 4 — bridging it (rather than
  * reimplementing field-union/type-widening rules) guarantees the
  * manifest's recorded schema can never disagree with what a mergeSchema
  * read of the same files would produce.
  */
object SchemaBridge {
  import org.apache.spark.sql.types.StructType
  def merge(a: StructType, b: StructType): StructType = a.merge(b)

  /** Recursive nullable-normalization (Spark's own `private[spark]`
    * routine). A schema recorded in the manifest is later used as an
    * EXPLICIT read schema over evolved file sets where any column may be
    * absent from some file (read as null) — declaring such a column
    * non-nullable would let codegen miscompile null checks, so the
    * recorded form must be all-nullable, exactly like a parquet
    * footer-derived schema.
    */
  def asNullable(s: StructType): StructType = s.asNullable
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
