package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression: distinct xxhash64-hashed k-token
  * shingles of a text column, in first-occurrence order.
  *
  * Semantically identical to the declarative formulation in
  * `TextDedup.withHashedShingles` (split on `\s+` → k-gram join with " "
  * → xxhash64(seed 42) → distinct), byte-for-byte: tokenization is the
  * same Java regex split with limit -1, and hashing calls the same
  * XxHash64Function over the shingle's UTF8 bytes. The win is execution:
  * the higher-order-function tree (transform/slice/concat_ws/
  * array_distinct) is interpreted per element — measured ~180µs/doc on
  * 300-char docs — while this expression is one straight-line JVM call
  * per row inside whole-stage codegen.
  *
  * Register for SQL with [[GraftFunctions.register]]:
  * `SELECT shingle_hashes(text, 3) FROM docs`.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // xxhash64()'s fixed seed in Spark

  /** Java entry point used by both interpreted and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // identical tokenization to split(text, "\s+") — Java regex, limit -1
    val toks = text.toString.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= k) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(XxHash64Function.hash(
          UTF8String.fromString(sb.toString), org.apache.spark.sql.types.StringType, Seed))
        i += 1
      }
    } else {
      var i = 0
      while (i < toks.length) {
        seen.add(XxHash64Function.hash(
          UTF8String.fromString(toks(i)), org.apache.spark.sql.types.StringType, Seed))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Runtime registration of graft's custom expressions — usable both as a
  * `SparkSessionExtensions` hook (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and directly on
  * a live session via [[GraftFunctions.register]].
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.shingleHashesDescriptor)
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder

  private[functions] val shingleHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (children: Seq[Expression]) => children match {
      case Seq(text) => ShingleHashes(text, 3)
      case Seq(text, kExpr) =>
        ShingleHashes(text, kExpr.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "shingle_hashes(text[, k]) takes 1 or 2 arguments")
    }
  )

  /** Register graft functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = shingleHashesDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-API form. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      ShingleHashes(org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k))

  /** Column-API forms of the md5-family expressions (Md5ShingleExprs). */
  def shingleMd5Hashes(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      ShingleMd5Hashes(org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k))

  def minhashMd5Signature(text: Column, numHashes: Int, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      MinhashMd5Signature(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k, numHashes))

  def simhashMd5(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      SimhashMd5(org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k))

  /** Column-API forms of the xxhash64-family expressions (XxShingleExprs). */
  def minhashXxSignature(text: Column, numHashes: Int, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      MinhashXxSignature(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k, numHashes))

  def simhashXx(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      SimhashXx(org.apache.spark.sql.graftshim.ColumnBridge.expression(text), k))

  /** Unicode NFC normalization (NormalizeExpr.scala). */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))
}
