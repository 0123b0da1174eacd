package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression: content-defined chunk CUT positions of
  * a text column (the rolling-window boundary selection of CDC dedup —
  * rsync/LBFS; see `TextAnalysis.cdcDuplicateChunks`).
  *
  * Returns the 1-based END positions (in code points) of every `w`-wide
  * window whose Rabin-style fingerprint — the exact 64-bit dot product
  * of the window's code points with `257^(w-1-j) mod (2³¹−1)` — is
  * ≡ 0 (mod `m`), ascending. Bit-identical to the SQL formulation the
  * DuckDB oracle runs (`Σ ascii(substr(text,i+j,1))·pw[j] % m`): code
  * points, not UTF-16 units or bytes, to match `ascii`/`length`
  * semantics in both engines; every product ≤ 2²¹·2³¹ and the w-term
  * sum ≤ 2⁵⁶ — exact in a long, no overflow, no float.
  *
  * Why an expression: the declarative form (split('') → transform →
  * filter over a position sequence) re-expands the char-code projection
  * into the lambda and evaluates it interpreted PER POSITION — measured
  * ~100 ms/doc on 300-char docs, O(n²). This is one straight-line JVM
  * pass per row (O(n·w) array reads) inside whole-stage codegen — the
  * same trade [[ShingleHashes]] documents.
  */
case class CdcCuts(child: Expression, w: Int, m: Int)
    extends UnaryExpression {
  require(w >= 2 && w <= 64, "window must be in [2, 64]")
  require(m >= 2, "modulus must be >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], w, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCuts.compute($c, $w, $m)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val P = 2147483647L // 2^31 − 1

  /** pw(j) = 257^(w−1−j) mod P, highest power first — cached per window
    * width (widths are query literals; the map stays a handful deep).
    */
  private val powerCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def powers(w: Int): Array[Long] =
    powerCache.computeIfAbsent(w, { width =>
      val arr = new Array[Long](width)
      var j = width - 1
      var acc = 1L
      while (j >= 0) { arr(j) = acc; acc = acc * 257L % P; j -= 1 }
      arr
    })

  /** Java entry point used by both interpreted and generated code. */
  def compute(text: UTF8String, w: Int, m: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val pw = powers(w)
    val buf = new java.util.ArrayList[Integer]()
    var i = 0
    while (i + w <= n) {
      var s = 0L
      var j = 0
      while (j < w) { s += cps(i + j) * pw(j); j += 1 }
      if (s % m == 0L) buf.add(i + w) // 1-based window END
      i += 1
    }
    val out = new Array[Int](buf.size)
    var k = 0
    while (k < out.length) { out(k) = buf.get(k); k += 1 }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def cdcCuts(text: Column, w: Int, m: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      CdcCuts(org.apache.spark.sql.graftshim.ColumnBridge.expression(text), w, m))
}
