package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi subword segmentation under a unigram language model (Kudo
  * 2018, arXiv:1804.10959 — the SentencePiece unigram tokenizer family;
  * public algorithm). Pieces carry INTEGER costs (`-floor(10⁴·ln p)`,
  * the [[graft.operators.NgramLm]] quantize-before-combine trick), so
  * the best segmentation is an exact integer argmin and the whole
  * DP is engine-portable: the DuckDB oracle replays it as a recursive
  * CTE over the same cost grid and must agree bit-for-bit.
  *
  * DP spec (the single source of truth — the oracle generator in
  * SparkEntry and the EM learner in [[graft.operators.UnigramLm]]
  * implement exactly this):
  *   - state `best(i) = (cost, nPieces)` for the length-i prefix,
  *     compared lexicographically; `best(0) = (0, 0)`.
  *   - candidates at i: every in-vocab piece `w[i-k..i)` for
  *     k = 1..min(maxLen, i), PLUS always the single-character
  *     fallback at `charCost` (so out-of-vocabulary characters
  *     segment as themselves instead of failing — and the fallback
  *     competes even when the character IS in the vocabulary, which
  *     matters when a learned char cost exceeds `charCost`).
  *   - traceback from i = n picks the LARGEST k whose candidate
  *     equals `best(i)` (longest final piece), making the token
  *     sequence — not just its cost — a pure function of the input.
  *
  * Positions are Unicode code points (surrogate-pair safe), matching
  * DuckDB's character indexing.
  */
object UnigramSegment {

  /** Cost of the always-available single-character fallback arm when
    * a character is not in the piece table — far above any quantized
    * log-prob (≤ ~2·10⁵) yet small enough that a whole word of unknown
    * characters stays well inside Long.
    */
  val UnkCost: Long = 100000000L

  def costMap(pieces: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, c) => m.putIfAbsent(p, java.lang.Long.valueOf(c)) }
    m
  }

  /** The DP value alone — the word's minimal total segmentation cost
    * (the unigram-LM negative log-likelihood on the integer grid, the
    * per-document quality signal). Same forward recurrence as
    * [[segment]], no traceback.
    */
  def cost(s: String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, charCost: Long): Long = {
    val starts = new Array[Int](s.length + 1)
    var n = 0
    var off = 0
    while (off < s.length) {
      starts(n) = off
      off += Character.charCount(s.codePointAt(off))
      n += 1
    }
    starts(n) = s.length
    val cost = new Array[Long](n + 1)
    val ntok = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var bc = cost(i - 1) + charCost
      var bn = ntok(i - 1) + 1
      var k = 1
      val kMax = math.min(maxLen, i)
      while (k <= kMax) {
        val c = costs.get(s.substring(starts(i - k), starts(i)))
        if (c != null) {
          val cc = cost(i - k) + c.longValue
          val cn = ntok(i - k) + 1
          if (cc < bc || (cc == bc && cn < bn)) { bc = cc; bn = cn }
        }
        k += 1
      }
      cost(i) = bc
      ntok(i) = bn
      i += 1
    }
    cost(n)
  }

  /** Viterbi-segment one word. `charCost` is the fallback cost for the
    * k=1 arm (pass [[UnkCost]] when the vocabulary is seeded with every
    * corpus character, so the arm exists but never wins).
    */
  def segment(s: String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, charCost: Long): java.util.ArrayList[String] = {
    // code-point boundaries: starts(i) = char offset of the i-th cp
    val starts = new Array[Int](s.length + 1)
    var n = 0
    var off = 0
    while (off < s.length) {
      starts(n) = off
      off += Character.charCount(s.codePointAt(off))
      n += 1
    }
    starts(n) = s.length
    val cost = new Array[Long](n + 1)
    val ntok = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      // k=1 fallback is always a candidate
      var bc = cost(i - 1) + charCost
      var bn = ntok(i - 1) + 1
      var k = 1
      val kMax = math.min(maxLen, i)
      while (k <= kMax) {
        val c = costs.get(s.substring(starts(i - k), starts(i)))
        if (c != null) {
          val cc = cost(i - k) + c.longValue
          val cn = ntok(i - k) + 1
          if (cc < bc || (cc == bc && cn < bn)) { bc = cc; bn = cn }
        }
        k += 1
      }
      cost(i) = bc
      ntok(i) = bn
      i += 1
    }
    // traceback: largest k whose candidate equals best(i)
    val rev = new java.util.ArrayList[String]()
    i = n
    while (i > 0) {
      var kStar = 0
      var k = math.min(maxLen, i)
      while (k >= 1 && kStar == 0) {
        val piece = s.substring(starts(i - k), starts(i))
        val c = costs.get(piece)
        val viaMap = c != null && cost(i - k) + c.longValue == cost(i) &&
          ntok(i - k) + 1 == ntok(i)
        val viaUnk = k == 1 && cost(i - 1) + charCost == cost(i) &&
          ntok(i - 1) + 1 == ntok(i)
        if (viaMap || viaUnk) kStar = k
        k -= 1
      }
      rev.add(s.substring(starts(i - kStar), starts(i)))
      i -= kStar
    }
    val out = new java.util.ArrayList[String](rev.size)
    var j = rev.size - 1
    while (j >= 0) { out.add(rev.get(j)); j -= 1 }
    out
  }
}

/** Codegen'd Catalyst expression: unigram-LM Viterbi-encode a whole
  * TEXT column — whitespace tokenize (identical regex to [[BpeEncode]]),
  * [[UnigramSegment.segment]] each token, concatenate. Map-only at any
  * scale: the piece-cost table rides the plan as one reference object,
  * the corpus never shuffles, and the call stays inside
  * WholeStageCodegen like the BPE/shingle family.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
    maxLen: Int, charCost: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] =
    UnigramSegment.costMap(pieces)

  override protected def nullSafeEval(input: Any): Any =
    UnigramEncode.compute(input.asInstanceOf[UTF8String], costs, maxLen, charCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCosts", costs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncode.compute($c, $ref, $maxLen, ${charCost}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  /** Java entry point used by both interpreted and generated code. */
  def compute(text: UTF8String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, charCost: Long): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        out.addAll(UnigramSegment.segment(toks(i), costs, maxLen, charCost))
      i += 1
    }
    BpeSegment.toArrayData(out)
  }
}

/** Codegen'd Catalyst expression: the whole TEXT column's unigram-LM
  * segmentation cost — Σ over whitespace tokens of each word's Viterbi
  * DP value ([[UnigramSegment.cost]]). The per-document negative
  * log-likelihood on the integer grid, i.e. the corpus-statistics
  * quality signal of the unigram family (the [[BpeEncode]]-shaped
  * map-only dual of [[graft.operators.NgramLm]]'s trigram score).
  */
case class UnigramCost(child: Expression, pieces: Seq[(String, Long)],
    maxLen: Int, charCost: Long) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "unigram_cost"

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] =
    UnigramSegment.costMap(pieces)

  override protected def nullSafeEval(input: Any): Any =
    UnigramCost.compute(input.asInstanceOf[UTF8String], costs, maxLen, charCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCosts", costs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramCost.compute($c, $ref, $maxLen, ${charCost}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCost =
    copy(child = newChild)
}

object UnigramCost {
  /** Java entry point used by both interpreted and generated code. */
  def compute(text: UTF8String, costs: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, charCost: Long): Long = {
    val toks = text.toString.split("\\s+", -1)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        sum += UnigramSegment.cost(toks(i), costs, maxLen, charCost)
      i += 1
    }
    sum
  }
}
