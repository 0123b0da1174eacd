package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression: BPE subword segmentation of one word
  * under a learned merge list ([[graft.operators.TextBpe.learnBpe]]).
  *
  * Standard byte-pair-encoding application (Sennrich et al. 2016,
  * arXiv:1508.07909 — public algorithm): the word starts as code-point
  * symbols; the pair with the LOWEST merge rank present in the word
  * merges at every occurrence (left to right, overlaps skipped), and
  * this repeats until no adjacent pair has a rank. Tokenizer vocabulary
  * application is a per-row pure function of (word, merge table) — the
  * canonical Spark shape is an expression, not a join: the merge table
  * rides into every task as one broadcast-like reference object inside
  * the codegen'd plan, the corpus never shuffles, and the whole encode
  * stays in WholeStageCodegen like the shingle/fingerprint family.
  *
  * The merge list is a Seq of (lhs, rhs) in learned order (rank =
  * position). Determinism: ties cannot arise — ranks are distinct by
  * construction.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeSegment.rankMap(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeSegment.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeSegment.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeSegment {
  /** `lhs SP rhs → rank`; a space cannot occur inside a symbol that came
    * from whitespace-tokenized text, so the joined key is injective.
    */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  /** Java entry point used by both interpreted and generated code. */
  def compute(word: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData =
    toArrayData(segment(word.toString, ranks))

  private[functions] def toArrayData(parts: java.util.ArrayList[String]): ArrayData = {
    val out = new Array[AnyRef](parts.size)
    var m = 0
    while (m < parts.size) {
      out(m) = UTF8String.fromString(parts.get(m)); m += 1
    }
    new GenericArrayData(out)
  }

  /** Greedy lowest-rank-first merge loop over one word's symbols. */
  private[functions] def segment(s: String,
      ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    // code-point symbols (surrogate-pair safe)
    var parts = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      parts.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var done = parts.size < 2 || ranks.isEmpty
    while (!done) {
      // lowest-ranked pair present in the word
      var best = Integer.MAX_VALUE
      var bestKey: String = null
      var j = 0
      while (j < parts.size - 1) {
        val key = parts.get(j) + " " + parts.get(j + 1)
        val r = ranks.get(key)
        if (r != null && r.intValue < best) { best = r.intValue; bestKey = key }
        j += 1
      }
      if (bestKey == null) done = true
      else {
        // merge every occurrence left to right, skipping overlaps
        val next = new java.util.ArrayList[String](parts.size)
        var k = 0
        while (k < parts.size) {
          if (k < parts.size - 1 &&
              (parts.get(k) + " " + parts.get(k + 1)) == bestKey) {
            next.add(parts.get(k) + parts.get(k + 1))
            k += 2
          } else {
            next.add(parts.get(k))
            k += 1
          }
        }
        parts = next
        done = parts.size < 2
      }
    }
    parts
  }
}

/** Codegen'd Catalyst expression: BPE-encode a whole TEXT column —
  * whitespace tokenize (identical regex to [[ShingleHashes]] /
  * `split(text, "\\s+")`), [[BpeSegment]] each token, concatenate the
  * subword streams. One straight-line JVM call per row instead of a
  * `transform`-lambda tree interpreted per token, and the merge table
  * rides as a single plan reference object.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeSegment.rankMap(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Java entry point used by both interpreted and generated code. */
  def compute(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) out.addAll(BpeSegment.segment(toks(i), ranks))
      i += 1
    }
    BpeSegment.toArrayData(out)
  }
}
