package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row xxhash64 MinHash signatures and SimHash fingerprints — the
  * fast-path duals of Md5ShingleExprs. Bit-identical to the declarative
  * formulations they replace (spec-enforced):
  *
  *  - lane i of the signature is `min(xxhash64(lit(i), h0))` over the
  *    doc's distinct shingle hashes h0 (TextDedup.minhashSignatures'
  *    aggregate). Spark's XxHash64 expression folds its children through
  *    the hash state, so the per-lane constant prefix
  *    hash(i: int, seed 42) is precomputed once and each shingle pays
  *    one 8-byte hash per lane.
  *  - the fingerprint is the 64-bit ±1 bit-vote over the same h0 stream
  *    (TextDedup.simhash's 64-sum aggregate).
  *
  * A document's signature/fingerprint is a per-row scalar; computing it
  * row-locally removes the shingle explode and the numHashes-way (or
  * 64-vote) aggregate — no shuffle of the shingle stream at all.
  */
object XxShingleHash {
  private val Seed = 42L // xxhash64()'s fixed seed in Spark

  /** Per-lane hash-state prefix: xxhash64's fold after consuming the
    * integer lane index, matching xxhash64(lit(i), h0) child order.
    */
  def laneSeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i =>
      XxHash64Function.hash(i, IntegerType, Seed))

  /** Distinct-shingle h0 stream: content-deduplicated windows
    * ([[ShingleWalk.Dedup]] — byte equality, exact under collisions,
    * same distinct-STRING contract shingleStrings carried), each
    * distinct shingle's xxhash64 pushed to `f` once, in
    * first-occurrence order. The probe hash IS h0, so every window is
    * hashed exactly once and nothing per-window is allocated.
    */
  @inline private def foreachDistinctH0(text: UTF8String, k: Int)(
      f: Long => Unit): Unit = {
    val norm = ShingleWalk.tokenize(text)
    val nw = ShingleWalk.windows(norm, k)
    val seen = new ShingleWalk.Dedup(norm, k)
    var w = 0
    while (w < nw) {
      val h0 = XxHash64Function.hash(ShingleWalk.slice(norm, k, w),
        StringType, Seed)
      if (seen.add(w, h0)) f(h0)
      w += 1
    }
  }

  def signature(text: UTF8String, k: Int, laneSeeds: Array[Long]): ArrayData = {
    val mins = Array.fill(laneSeeds.length)(Long.MaxValue)
    foreachDistinctH0(text, k) { h0 =>
      var i = 0
      while (i < laneSeeds.length) {
        val h = XxHash64Function.hash(h0, LongType, laneSeeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  def simhash(text: UTF8String, k: Int): Long = {
    val votes = new Array[Int](64)
    foreachDistinctH0(text, k) { h =>
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }
}

/** array<long> of length numHashes: xxhash64-family MinHash signature. */
case class MinhashXxSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  // laneSeeds is deterministic from numHashes; @transient lazy keeps the
  // expression tree serializable without shipping the array
  @transient private lazy val seeds = XxShingleHash.laneSeeds(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_xx_signature"
  override protected def nullSafeEval(input: Any): Any =
    XxShingleHash.signature(input.asInstanceOf[UTF8String], k, seeds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the precomputed seed array in the generated class — inlining
    // laneSeeds(n) into the row expression would recompute it per row
    val seedsRef = ctx.addReferenceObj("laneSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.XxShingleHash.signature($c, $k, $seedsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinhashXxSignature =
    copy(child = newChild)
}

/** long: 64-bit xxhash64-family SimHash fingerprint. */
case class SimhashXx(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_xx"
  override protected def nullSafeEval(input: Any): Any =
    XxShingleHash.simhash(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.XxShingleHash.simhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): SimhashXx =
    copy(child = newChild)
}
