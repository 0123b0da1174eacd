package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd expressions for the md5-family (cross-engine-verifiable)
  * dedup tiers. The md5-60-bit hash is the one family a plain-SQL oracle
  * can recompute (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`);
  * these expressions produce bit-identical values to that formulation —
  * spec-enforced against the declarative `TextDedup.md5Long` chain — but
  * run as one straight-line JVM call per row inside whole-stage codegen,
  * instead of interpreted HOF trees (shingle construction) plus one
  * Spark-side md5/conv per shingle per lane.
  *
  * A document's fingerprint/signature is a per-row scalar: computing it
  * row-locally removes the explode + 16-aggregate (minhash) and the
  * explode + 60-vote aggregate (simhash) entirely — no shuffle of the
  * shingle stream at all. Documents are bounded (a single row's shingles
  * fit in memory by the same argument that the row itself does).
  */
object Md5ShingleHash {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Hex chars 1-15 of the digest as a 60-bit long. */
  def lane0(d: Array[Byte]): Long = be64(d, 0) >>> 4

  /** Hex chars 16-30 of the digest as a 60-bit long. */
  def lane1(d: Array[Byte]): Long =
    ((be64(d, 0) & 0xfL) << 56) | (be64(d, 8) >>> 8)

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  /** md5-60-bit of a string's UTF-8 bytes (= TextDedup.md5Long). */
  def hashString(s: String): Long =
    lane0(md5(s.getBytes(StandardCharsets.UTF_8)))

  /** md5-60-bit of a normalized-buffer shingle slice — the same bytes
    * the shingle STRING would encode to (valid-UTF-8 contract), so the
    * value equals hashString(shingle) without materializing it.
    */
  private def hashSlice(buf: Array[Byte], start: Int, end: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(buf, start, end - start)
    lane0(md.digest())
  }

  /** Distinct md5-60-bit shingle hashes pushed to `f` once each, in
    * first-occurrence order. Tokenization/shingling identical to
    * TextDedup.withShingleStrings (Java regex split on \s+ with limit
    * -1; k-gram join with " "); distinctness is BY CONTENT
    * ([[ShingleWalk.Dedup]] — the distinct-string contract, exact even
    * under probe-hash collision). The xx probe hash costs ~nothing next
    * to md5, and md5 runs once per DISTINCT shingle, as before — but
    * the per-window string/StringBuilder/encode churn is gone.
    */
  @inline private def foreachDistinctMd5(text: UTF8String, k: Int)(
      f: Long => Unit): Unit = {
    val norm = ShingleWalk.tokenize(text)
    val nw = ShingleWalk.windows(norm, k)
    val seen = new ShingleWalk.Dedup(norm, k)
    var w = 0
    while (w < nw) {
      val probe = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(ShingleWalk.slice(norm, k, w),
          org.apache.spark.sql.types.StringType, 42L)
      if (seen.add(w, probe))
        f(hashSlice(norm.buf, ShingleWalk.winStart(norm, k, w),
          ShingleWalk.winEnd(norm, k, w)))
      w += 1
    }
  }

  /** Per-shingle md5-60-bit hashes, distinct, first-occurrence order. */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val norm = ShingleWalk.tokenize(text)
    val nw = ShingleWalk.windows(norm, k)
    val seen = new ShingleWalk.Dedup(norm, k)
    val out = new Array[Long](nw)
    var n = 0
    var w = 0
    while (w < nw) {
      val probe = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(ShingleWalk.slice(norm, k, w),
          org.apache.spark.sql.types.StringType, 42L)
      if (seen.add(w, probe)) {
        out(n) = hashSlice(norm.buf, ShingleWalk.winStart(norm, k, w),
          ShingleWalk.winEnd(norm, k, w))
        n += 1
      }
      w += 1
    }
    val trimmed = new Array[Long](n)
    System.arraycopy(out, 0, trimmed, 0, n)
    new GenericArrayData(trimmed)
  }

  /** MinHash signature: lane pairs from seeded digests md5("g#" + h0
    * decimal), g = 0 until numHashes/2 — two 60-bit lanes per digest.
    */
  def signature(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    foreachDistinctMd5(text, k) { h0 =>
      val h0s = java.lang.Long.toString(h0)
      var g = 0
      while (2 * g + 1 < numHashes) {
        val d = md5(s"$g#$h0s".getBytes(StandardCharsets.UTF_8))
        val a = lane0(d)
        val b = lane1(d)
        if (a < mins(2 * g)) mins(2 * g) = a
        if (b < mins(2 * g + 1)) mins(2 * g + 1) = b
        g += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** 60-bit SimHash fingerprint: each bit of each distinct shingle's
    * md5-60-bit hash votes ±1; fingerprint bit set where positive.
    */
  def simhash(text: UTF8String, k: Int): Long = {
    val votes = new Array[Int](60)
    foreachDistinctMd5(text, k) { h =>
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }
}

/** array<long>: distinct md5-60-bit shingle hashes of a text column. */
case class ShingleMd5Hashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_md5_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleHash.hashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleHash.hashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMd5Hashes =
    copy(child = newChild)
}

/** array<long> of length numHashes: md5-family MinHash signature. */
case class MinhashMd5Signature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  // two lanes per digest: an odd count would leave the last lane stuck
  // at Long.MaxValue for every document (all docs collide in its band)
  require(numHashes > 0 && numHashes % 2 == 0,
    s"numHashes must be positive and even, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_md5_signature"
  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleHash.signature(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5ShingleHash.signature($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashMd5Signature =
    copy(child = newChild)
}

/** long: 60-bit md5-family SimHash fingerprint. */
case class SimhashMd5(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"
  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleHash.simhash(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleHash.simhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): SimhashMd5 =
    copy(child = newChild)
}
