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

  /** Distinct k-shingle strings in first-occurrence order — identical
    * tokenization/shingling to TextDedup.withShingleStrings (Java regex
    * split on \s+ with limit -1; k-gram join with " "; distinct).
    */
  def shingleStrings(text: UTF8String, k: Int): java.util.LinkedHashSet[String] = {
    val toks = text.toString.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[String]()
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
        seen.add(sb.toString)
        i += 1
      }
    } else {
      var i = 0
      while (i < toks.length) { seen.add(toks(i)); i += 1 }
    }
    seen
  }

  /** Per-shingle md5-60-bit hashes, distinct, first-occurrence order. */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val sh = shingleStrings(text, k)
    val out = new Array[Long](sh.size)
    val it = sh.iterator()
    var i = 0
    while (it.hasNext) { out(i) = hashString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature: lane pairs from seeded digests md5("g#" + h0
    * decimal), g = 0 until numHashes/2 — two 60-bit lanes per digest.
    */
  def signature(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val sh = shingleStrings(text, k)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = sh.iterator()
    while (it.hasNext) {
      val h0 = hashString(it.next())
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
    val sh = shingleStrings(text, k)
    val votes = new Array[Int](60)
    val it = sh.iterator()
    while (it.hasNext) {
      val h = hashString(it.next())
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
