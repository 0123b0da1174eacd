package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenize-and-shingle core shared by every per-row shingle
  * expression ([[ShingleHashes]], [[XxShingleHash]], [[Md5ShingleHash]]).
  *
  * Semantics are EXACTLY the `text.toString.split("\\s+", -1)` + k-gram
  * `" "`-join the expressions previously materialized per window, but
  * computed once per row over the raw UTF-8 bytes:
  *
  *  - Java's `\s` is the 6 ASCII bytes `[ \t\n\x0B\f\r]` (no
  *    UNICODE_CHARACTER_CLASS), each a single UTF-8 byte that can never
  *    occur inside a multi-byte sequence — so byte-level splitting of
  *    VALID UTF-8 (the parquet string contract) is equivalent to
  *    splitting the decoded string.
  *  - `split(_, -1)` semantics preserved: an empty leading token when
  *    the text starts with whitespace, an empty trailing token when it
  *    ends with whitespace, a single empty token for the empty string.
  *  - every k-window's shingle is a CONTIGUOUS slice of the normalized
  *    buffer (all tokens joined by single spaces), so no per-window
  *    string/StringBuilder/encode allocation exists: consumers hash the
  *    slice in place. Round-17 stage audit motivated this: the two
  *    tokenize+hash passes were ~2/3 of pair-mining executor time, and
  *    most of it was per-window string churn, not hashing.
  *
  * Distinctness helpers mirror the two dedup contracts the expressions
  * pinned: [[distinctHashes]] dedups BY 64-bit HASH (ShingleHashes'
  * existing contract), [[Dedup]] dedups BY CONTENT with byte equality on
  * probe-hash match (the md5/minhash/simhash families' distinct-string
  * contract — bit-exact even under a 64-bit hash collision).
  */
object ShingleWalk {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Tokens of one row, normalized: `buf` holds all tokens joined by
    * single spaces; token i spans [starts(i), ends(i)); the k-shingle at
    * window i is buf[starts(i), ends(i + k - 1)).
    */
  final class Norm(val buf: Array[Byte], val starts: Array[Int],
      val ends: Array[Int], val n: Int)

  def tokenize(text: UTF8String): Norm = {
    val bytes = text.getBytes
    val len = bytes.length
    // pass 1: count tokens (split("\s+", -1) contract)
    var n = 0
    var i = 0
    if (len == 0) n = 1
    else {
      if (isWs(bytes(0))) n += 1 // leading empty token
      while (i < len) {
        if (!isWs(bytes(i))) { n += 1; while (i < len && !isWs(bytes(i))) i += 1 }
        else i += 1
      }
      if (isWs(bytes(len - 1))) n += 1 // trailing empty token
    }
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    val buf = new Array[Byte](if (n == 0) 0 else len + n - 1) // upper bound
    var t = 0
    var o = 0
    @inline def put(s: Int, e: Int): Unit = {
      if (t > 0) { buf(o) = ' '; o += 1 }
      starts(t) = o
      var j = s
      while (j < e) { buf(o) = bytes(j); o += 1; j += 1 }
      ends(t) = o
      t += 1
    }
    if (len == 0) put(0, 0)
    else {
      if (isWs(bytes(0))) put(0, 0)
      i = 0
      while (i < len) {
        if (!isWs(bytes(i))) {
          val s = i
          while (i < len && !isWs(bytes(i))) i += 1
          put(s, i)
        } else i += 1
      }
      if (isWs(bytes(len - 1))) put(len, len)
    }
    new Norm(buf, starts, ends, n)
  }

  /** Number of k-windows (tokens themselves when fewer than k). */
  @inline def windows(norm: Norm, k: Int): Int =
    if (norm.n >= k) norm.n - k + 1 else norm.n

  /** Start offset of window i's shingle slice in norm.buf. */
  @inline def winStart(norm: Norm, k: Int, i: Int): Int = norm.starts(i)

  /** End offset (exclusive) of window i's shingle slice. */
  @inline def winEnd(norm: Norm, k: Int, i: Int): Int =
    if (norm.n >= k) norm.ends(i + k - 1) else norm.ends(i)

  /** Open-addressed distinct-LONG set preserving first-occurrence order —
    * the [[ShingleHashes]] dedup-by-hash contract without per-element
    * boxing. Capacity is sized once from the window count.
    */
  final class LongSet(expected: Int) {
    private val cap = {
      var c = 8
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val used = new Array[Boolean](cap)
    val order = new Array[Long](math.max(expected, 1))
    var size = 0
    /** add if absent; true when newly added */
    def add(h: Long): Boolean = {
      // fibonacci scatter of Long.hashCode; & mask keeps it in range
      var idx = ((h ^ (h >>> 32)).toInt * -1640531527) & mask
      while (used(idx)) {
        if (keys(idx) == h) return false
        idx = (idx + 1) & mask
      }
      used(idx) = true
      keys(idx) = h
      order(size) = h
      size += 1
      true
    }
  }

  /** Distinct shingle-slice windows BY CONTENT (byte equality on a
    * probe-hash match — exact under collisions), first-occurrence order.
    * Returns the window indices of the distinct shingles.
    */
  final class Dedup(norm: Norm, k: Int) {
    private val nw = windows(norm, k)
    private val cap = {
      var c = 8
      while (c < nw * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val slot = new Array[Int](cap) // window index + 1; 0 = empty
    val order = new Array[Int](math.max(nw, 1))
    var size = 0

    @inline private def eq(a: Int, b: Int): Boolean = {
      val as = winStart(norm, k, a); val ae = winEnd(norm, k, a)
      val bs = winStart(norm, k, b); val be = winEnd(norm, k, b)
      if (ae - as != be - bs) return false
      var i = 0
      val n = ae - as
      while (i < n) {
        if (norm.buf(as + i) != norm.buf(bs + i)) return false
        i += 1
      }
      true
    }

    /** add window w (probeHash = any stable 64-bit hash of its bytes);
      * true when its content was not seen before.
      */
    def add(w: Int, probeHash: Long): Boolean = {
      var idx = ((probeHash ^ (probeHash >>> 32)).toInt * -1640531527) & mask
      while (slot(idx) != 0) {
        if (eq(slot(idx) - 1, w)) return false
        idx = (idx + 1) & mask
      }
      slot(idx) = w + 1
      order(size) = w
      size += 1
      true
    }
  }

  /** The shingle slice of window i as a (non-copying) UTF8String view. */
  @inline def slice(norm: Norm, k: Int, i: Int): UTF8String =
    UTF8String.fromBytes(norm.buf, winStart(norm, k, i),
      winEnd(norm, k, i) - winStart(norm, k, i))
}
