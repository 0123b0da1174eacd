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

  /** Java entry point used by both interpreted and generated code.
    * Byte-level tokenize + in-place slice hashing ([[ShingleWalk]]):
    * bit-identical to the former per-window toString/split/
    * StringBuilder/fromString chain on valid UTF-8, minus all of its
    * per-window allocations (round-17: this pass ran TWICE under every
    * pair-mining query and was ~2/3 of their executor time). Dedup is
    * by 64-bit hash, unchanged (same sequence as array_distinct over
    * shingle strings followed by xxhash64, modulo hash collision — the
    * contract ShingleHashesSpec pins).
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val norm = ShingleWalk.tokenize(text)
    val nw = ShingleWalk.windows(norm, k)
    val seen = new ShingleWalk.LongSet(nw)
    var i = 0
    while (i < nw) {
      seen.add(XxHash64Function.hash(ShingleWalk.slice(norm, k, i),
        org.apache.spark.sql.types.StringType, Seed))
      i += 1
    }
    val out = new Array[Long](seen.size)
    System.arraycopy(seen.order, 0, out, 0, seen.size)
    new GenericArrayData(out)
  }
}

/** Runtime registration of graft's custom expressions — usable both as a
  * `SparkSessionExtensions` hook (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and directly on
  * a live session via [[GraftFunctions.register]].
  *
  * Every codegen'd expression in this package gets a SQL name, so the
  * whole surface is reachable from `spark.sql` / JDBC without touching
  * the Column API: the xxhash64 family (`shingle_hashes`,
  * `minhash_xx_signature`, `simhash_xx`), the md5 family the DuckDB
  * oracle recomputes (`shingle_md5_hashes`, `minhash_md5_signature`,
  * `simhash_md5`), `nfc_normalize`, `vector_dot`, `sign_bands`, and the
  * bounded-heap aggregate `top_k_by_score`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // the ranked-dedup window idiom rewritten to its sort-free
    // aggregate form for SQL consumers (see RankedDedupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RankedDedupRewrite)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder

  /** Integer argument of a SQL call: must be a foldable literal — these
    * parameters size static structures (plane matrices, heap bounds), so
    * a per-row value has no meaning.
    */
  private def intArg(e: Expression, fn: String, pos: String): Int = {
    require(e.foldable, s"$fn: $pos must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $pos must be an integer literal, got $other")
    }
  }

  private def desc(name: String, clazz: Class[_], usage: String)(
      build: PartialFunction[Seq[Expression], Expression])
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, null, name, usage, ""),
    (children: Seq[Expression]) =>
      build.applyOrElse(children, (_: Seq[Expression]) =>
        throw new IllegalArgumentException(s"$name: wrong arguments — usage: $usage"))
  )

  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    desc("shingle_hashes", classOf[ShingleHashes],
      "shingle_hashes(text[, k=3]) - distinct xxhash64 k-token shingles") {
      case Seq(text) => ShingleHashes(text, 3)
      case Seq(text, k) => ShingleHashes(text, intArg(k, "shingle_hashes", "k"))
    },
    desc("minhash_xx_signature", classOf[MinhashXxSignature],
      "minhash_xx_signature(text, numHashes[, k=3]) - xx-family minhash lanes") {
      case Seq(text, n) =>
        MinhashXxSignature(text, 3, intArg(n, "minhash_xx_signature", "numHashes"))
      case Seq(text, n, k) => MinhashXxSignature(text,
        intArg(k, "minhash_xx_signature", "k"),
        intArg(n, "minhash_xx_signature", "numHashes"))
    },
    desc("simhash_xx", classOf[SimhashXx],
      "simhash_xx(text[, k=3]) - 64-bit xx-family simhash fingerprint") {
      case Seq(text) => SimhashXx(text, 3)
      case Seq(text, k) => SimhashXx(text, intArg(k, "simhash_xx", "k"))
    },
    desc("shingle_md5_hashes", classOf[ShingleMd5Hashes],
      "shingle_md5_hashes(text[, k=3]) - distinct md5-long k-token shingles") {
      case Seq(text) => ShingleMd5Hashes(text, 3)
      case Seq(text, k) => ShingleMd5Hashes(text, intArg(k, "shingle_md5_hashes", "k"))
    },
    desc("minhash_md5_signature", classOf[MinhashMd5Signature],
      "minhash_md5_signature(text, numHashes[, k=3]) - md5-family minhash lanes") {
      case Seq(text, n) =>
        MinhashMd5Signature(text, 3, intArg(n, "minhash_md5_signature", "numHashes"))
      case Seq(text, n, k) => MinhashMd5Signature(text,
        intArg(k, "minhash_md5_signature", "k"),
        intArg(n, "minhash_md5_signature", "numHashes"))
    },
    desc("simhash_md5", classOf[SimhashMd5],
      "simhash_md5(text[, k=3]) - 60-bit md5-family simhash fingerprint") {
      case Seq(text) => SimhashMd5(text, 3)
      case Seq(text, k) => SimhashMd5(text, intArg(k, "simhash_md5", "k"))
    },
    desc("nfc_normalize", classOf[NfcNormalize],
      "nfc_normalize(text) - Unicode NFC canonicalization") {
      case Seq(text) => NfcNormalize(text)
    },
    desc("vector_dot", classOf[VectorDot],
      "vector_dot(a, b) - dot product of two array<double> columns") {
      case Seq(a, b) => VectorDot(a, b)
    },
    desc("vector_sqdist", classOf[VectorSqDist],
      "vector_sqdist(a, b) - squared Euclidean distance of two array<double> columns") {
      case Seq(a, b) => VectorSqDist(a, b)
    },
    desc("sign_bands", classOf[SignBands],
      "sign_bands(vec, nBits, bands) - random-hyperplane LSH band buckets") {
      case Seq(v, nBits, bands) => SignBands(v,
        intArg(nBits, "sign_bands", "nBits"), intArg(bands, "sign_bands", "bands"))
    },
    desc("top_k_by_score", classOf[TopKByScore],
      "top_k_by_score(struct(score, id), k) - bounded-heap per-group top-k " +
        "array<struct<id, score>> sorted (score DESC, id ASC)") {
      case Seq(child, k) => TopKByScore(child, intArg(k, "top_k_by_score", "k"))
    },
    desc("gram_matrix", classOf[GramMatrix],
      "gram_matrix(vec, dim, scale) - packed integer-quantized second-moment " +
        "accumulator: struct<n, sums, gram (upper triangle)>") {
      case Seq(v, dim, scale) => GramMatrix(v,
        intArg(dim, "gram_matrix", "dim"),
        intArg(scale, "gram_matrix", "scale").toDouble)
    },
    desc("bpe_segment", classOf[BpeSegment],
      "bpe_segment(word, merges) - BPE subwords of one token under a " +
        "'lhs rhs'-formatted merge-list literal (rank = position)") {
      case Seq(w, m) => BpeSegment(w, mergesArg(m, "bpe_segment"))
    },
    desc("bpe_encode", classOf[BpeEncode],
      "bpe_encode(text, merges) - whitespace tokenize + BPE-segment each " +
        "token under a 'lhs rhs'-formatted merge-list literal") {
      case Seq(t, m) => BpeEncode(t, mergesArg(m, "bpe_encode"))
    },
    desc("cdc_cuts", classOf[CdcCuts],
      "cdc_cuts(text, w, m) - content-defined chunk cut END positions " +
        "(1-based code points): w-wide windows whose Rabin-style " +
        "fingerprint is 0 mod m") {
      case Seq(text, w, m) => CdcCuts(text,
        intArg(w, "cdc_cuts", "w"), intArg(m, "cdc_cuts", "m"))
    },
    desc("adjacent_pairs", classOf[AdjacentPairs],
      "adjacent_pairs(arr) - the n-1 consecutive element pairs of an " +
        "array as array<struct<a, b>> in order") {
      case Seq(a) => AdjacentPairs(a)
    },
    desc("upper_triangle_pairs", classOf[UpperTrianglePairs],
      "upper_triangle_pairs(arr) - all i<j element pairs of an array as " +
        "array<struct<a, b>> in i-major order") {
      case Seq(a) => UpperTrianglePairs(a)
    },
    desc("frequent_items", classOf[FrequentItems],
      "frequent_items(item, capacity) - bounded-memory Misra-Gries " +
        "frequent-items sketch: array<struct<item, cnt_lo, cnt_hi>> " +
        "sorted (cnt_lo DESC, item ASC)") {
      case Seq(item, cap) =>
        FrequentItems(item, intArg(cap, "frequent_items", "capacity"))
    },
    desc("hll_registers", classOf[HllRegisters],
      "hll_registers(hash64, p) - HyperLogLog sketch over pre-hashed " +
        "64-bit ids: struct<registers array<struct<bucket, register>>, " +
        "nnz, est_raw>") {
      case Seq(h, p) => HllRegisters(h, intArg(p, "hll_registers", "p"))
    },
    desc("hll_merge_registers", classOf[HllMergeRegisters],
      "hll_merge_registers(registers, p) - re-merge persisted HLL " +
        "register arrays (elementwise max) into one sketch") {
      case Seq(r, p) =>
        HllMergeRegisters(r, intArg(p, "hll_merge_registers", "p"))
    },
    desc("cms_counters", classOf[CmsCounters],
      "cms_counters(hash64, d, logW) - count-min sketch grid over " +
        "pre-hashed 64-bit ids: struct<n_total, counters>") {
      case Seq(h, d, w) => CmsCounters(h,
        intArg(d, "cms_counters", "d"), intArg(w, "cms_counters", "logW"))
    },
    desc("cms_merge_counters", classOf[CmsMergeCounters],
      "cms_merge_counters(counters, d, logW) - re-merge persisted " +
        "count-min grids (elementwise add) into one sketch") {
      case Seq(c, d, w) => CmsMergeCounters(c,
        intArg(d, "cms_merge_counters", "d"),
        intArg(w, "cms_merge_counters", "logW"))
    },
    desc("kmv_merge_vals", classOf[KmvMergeVals],
      "kmv_merge_vals(vals, k) - re-merge persisted KMV/theta bottom-k " +
        "hash arrays (union + retain k smallest) into one sketch: " +
        "struct<vals, theta, est>") {
      case Seq(v, k) => KmvMergeVals(v, intArg(k, "kmv_merge_vals", "k"))
    },
    desc("unigram_encode", classOf[UnigramEncode],
      "unigram_encode(text, pieces, maxLen, charCost) - whitespace " +
        "tokenize + unigram-LM Viterbi-segment each token under a " +
        "'piece cost'-formatted literal piece table (integer costs; " +
        "charCost = the always-available single-character fallback)") {
      case Seq(t, p, maxLen, charCost) => UnigramEncode(t,
        piecesArg(p, "unigram_encode"),
        intArg(maxLen, "unigram_encode", "maxLen"),
        intArg(charCost, "unigram_encode", "charCost").toLong)
    }
  )

  /** Merge-list argument: a foldable `array<string>` literal of
    * space-separated pairs (`array('e s', 'es t', ...)`), rank =
    * position — symbols from whitespace-tokenized text cannot contain a
    * space, so the encoding is unambiguous.
    */
  private def mergesArg(e: Expression, fn: String): Seq[(String, String)] = {
    require(e.foldable, s"$fn: merges must be a literal array<string>")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val s = a.getUTF8String(i).toString
          val sp = s.indexOf(' ')
          require(sp > 0 && sp < s.length - 1,
            s"$fn: each merge must be 'lhs rhs', got '$s'")
          (s.substring(0, sp), s.substring(sp + 1))
        }
      case other => throw new IllegalArgumentException(
        s"$fn: merges must be an array<string> literal, got $other")
    }
  }

  /** Piece-table argument: a foldable `array<string>` literal of
    * space-separated (piece, integer cost) pairs
    * (`array('table 75000', 'le 39000', ...)`).
    */
  private def piecesArg(e: Expression, fn: String): Seq[(String, Long)] = {
    require(e.foldable, s"$fn: pieces must be a literal array<string>")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val s = a.getUTF8String(i).toString
          val sp = s.lastIndexOf(' ')
          require(sp > 0 && sp < s.length - 1,
            s"$fn: each piece must be 'piece cost', got '$s'")
          val cost = try s.substring(sp + 1).toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"$fn: cost must be an integer, got '$s'")
          }
          (s.substring(0, sp), cost)
        }
      case other => throw new IllegalArgumentException(
        s"$fn: pieces must be an array<string> literal, got $other")
    }
  }

  /** Register all graft functions on an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
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
