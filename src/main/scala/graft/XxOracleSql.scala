package graft

/** DuckDB SQL that recomputes Spark's xxhash64 (XXH64) bit for bit, so
  * the three xx-family dedup tiers (`dd_minhash_lsh`, `dd_simhash`,
  * `dd_embed_neardup_lsh`) get REAL value-level oracles instead of the
  * rows-only fallback they carried through round 9.
  *
  * XXH64 is public-domain arithmetic (the constants and round structure
  * below are the published algorithm, as implemented by Spark's
  * catalyst XXH64 for the `xxhash64` SQL function). DuckDB has no
  * native xxhash64, but it has 128-bit HUGEINT — wide enough to express
  * wrapping unsigned-64 arithmetic as `% 2^64` modular arithmetic with
  * a split-multiply for the 64×64-bit products.
  *
  * Round-10 structure: ONE single-statement `WITH … SELECT` per query.
  * The round-9 version was a multi-statement script (macro DDL + temp
  * tables); the driver's oracle runner only accepts a single
  * SELECT-shaped statement (it wraps the SQL as a subquery), so those
  * scripts were recorded as `no_oracle`. The same staging discipline
  * survives the rewrite:
  *
  *  - the word primitives (wrapping mul/rot/xor/shift-fold, byte
  *    extraction from a hex dump of the UTF-8 bytes) are kept as a
  *    macro table and textually inlined by [[expand]] — exactly the
  *    substitution DuckDB's own `CREATE MACRO` binder performs, minus
  *    the DDL statements.
  *  - the hash proper is a chain of `name AS MATERIALIZED (…)` CTEs,
  *    one XXH64 phase per stage (stripe lanes, merge rounds, 8/4/1-byte
  *    tails, avalanche). `MATERIALIZED` forces a binder break per
  *    stage, so every macro argument is a plain column reference of the
  *    previous stage and the bound expression tree stays flat — the
  *    same property the temp-table chain had, without statements.
  *    At the verify scale (sf 0.01) the whole chain materializes a few
  *    hundred thousand narrow rows.
  *
  * Values are carried as non-negative HUGEINTs in [0, 2^64); `xu_s64`
  * reinterprets to Spark's signed long at the boundary (lane mins and
  * final outputs compare SIGNED, matching Java long comparison).
  *
  * Parity targets (all pinned by checked-in sf0.01 fixtures,
  * FixtureOracleSpec): minhash lane i = xxhash64(i:int, h0:long) with
  * the string hashed once (XxShingleExprs.scala), simhash = 64-bit
  * ±1 bit votes over h0, embed planes = SignBands.planes' splitmix-
  * style (i, j) mix (SignBands.scala:67-69).
  */
object XxOracleSql {

  private val M = "18446744073709551616" // 2^64

  /** Inline-expansion macro table: name -> (params, body). XXH64 primes
    * (unsigned): P1=11400714785074694791 P2=14029467366897019727
    * P3=1609587929392839161 P4=9650029242287828579
    * P5=2870177450012600261. All take/return HUGEINT in [0, 2^64).
    */
  private val macros: Seq[(String, Seq[String], String)] = Seq(
    // wrapping 64x64 multiply: split both factors at 2^32 so no
    // intermediate exceeds HUGEINT's 2^127-1
    ("xu_mul", Seq("a", "b"),
      s"""((a % 4294967296) * (b % 4294967296)
         |   + (((a // 4294967296) * (b % 4294967296)
         |       + (a % 4294967296) * (b // 4294967296)) % 4294967296) * 4294967296)
         |  % $M""".stripMargin),
    // rotl by r: pl = 2^r, pr = 2^(64-r); the two halves occupy
    // disjoint bit ranges so + is |
    ("xu_rot", Seq("x", "pl", "pr"), s"(x * pl) % $M + (x // pr)"),
    ("xu_sx", Seq("h", "p"), "xor(h, h // p)"), // h ^= h >>> log2 p
    // XXH64 avalanche: h^=h>>>33; h*=P2; h^=h>>>29; h*=P3; h^=h>>>32
    ("xu_fmix", Seq("h"),
      """xu_sx(xu_mul(xu_sx(xu_mul(xu_sx(h, 8589934592), 14029467366897019727),
        |                     536870912), 1609587929392839161), 4294967296)""".stripMargin),
    ("xu_u64", Seq("x"), s"CASE WHEN x < 0 THEN x + $M ELSE x END"),
    ("xu_s64", Seq("x"),
      s"""CAST(CASE WHEN x >= 9223372036854775808 THEN x - $M
         |            ELSE x END AS BIGINT)""".stripMargin),
    // hashInt: h = seed+P5+4; h ^= (i&0xffffffff)*P1; h = rotl(h,23)*P2+P3; fmix
    ("xxh64_int", Seq("iu", "seed"),
      s"""xu_fmix((xu_mul(xu_rot(xor((seed + 2870177450012600265) % $M,
         |                             xu_mul(iu, 11400714785074694791)),
         |                         8388608, 2199023255552),
         |                  14029467366897019727) + 1609587929392839161) % $M)""".stripMargin),
    // byte / little-endian word extraction from a hex dump (0-based
    // byte offset j); '0x...' parses as BIGINT (not HUGEINT), so w8
    // assembles from two 32-bit halves
    ("xh_b", Seq("hx", "j"),
      "CAST(CAST(concat('0x', substr(hx, 2*j+1, 2)) AS BIGINT) AS HUGEINT)"),
    ("xh_w4", Seq("hx", "j"),
      """CAST(CAST(concat('0x', substr(hx,2*j+7,2), substr(hx,2*j+5,2),
        |              substr(hx,2*j+3,2), substr(hx,2*j+1,2)) AS BIGINT) AS HUGEINT)""".stripMargin),
    ("xh_w8", Seq("hx", "j"), "xh_w4(hx, j+4) * 4294967296 + xh_w4(hx, j)"),
    // one 32-byte-stripe accumulator lane: fold round() over the words
    // at byte offsets 32s + 8*lane, s < ns (ns = 0 folds nothing)
    ("xh_lane", Seq("hx", "ns", "lane", "init"),
      s"""list_reduce(list_prepend(init,
         |    list_transform(range(0, ns), s -> xh_w8(hx, 32*s + 8*lane))),
         |    (acc, w) -> xu_mul(xu_rot((acc + xu_mul(w, 14029467366897019727)) % $M,
         |                              2147483648, 8589934592),
         |                       11400714785074694791))""".stripMargin),
    // merge round: h = (h ^ (rotl(v*P2,31)*P1))*P1 + P4
    ("xh_merge", Seq("h", "v"),
      s"""(xu_mul(xor(h, xu_mul(xu_rot(xu_mul(v, 14029467366897019727),
         |                               2147483648, 8589934592),
         |                        11400714785074694791)),
         |          11400714785074694791) + 9650029242287828579) % $M""".stripMargin),
    // 8-byte tail words ((n%32)//8 of them, from byte 32*(n//32))
    ("xh_t8", Seq("hx", "n", "h"),
      s"""list_reduce(list_prepend(h,
         |    list_transform(range(0, (n % 32) // 8), t -> xh_w8(hx, 32*(n // 32) + 8*t))),
         |    (acc, w) -> (xu_mul(xu_rot(xor(acc,
         |        xu_mul(xu_rot(xu_mul(w, 14029467366897019727), 2147483648, 8589934592),
         |               11400714785074694791)),
         |        134217728, 137438953472), 11400714785074694791)
         |      + 9650029242287828579) % $M)""".stripMargin),
    // optional 4-byte tail word at byte (n//8)*8. The hex dump is
    // zero-padded past n so the not-taken arm never reads off the end
    // even under eager CASE evaluation.
    ("xh_t4", Seq("hx", "n", "h"),
      s"""CASE WHEN n % 8 >= 4 THEN
         |    (xu_mul(xu_rot(xor(h, xu_mul(xh_w4(hx, (n // 8) * 8), 11400714785074694791)),
         |                   8388608, 2199023255552), 14029467366897019727)
         |     + 1609587929392839161) % $M
         |  ELSE h END""".stripMargin),
    // trailing n%4 single bytes
    ("xh_tb", Seq("hx", "n", "h"),
      """list_reduce(list_prepend(h,
        |    list_transform(range(0, n % 4), t -> xh_b(hx, n - (n % 4) + t))),
        |    (acc, b) -> xu_mul(xu_rot(xor(acc, xu_mul(b, 2870177450012600261)),
        |                              2048, 9007199254740992),
        |                       11400714785074694791))""".stripMargin)
  )

  private val byName: Map[String, (Seq[String], String)] =
    macros.map { case (n, p, b) => n -> (p, b) }.toMap

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Split `s` (the text between a call's parentheses) at top-level
    * commas, respecting nested parens, brackets and single-quoted
    * strings.
    */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Find the end index (exclusive, past the closing paren) of the call
    * whose opening paren is at `open`.
    */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var inStr = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens after $open in: $s")
  }

  /** Textually inline every macro call in `expr` — the substitution
    * DuckDB's macro binder performs (arguments substitute as
    * parenthesized subtrees), done ahead of time so the emitted SQL
    * needs no CREATE MACRO statements. Iterates to a fixed point, so
    * macros calling macros (fmix → sx/mul, lane → w8 → w4) resolve
    * fully.
    */
  private[graft] def expand(expr: String): String = {
    var s = expr
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      val sb = new StringBuilder
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') { // skip string literals verbatim
          val close = s.indexOf('\'', i + 1)
          sb.append(s.substring(i, close + 1)); i = close + 1
        } else if (isIdentChar(c) && (i == 0 || !isIdentChar(s.charAt(i - 1)))) {
          var j = i
          while (j < s.length && isIdentChar(s.charAt(j))) j += 1
          val word = s.substring(i, j)
          byName.get(word) match {
            case Some((params, body)) if j < s.length && s.charAt(j) == '(' =>
              val end = matchParen(s, j)
              val args = splitArgs(s.substring(j + 1, end - 1))
              require(args.length == params.length,
                s"$word expects ${params.length} args, got ${args.length}")
              // simultaneous substitution (DuckDB macro semantics):
              // placeholder pass first, so an argument that mentions a
              // later parameter's name (e.g. a lambda variable `b`
              // passed into xu_mul(a, b)) is never re-substituted
              var rep = body
              params.zipWithIndex.foreach { case (p, ix) =>
                rep = rep.replaceAll(s"\\b$p\\b", s"@@A$ix@@")
              }
              args.zipWithIndex.foreach { case (a, ix) =>
                rep = rep.replace(s"@@A$ix@@", s"(${a.trim})")
              }
              sb.append('(').append(rep).append(')')
              i = end
              changed = true
            case _ =>
              sb.append(word); i = j
          }
        } else { sb.append(c); i += 1 }
      }
      s = sb.toString
    }
    s
  }

  /** Assemble the single statement: every (name, query) stage becomes a
    * MATERIALIZED CTE (binder break per XXH64 phase), the last element
    * is the outer SELECT. All macro calls are inlined.
    */
  private def single(ctes: Seq[(String, String)], finalSelect: String): String =
    "WITH " + ctes.map { case (n, q) => s"$n AS MATERIALIZED (${expand(q)})" }
      .mkString(",\n") + "\n" + expand(finalSelect)

  /** Staged XXH64 of the UTF-8 bytes of `strExpr` with HUGEINT seed
    * `seedExpr` (both evaluated against `src`). Emits CTE stages
    * `<pfx>c1..c12`; the final stage has `keys` + `outCol` (signed
    * BIGINT). Stage init seeds: v1 = seed+P1+P2, v2 = seed+P2,
    * v3 = seed, v4 = seed-P1 (all mod 2^64).
    */
  def strChain(src: String, keys: Seq[String], strExpr: String,
      seedExpr: String, pfx: String, outCol: String): (Seq[(String, String)], String) = {
    val k = keys.mkString(", ")
    def tt(name: String, prev: String, cols: String) =
      (s"$pfx$name", s"SELECT $k, $cols FROM $pfx$prev")
    val parts = Seq(
      (s"${pfx}c1", s"SELECT $k, $seedExpr AS se, " +
        s"hex(encode($strExpr)) || repeat('0', 64) AS hx, " +
        s"octet_length(encode($strExpr)) AS n FROM $src"),
      tt("c2", "c1", "se, hx, n, " +
        s"xh_lane(hx, n // 32, 0, (se + 6983438078262162902) % $M) AS v1, " +
        s"xh_lane(hx, n // 32, 1, (se + 14029467366897019727) % $M) AS v2, " +
        "xh_lane(hx, n // 32, 2, se) AS v3, " +
        s"xh_lane(hx, n // 32, 3, (se + 7046029288634856825) % $M) AS v4"),
      tt("c3", "c2", "se, hx, n, v1, v2, v3, v4, " +
        "(xu_rot(v1, 2, 9223372036854775808) + xu_rot(v2, 128, 144115188075855872) " +
        s"+ xu_rot(v3, 4096, 4503599627370496) + xu_rot(v4, 262144, 70368744177664)) % $M AS m0"),
      tt("c4", "c3", "se, hx, n, v2, v3, v4, xh_merge(m0, v1) AS m1"),
      tt("c5", "c4", "se, hx, n, v3, v4, xh_merge(m1, v2) AS m2"),
      tt("c6", "c5", "se, hx, n, v4, xh_merge(m2, v3) AS m3"),
      tt("c7", "c6", "se, hx, n, xh_merge(m3, v4) AS m4"),
      tt("c8", "c7",
        s"hx, n, ((CASE WHEN n >= 32 THEN m4 ELSE (se + 2870177450012600261) % $M END) + n) % $M AS a1"),
      tt("c9", "c8", "hx, n, xh_t8(hx, n, a1) AS a2"),
      tt("c10", "c9", "hx, n, xh_t4(hx, n, a2) AS a3"),
      tt("c11", "c10", "hx, n, xh_tb(hx, n, a3) AS a4"),
      tt("c12", "c11", s"xu_s64(xu_fmix(a4)) AS $outCol"))
    (parts, s"${pfx}c12")
  }

  /** Staged XXH64 of one 8-byte long (`luExpr`, unsigned HUGEINT) with
    * seed `seedExpr` — the minhash lane re-hash. Same staging rationale.
    */
  def longChain(src: String, keys: Seq[String], luExpr: String,
      seedExpr: String, pfx: String, outCol: String): (Seq[(String, String)], String) = {
    val k = keys.mkString(", ")
    def tt(name: String, prev: String, cols: String) =
      (s"$pfx$name", s"SELECT $k, $cols FROM $pfx$prev")
    val parts = Seq(
      (s"${pfx}l1", s"SELECT $k, $seedExpr AS se, $luExpr AS lu FROM $src"),
      tt("l2", "l1", "se, " +
        "xu_mul(xu_rot(xu_mul(lu, 14029467366897019727), 2147483648, 8589934592), " +
        "11400714785074694791) AS k1"),
      tt("l3", "l2",
        s"(xu_mul(xu_rot(xor((se + 2870177450012600269) % $M, k1), " +
        s"134217728, 137438953472), 11400714785074694791) + 9650029242287828579) % $M AS h2"),
      tt("l4", "l3", "xu_mul(xu_sx(h2, 8589934592), 14029467366897019727) AS f1"),
      tt("l5", "l4", "xu_mul(xu_sx(f1, 536870912), 1609587929392839161) AS f2"),
      tt("l6", "l5", s"xu_s64(xu_sx(f2, 4294967296)) AS $outCol"))
    (parts, s"${pfx}l6")
  }

  /** Full oracle for `dd_minhash_lsh` (32 lanes / 8 bands / jaccard_e4
    * >= 5000 on the xx-hashed shingle sets). `w`/`shingle` are the
    * DuckDB token/3-gram-shingle fragments shared with the md5 twins.
    */
  /** Shared xx-minhash CTE chain: signatures (`mh_sig(doc_id, sig)`),
    * distinct shingle lists (`mh_hl(doc_id, hl)`), and LSH candidate
    * pairs (`mh_cand(id_a, id_b)`).
    */
  private def minhashCtes(w: String, shingle: String): Seq[(String, String)] = {
    val (h0S, h0T) = strChain("mh_u0", Seq("doc_id", "sg"), "sg", "42::HUGEINT", "mh_h_", "h0")
    val (mhS, mhT) = longChain("mh_lx0", Seq("doc_id", "i"),
      "xu_u64(CAST(h0 AS HUGEINT))", "lseed", "mh_m_", "mh")
    val (bkS, bkT) = strChain("mh_bd0", Seq("doc_id", "b"), "bs", "bseed", "mh_k_", "bkt")
    Seq(
      ("mh_u0", s"WITH t AS (SELECT doc_id, $w AS w FROM documents), " +
        s"s AS (SELECT doc_id, $shingle AS sh FROM t) SELECT doc_id, unnest(sh) AS sg FROM s")
    ) ++ h0S ++ Seq(
      ("mh_hl", s"SELECT doc_id, list(h0) AS hl FROM $h0T GROUP BY doc_id"),
      ("mh_lanes", "SELECT i, " +
        "xxh64_int(CAST(i AS HUGEINT), 42::HUGEINT) AS lseed FROM range(0, 32) r(i)"),
      ("mh_lx0", s"SELECT x.doc_id, l.i, x.h0, l.lseed FROM $h0T x, mh_lanes l")
    ) ++ mhS ++ Seq(
      ("mh_lh", s"SELECT doc_id, i, min(mh) AS mh FROM $mhT GROUP BY doc_id, i"),
      ("mh_sig", "SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh_lh GROUP BY doc_id"),
      ("mh_bseeds", "SELECT b, " +
        "xxh64_int(CAST(b AS HUGEINT), 42::HUGEINT) AS bseed FROM range(0, 8) r(b)"),
      ("mh_bd0", "SELECT doc_id, b, " +
        "array_to_string(sig[b*4+1 : b*4+4], ',') AS bs, bseed FROM mh_sig, mh_bseeds")
    ) ++ bkS ++ Seq(
      ("mh_cand", "SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b " +
        s"FROM $bkT a JOIN $bkT c ON a.b = c.b AND a.bkt = c.bkt AND a.doc_id < c.doc_id"))
  }

  def minhash(w: String, shingle: String): String =
    single(minhashCtes(w, shingle),
      "SELECT id_a, id_b, jaccard_e4 FROM (SELECT mh_cand.id_a, mh_cand.id_b, " +
        "CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 / " +
        "(len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl)))) AS BIGINT) AS jaccard_e4 " +
        "FROM mh_cand JOIN mh_hl ha ON ha.doc_id = mh_cand.id_a " +
        "JOIN mh_hl hb ON hb.doc_id = mh_cand.id_b) WHERE jaccard_e4 >= 5000")

  /** Oracle for `dd_minhash_calibration`: every LSH candidate pair with
    * its EXACT jaccard and the 32-lane signature-agreement ESTIMATE —
    * the measurement row pinning how well the sketch tracks the truth
    * ([[graft.operators.TextDedup]] computes the same two numbers).
    */
  def minhashCalibration(w: String, shingle: String): String =
    single(minhashCtes(w, shingle),
      """SELECT id_a, id_b, jaccard_e4, est_e4,
        |  abs(est_e4 - jaccard_e4) AS abs_err_e4
        |FROM (SELECT mh_cand.id_a, mh_cand.id_b,
        |  CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 /
        |    (len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl))))
        |    AS BIGINT) AS jaccard_e4,
        |  CAST((len([i for i in range(1, 33)
        |    if sa.sig[i] = sb.sig[i]]) * 10000) // 32 AS BIGINT) AS est_e4
        |  FROM mh_cand
        |  JOIN mh_hl ha ON ha.doc_id = mh_cand.id_a
        |  JOIN mh_hl hb ON hb.doc_id = mh_cand.id_b
        |  JOIN mh_sig sa ON sa.doc_id = mh_cand.id_a
        |  JOIN mh_sig sb ON sb.doc_id = mh_cand.id_b)""".stripMargin)

  /** Full oracle for `dd_simhash` (64-bit fingerprint, 4 bands x 16
    * bits, hamming <= 6). Bit i votes via (h0u >> i) & 1 on the
    * UNSIGNED value — same bits as Spark's signed >>> votes.
    */
  def simhash(w: String, shingle: String): String = {
    val (h0S, h0T) = strChain("shx_u0", Seq("doc_id", "sg"), "sg", "42::HUGEINT", "shx_h_", "h0")
    val p2 = (0 until 64).map(b => s"($b, '${BigInt(1) << b}')").mkString(", ")
    val bsv = (0 until 4).map(b => s"($b, '${BigInt(1) << (16 * b)}')").mkString(", ")
    val ctes = Seq(
      ("shx_u0", s"WITH t AS (SELECT doc_id, $w AS w FROM documents), " +
        s"s AS (SELECT doc_id, $shingle AS sh FROM t) SELECT doc_id, unnest(sh) AS sg FROM s")
    ) ++ h0S ++ Seq(
      ("shx_hu", s"SELECT doc_id, xu_u64(CAST(h0 AS HUGEINT)) AS h0u FROM $h0T"),
      ("shx_p2", s"SELECT b, CAST(p AS HUGEINT) AS p FROM (VALUES $p2) v(b, p)"),
      ("shx_bits", "SELECT doc_id, b, p, " +
        "sum(CASE WHEN (h0u // p) % 2 = 1 THEN 1 ELSE -1 END) AS vote " +
        "FROM shx_hu, shx_p2 GROUP BY doc_id, b, p"),
      ("shx_f", "SELECT doc_id, " +
        "CAST(sum(CASE WHEN vote > 0 THEN p ELSE 0::HUGEINT END) AS HUGEINT) AS fpu " +
        "FROM shx_bits GROUP BY doc_id"),
      ("shx_bsh", s"SELECT b2, CAST(s AS HUGEINT) AS s FROM (VALUES $bsv) v(b2, s)"),
      ("shx_bb", "SELECT doc_id, fpu, b2, " +
        "(fpu // s) % 65536 AS bucket FROM shx_f, shx_bsh"))
    single(ctes,
      "SELECT id_a, id_b, hamming FROM (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, " +
        "CAST(bit_count(xor(xu_s64(a.fpu), xu_s64(c.fpu))) AS INT) AS hamming " +
        "FROM shx_bb a JOIN shx_bb c ON a.b2 = c.b2 AND a.bucket = c.bucket AND a.doc_id < c.doc_id) " +
        "WHERE hamming <= 6")
  }

  /** Full oracle for `dd_embed_neardup_lsh` (224 planes / 28 bands of 8
    * bits / cos_e6 >= 450000). Plane (i,j) replays SignBands.planes'
    * mix exactly; products are folded ascending-j like VectorDot's
    * left fold, so every double rounding step matches. `cosE6` is the
    * caller's proven verify-cosine fragment over aliases a/c with
    * vector column v.
    */
  /** Shared sign-LSH band-bucket CTE chain ending in
    * `em_bb(id, band, bucket)` + the raw-vector view `em_e(id, v)` —
    * the SQL replay of [[graft.functions.SignBands]] (nBits=224 planes
    * over dim 64, 28 bands × 8 bits).
    */
  private def signBandCtes: Seq[(String, String)] = {
    // SignBands.planes constants (SignBands.scala:67-68), unsigned
    val a = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
    val b = java.lang.Long.toUnsignedString(0xC2B2AE3D27D4EB4FL)
    val c = java.lang.Long.toUnsignedString(0x165667B19E3779F9L)
    Seq(
      ("em_pl0", "SELECT i, j, " +
        s"xor(xu_mul(CAST(i AS HUGEINT), $a), xu_mul(CAST(j AS HUGEINT), $b)) AS x0 " +
        "FROM range(0, 224) a(i), range(0, 64) b(j)"),
      ("em_pl1", "SELECT i, j, " +
        s"xu_mul(xu_rot(x0, 2147483648, 8589934592), $c) AS h FROM em_pl0"),
      // (h >>> 11).toDouble / 2^52 - 1.0; both divisions exact powers of 2
      ("em_pl2", "SELECT i, j, " +
        "CAST(h // 2048 AS DOUBLE) / 4503599627370496.0 - 1.0 AS comp FROM em_pl1"),
      // vector elements as scalar rows (unnest runs lists in lockstep)
      ("em_ev", "SELECT vec_id AS id, " +
        "unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x, " +
        "unnest(range(0, len(embedding))) AS j FROM embeddings"),
      ("em_prod", "SELECT ev.id, pl.i, ev.j, " +
        "ev.x * pl.comp AS prod FROM em_ev ev JOIN em_pl2 pl USING (j)"),
      // ascending-j left fold == VectorDot's 0.0-init fold (0.0+x == x)
      ("em_dots", "SELECT id, i, " +
        "list_reduce(list(prod ORDER BY j), (x, y) -> x + y) AS d FROM em_prod GROUP BY id, i"),
      ("em_bb", "SELECT id, i // 8 AS band, " +
        "sum(CASE WHEN d >= 0 THEN (1 << (i % 8)) ELSE 0 END) AS bucket " +
        "FROM em_dots GROUP BY id, i // 8"),
      ("em_e", "SELECT vec_id AS id, embedding AS v FROM embeddings"))
  }

  def embedNearDup(cosE6: String): String = {
    val ctes = signBandCtes :+
      (("em_cand", "SELECT DISTINCT a.id AS id_a, c.id AS id_b " +
        "FROM em_bb a JOIN em_bb c ON a.band = c.band AND a.bucket = c.bucket AND a.id < c.id"))
    single(ctes,
      s"SELECT id_a, id_b, cos_e6 FROM (SELECT em_cand.id_a, em_cand.id_b, $cosE6 AS cos_e6 " +
        "FROM em_cand JOIN em_e a ON a.id = em_cand.id_a JOIN em_e c ON c.id = em_cand.id_b) " +
        "WHERE cos_e6 >= 450000")
  }

  /** Oracle for `sim_lsh_multiprobe`: queries (vec_id < nQueries) probe
    * each band's own bucket plus all 8 Hamming-1 bit flips; candidates
    * from any probed bucket are exact-cosine re-ranked to top-k — the
    * SQL replay of [[graft.operators.Similarity.lshMultiprobeTopK]].
    */
  def embedMultiprobeTopK(cosE6: String, nQueries: Int, k: Int): String = {
    val flips = (Seq(0) ++ (0 until 8).map(1 << _)).mkString(", ")
    val ctes = signBandCtes ++ Seq(
      ("em_probe", s"SELECT q.id AS query_id, q.band, " +
        s"xor(q.bucket, CAST(f.f AS BIGINT)) AS bucket " +
        s"FROM em_bb q, unnest([$flips]) AS f(f) WHERE q.id < $nQueries"),
      ("em_mpc", "SELECT DISTINCT p.query_id, c.id AS nbr_id " +
        "FROM em_probe p JOIN em_bb c ON c.band = p.band " +
        "AND c.bucket = p.bucket WHERE c.id <> p.query_id"))
    single(ctes,
      s"""SELECT query_id, nbr_id, cos_e6, rank FROM (
         |  SELECT query_id, nbr_id, cos_e6,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, nbr_id ASC) AS INT) AS rank
         |  FROM (SELECT em_mpc.query_id, em_mpc.nbr_id, $cosE6 AS cos_e6
         |        FROM em_mpc JOIN em_e a ON a.id = em_mpc.query_id
         |        JOIN em_e c ON c.id = em_mpc.nbr_id))
         |WHERE rank <= $k""".stripMargin)
  }

  /** Shared register CTEs for the HLL oracles: XXH64 each distinct
    * (event_type, user_id) via [[longChain]] (= Spark's
    * `xxhash64(user_id)`), split UNSIGNED into bucket = top `p` bits /
    * w = low `64-p` bits, register = (64-p+1) − bitlength(w) with the
    * all-zero remainder pinned to 64-p+1 — exactly
    * [[graft.functions.HllRegisters]]'s bit slicing. `bin()` gives the
    * bitlength without a float log (w < 2^55 at p=9, BIGINT-safe).
    */
  private def hllRegCtes(p: Int, idCol: String,
      grp: Seq[String]): Seq[(String, String)] = {
    val pow = java.math.BigInteger.ONE.shiftLeft(64 - p).toString
    val rmax = 64 - p + 1
    val g = grp.map(_ + ", ").mkString
    val gb = (grp :+ "bucket").mkString(", ")
    val (hS, hT) = longChain("hl_du", grp :+ idCol,
      s"xu_u64(CAST($idCol AS HUGEINT))", "42::HUGEINT", "hl_h_", "h")
    Seq(
      ("hl_du", s"SELECT DISTINCT $g$idCol FROM events")
    ) ++ hS ++ Seq(
      ("hl_r", s"SELECT $g" +
        s"CAST(xu_u64(CAST(h AS HUGEINT)) // $pow AS INTEGER) AS bucket, " +
        s"xu_u64(CAST(h AS HUGEINT)) % $pow AS w FROM $hT"),
      ("hl_reg", s"SELECT $g bucket, " +
        s"CAST(max(CASE WHEN w = 0 THEN $rmax " +
        s"ELSE $rmax - length(bin(CAST(w AS BIGINT))) END) AS INTEGER) AS register " +
        s"FROM hl_r GROUP BY $gb"))
  }

  /** Full oracle for `ev_cms_freq`: unroll the count-min grid exactly —
    * per-(type, user) xxhash64 via the XXH64 chain, Kirsch–Mitzenmacher
    * row indexes (a = top 32 bits, b = low 32 bits forced odd, row i →
    * (a + i·b) mod w), grid cell = Σ n over colliding users, probes =
    * true top-5 users per type (n DESC, user_id ASC), estimate =
    * min over rows. Integer-exact end to end, so the two engines'
    * grids are bit-identical.
    */
  def cmsFreq(d: Int, logW: Int): String = {
    val w = 1 << logW
    val (hS, hT) = longChain("cm_n", Seq("event_type", "user_id", "n"),
      "xu_u64(CAST(user_id AS HUGEINT))", "42::HUGEINT", "cm_h_", "h")
    val ctes = Seq(
      ("cm_n",
        "SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2")
    ) ++ hS ++ Seq(
      ("cm_ab", "SELECT event_type, user_id, n, " +
        s"xu_u64(CAST(h AS HUGEINT)) // 4294967296 AS a, " +
        s"(xu_u64(CAST(h AS HUGEINT)) % 4294967296) " +
        s"- (xu_u64(CAST(h AS HUGEINT)) % 2) + 1 AS b FROM $hT"),
      ("cm_idx", "SELECT event_type, user_id, n, i, " +
        s"CAST((a + i * b) % $w AS INTEGER) AS idx " +
        s"FROM cm_ab, range(0, $d) r(i)"),
      ("cm_grid", "SELECT event_type, i, idx, sum(n) AS cnt " +
        "FROM cm_idx GROUP BY 1, 2, 3"),
      ("cm_probe", "SELECT event_type, user_id, n FROM (" +
        "SELECT event_type, user_id, n, row_number() OVER (" +
        "PARTITION BY event_type ORDER BY n DESC, user_id) AS rk " +
        "FROM cm_n) WHERE rk <= 5"),
      ("cm_pidx", "SELECT p.event_type, p.user_id, p.n, a.i, a.idx " +
        "FROM cm_probe p JOIN cm_idx a " +
        "ON a.event_type = p.event_type AND a.user_id = p.user_id"))
    single(ctes,
      "SELECT p.event_type, p.user_id, CAST(p.n AS BIGINT) AS n_exact, " +
        "CAST(min(g.cnt) AS BIGINT) AS est " +
        "FROM cm_pidx p JOIN cm_grid g ON g.event_type = p.event_type " +
        "AND g.i = p.i AND g.idx = p.idx GROUP BY 1, 2, 3")
  }

  /** Full oracle for `ev_cms_union`: the GLOBAL count-min grid computed
    * directly from the raw stream. The Spark side re-merges the
    * per-type sketches by counter addition; because the row indexes
    * depend only on user_id, the merged grid must equal the grid built
    * over per-user TOTAL counts — which is what this computes.
    */
  def cmsUnion(d: Int, logW: Int): String = {
    val w = 1 << logW
    val (hS, hT) = longChain("cu_n", Seq("user_id", "n"),
      "xu_u64(CAST(user_id AS HUGEINT))", "42::HUGEINT", "cu_h_", "h")
    val ctes = Seq(
      ("cu_n", "SELECT user_id, count(*) AS n FROM events GROUP BY 1")
    ) ++ hS ++ Seq(
      ("cu_ab", "SELECT user_id, n, " +
        s"xu_u64(CAST(h AS HUGEINT)) // 4294967296 AS a, " +
        s"(xu_u64(CAST(h AS HUGEINT)) % 4294967296) " +
        s"- (xu_u64(CAST(h AS HUGEINT)) % 2) + 1 AS b FROM $hT"),
      ("cu_idx", "SELECT user_id, n, i, " +
        s"CAST((a + i * b) % $w AS INTEGER) AS idx " +
        s"FROM cu_ab, range(0, $d) r(i)"))
    single(ctes,
      "SELECT CAST(i AS INTEGER) AS \"row\", idx, " +
        "CAST(sum(n) AS BIGINT) AS cnt FROM cu_idx GROUP BY 1, 2")
  }

  /** Full oracle for `ev_hll_users`: the nonzero HLL registers. */
  def hllUsers(p: Int): String =
    single(hllRegCtes(p, "user_id", Seq("event_type")),
      "SELECT event_type, bucket, register FROM hl_reg")

  /** Full oracle for `ev_hll_estimate`: the raw integer-grid HLL
    * estimator over the registers — S = Σ 2^(64−M[j]) with empty
    * registers contributing 2^64, est = alpha_micro·m²·2⁶⁴ div (10⁶·S),
    * alpha_micro from the SAME exact-rational function the Spark
    * aggregate uses ([[graft.functions.HllRegisters.alphaMicro]]), so
    * the two engines cannot disagree on the constant.
    */
  def hllEstimate(p: Int): String = {
    val m = 1 << p
    val pow64 = java.math.BigInteger.ONE.shiftLeft(64).toString
    val am2 = (BigInt(graft.functions.HllRegisters.alphaMicro(m)) * m * m).toString
    val ctes = hllRegCtes(p, "event_id", Seq("event_type")) ++ Seq(
      ("hl_agg", "SELECT event_type, count(*) AS nnz, " +
        s"sum(CAST($pow64 AS HUGEINT) // (CAST(1 AS BIGINT) << register)) AS spow " +
        "FROM hl_reg GROUP BY event_type"),
      ("hl_ex", "SELECT event_type, count(DISTINCT event_id) AS n_exact FROM events " +
        "GROUP BY event_type"),
      ("hl_est", "SELECT event_type, nnz, " +
        s"CAST((CAST($am2 AS HUGEINT) * $pow64) // " +
        s"(1000000 * (($m - nnz) * CAST($pow64 AS HUGEINT) + spow)) AS BIGINT) AS est_raw " +
        "FROM hl_agg"))
    single(ctes,
      "SELECT e.event_type, x.n_exact, CAST(e.nnz AS BIGINT) AS nnz, e.est_raw, " +
        "(abs(e.est_raw - x.n_exact) * 10000) // x.n_exact AS err_e4 " +
        "FROM hl_est e JOIN hl_ex x USING (event_type)")
  }

  /** Full oracle for `ev_hll_union`: the Spark side MERGES the per-type
    * persisted sketches (register max); because max is associative, the
    * merged registers equal the one global sketch over all user ids —
    * which is what this oracle computes directly. A mismatch would mean
    * the merge aggregate broke associativity.
    */
  def hllUnion(p: Int): String = {
    val m = 1 << p
    val pow64 = java.math.BigInteger.ONE.shiftLeft(64).toString
    val am2 = (BigInt(graft.functions.HllRegisters.alphaMicro(m)) * m * m).toString
    val ctes = hllRegCtes(p, "event_id", Nil) ++ Seq(
      ("hl_agg", "SELECT count(*) AS nnz, " +
        s"sum(CAST($pow64 AS HUGEINT) // (CAST(1 AS BIGINT) << register)) AS spow " +
        "FROM hl_reg"),
      ("hl_ex", "SELECT count(DISTINCT event_id) AS n_exact FROM events"),
      ("hl_est", "SELECT nnz, " +
        s"CAST((CAST($am2 AS HUGEINT) * $pow64) // " +
        s"(1000000 * (($m - nnz) * CAST($pow64 AS HUGEINT) + spow)) AS BIGINT) AS est_raw " +
        "FROM hl_agg"))
    single(ctes,
      "SELECT x.n_exact, CAST(e.nnz AS BIGINT) AS nnz, e.est_raw, " +
        "(abs(e.est_raw - x.n_exact) * 10000) // x.n_exact AS err_e4 " +
        "FROM hl_est e CROSS JOIN hl_ex x")
  }

  /** Full oracle for `ds_shuffle_order`: rank under the signed
    * (xxhash64(doc_id), doc_id) order — one window here where the Spark
    * side assembles the same rank from bucket offsets.
    */
  def shuffleOrder(): String = {
    val (hS, hT) = longChain("so_d", Seq("doc_id"),
      "xu_u64(CAST(doc_id AS HUGEINT))", "42::HUGEINT", "so_", "h")
    val ctes = Seq(("so_d", "SELECT doc_id FROM documents")) ++ hS
    single(ctes,
      "SELECT doc_id, h, " +
        s"CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos FROM $hT")
  }

  /** Oracle for `emb_rp_project`: regenerate the deterministic JL
    * plane matrix (the [[graft.functions.SignBands.planes]] formula,
    * parameterized to outDim × dim) and replay each component as the
    * same ascending-index left-fold dot, e6-floored —
    * [[graft.operators.RandomProjection.projectE6]] bit for bit.
    */
  def rpProject(outDim: Int, dim: Int): String = {
    val a = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
    val b = java.lang.Long.toUnsignedString(0xC2B2AE3D27D4EB4FL)
    val c = java.lang.Long.toUnsignedString(0x165667B19E3779F9L)
    val ctes = Seq(
      ("rp_pl0", "SELECT i, j, " +
        s"xor(xu_mul(CAST(i AS HUGEINT), $a), xu_mul(CAST(j AS HUGEINT), $b)) AS x0 " +
        s"FROM range(0, $outDim) a(i), range(0, $dim) b(j)"),
      ("rp_pl1", "SELECT i, j, " +
        s"xu_mul(xu_rot(x0, 2147483648, 8589934592), $c) AS h FROM rp_pl0"),
      ("rp_pl2", "SELECT i, j, " +
        "CAST(h // 2048 AS DOUBLE) / 4503599627370496.0 - 1.0 AS comp FROM rp_pl1"),
      ("rp_ev", "SELECT vec_id AS id, " +
        "unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x, " +
        "unnest(range(0, len(embedding))) AS j FROM embeddings"),
      ("rp_prod", "SELECT ev.id, pl.i, ev.j, " +
        "ev.x * pl.comp AS prod FROM rp_ev ev JOIN rp_pl2 pl USING (j)"),
      ("rp_dots", "SELECT id, i, " +
        "list_reduce(list(prod ORDER BY j), (x, y) -> x + y) AS d " +
        "FROM rp_prod GROUP BY id, i"))
    single(ctes,
      "SELECT id AS vec_id, CAST(i AS INTEGER) AS dim_idx, " +
        "CAST(floor(d * 1000000.0) AS BIGINT) AS component_e6 FROM rp_dots")
  }

  /** Oracle for `ev_theta_intersect`: the KMV/theta sketch replayed in
    * SQL — XXH64 of the user-day key ([[longChain]] = Spark's
    * `xxhash64(long)`), masked to 52 bits, bottom-k per event type,
    * θ = k-th value (domain when exhaustive), every estimate the same
    * `count·2⁵² // θ` integer arithmetic as
    * [[graft.operators.ThetaSketch.intersectEstimate]].
    */
  /** Full oracle for `ev_harmonic_approx`: HyperBall replayed in SQL —
    * per-node HLL register sets over the symmetrized journey graph,
    * each round register-maxing neighbor sets into each node
    * ([[graft.operators.GraphAlgos.harmonicHyperBall]] round for
    * round), with the per-round ball estimate on the same integer grid
    * as [[hllUnion]] (alpha·m²·2⁶⁴ // (10⁶·S), HUGEINT) and
    * harmonic_e6 = Σ_t (est_t − est_{t−1})·10⁶ // t. Node hashes via
    * [[strChain]] (= Spark's `xxhash64(string)`), bit-sliced exactly
    * like the `ev_hll` oracles.
    */
  def harmonicApprox(iters: Int, p: Int): String = {
    val (ctes, joins) = hyperBallCtes(iters, p)
    val harm = (1 to iters).map(i =>
      s"((e$i.est - e${i - 1}.est) * 1000000) // $i").mkString(" + ")
    single(ctes,
      s"SELECT n.node AS event_type, e$iters.est AS est_ball, " +
        s"CAST($harm AS BIGINT) AS harmonic_e6 FROM hb_nodes n $joins")
  }

  /** Oracle for `ev_closeness_approx`: the [[harmonicApprox]] ball
    * evolution with the closeness readout — `sum_dist = Σ_t t·(est_t −
    * est_{t−1})` and `(est_ball − 1)·10⁶ // sum_dist`, all on the same
    * integer grid ([[graft.operators.GraphAlgos.hyperBallCloseness]]).
    */
  def closenessApprox(iters: Int, p: Int): String = {
    val (ctes, joins) = hyperBallCtes(iters, p)
    val sd = (1 to iters).map(i =>
      s"$i * (e$i.est - e${i - 1}.est)").mkString(" + ")
    single(ctes,
      s"SELECT n.node AS event_type, e$iters.est AS est_ball, " +
        s"CAST($sd AS BIGINT) AS sum_dist, " +
        s"CAST(CASE WHEN ($sd) > 0 THEN ((e$iters.est - 1) * 1000000) " +
        s"// ($sd) ELSE 0 END AS BIGINT) AS closeness_e6 " +
        s"FROM hb_nodes n $joins")
  }

  /** Oracle for `ev_diameter_approx`: the neighbourhood function
    * `nf(t) = Σ_v est_t(v)` per round plus the effective diameter —
    * min t with `10·nf(t) ≥ 9·nf(last)`, exact integers
    * ([[graft.operators.GraphAlgos.hyperBallNeighborhood]]).
    */
  def diameterApprox(iters: Int, p: Int): String = {
    val (ctes, _) = hyperBallCtes(iters, p)
    val union = (0 to iters).map(i =>
      s"SELECT CAST($i AS BIGINT) AS t, est FROM hb_e$i")
      .mkString(" UNION ALL ")
    val all = ctes ++ Seq(
      ("hb_nf", s"SELECT t, CAST(sum(est) AS BIGINT) AS nf " +
        s"FROM ($union) GROUP BY t"),
      ("hb_nfl", "SELECT nf AS nf_last FROM hb_nf " +
        "ORDER BY t DESC LIMIT 1"),
      ("hb_eff", "SELECT CAST(min(t) AS BIGINT) AS eff_diam " +
        "FROM hb_nf, hb_nfl WHERE nf * 10 >= nf_last * 9"))
    single(all,
      "SELECT f.t, f.nf, e.eff_diam FROM hb_nf f, hb_eff e")
  }

  /** The shared HyperBall CTE chain (register evolution + per-round
    * estimates `hb_e0..hb_e$iters`) and the readout join string.
    */
  private def hyperBallCtes(iters: Int, p: Int): (Seq[(String, String)], String) = {
    val m = 1 << p
    val pow = java.math.BigInteger.ONE.shiftLeft(64 - p).toString
    val pow64 = java.math.BigInteger.ONE.shiftLeft(64).toString
    val am2 = (BigInt(graft.functions.HllRegisters.alphaMicro(m)) * m * m).toString
    val rmax = 64 - p + 1
    val (hS, hT) = strChain("hb_nodes", Seq("node"), "node",
      "42::HUGEINT", "hb_h_", "h")
    def estCte(i: Int) = (s"hb_e$i",
      s"SELECT node, CAST((CAST($am2 AS HUGEINT) * $pow64) // " +
        s"(1000000 * (($m - count(*)) * CAST($pow64 AS HUGEINT) + " +
        s"sum(CAST($pow64 AS HUGEINT) // (CAST(1 AS BIGINT) << register)))) " +
        s"AS BIGINT) AS est FROM hb_r$i GROUP BY node")
    val rounds = (1 to iters).flatMap { i =>
      Seq((s"hb_r$i",
        s"SELECT node, bucket, max(register) AS register FROM (" +
          s"SELECT e.u AS node, s.bucket, s.register FROM hb_r${i - 1} s " +
          s"JOIN und e ON e.v = s.node " +
          s"UNION ALL SELECT node, bucket, register FROM hb_r${i - 1}) " +
          "GROUP BY node, bucket"),
        estCte(i))
    }
    val ctes = Seq(
      ("o", "SELECT user_id, event_type AS src, " +
        "lead(event_type) OVER (PARTITION BY user_id " +
        "ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst FROM events"),
      ("e0", "SELECT src AS a, dst AS b FROM o " +
        "WHERE dst IS NOT NULL AND src <> dst"),
      ("und", "SELECT DISTINCT u, v FROM (" +
        "SELECT a AS u, b AS v FROM e0 " +
        "UNION ALL SELECT b AS u, a AS v FROM e0)"),
      ("hb_nodes", "SELECT DISTINCT u AS node FROM und")
    ) ++ hS ++ Seq(
      ("hb_r0", "SELECT node, " +
        s"CAST(xu_u64(CAST(h AS HUGEINT)) // $pow AS INTEGER) AS bucket, " +
        s"CAST(CASE WHEN xu_u64(CAST(h AS HUGEINT)) % $pow = 0 THEN $rmax " +
        s"ELSE $rmax - length(bin(CAST(xu_u64(CAST(h AS HUGEINT)) % $pow " +
        s"AS BIGINT))) END AS INTEGER) AS register FROM $hT"),
      estCte(0)
    ) ++ rounds
    val joins = (0 to iters).map(i =>
      s"JOIN hb_e$i e$i ON e$i.node = n.node").mkString(" ")
    (ctes, joins)
  }

  /** Full oracle for `ev_theta_union`: the GLOBAL KMV sketch built
    * directly — distinct user-day keys over ALL event types, XXH64 via
    * [[longChain]], 52-bit mask, bottom-k, θ and the integer-grid
    * estimate. The Spark side re-merges the per-type persisted `vals`
    * arrays ([[graft.functions.KmvMergeVals]]); because KMV union is
    * lossless, the merged sample must be bit-identical to this direct
    * construction — a mismatch means the merge aggregate broke the
    * retain-k-smallest rule.
    */
  def thetaUnion(k: Int): String = {
    val dom = "4503599627370496" // 2^52
    val (hS, hT) = longChain("tu_du", Seq("kk"),
      "xu_u64(CAST(kk AS HUGEINT))", "42::HUGEINT", "tu_h_", "h")
    val ctes = Seq(
      ("tu_k", "SELECT user_id * 100000 + " +
        "datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS kk " +
        "FROM events"),
      ("tu_du", "SELECT DISTINCT kk FROM tu_k")
    ) ++ hS ++ Seq(
      ("tu_v", "SELECT DISTINCT " +
        s"CAST(xu_u64(CAST(h AS HUGEINT)) % $dom AS BIGINT) AS v FROM $hT"),
      ("tu_rk", "SELECT v, row_number() OVER (ORDER BY v) AS rn FROM tu_v"),
      ("tu_n", "SELECT count(*) AS nd FROM tu_v"),
      ("tu_sk", s"SELECT v, rn FROM tu_rk WHERE rn <= $k"),
      ("tu_th", s"SELECT CASE WHEN max(n.nd) >= $k THEN max(s.v) " +
        s"ELSE $dom END AS theta FROM tu_sk s, tu_n n"),
      ("tu_c", "SELECT count(*) AS below FROM tu_sk, tu_th WHERE v < theta"),
      ("tu_ex", "SELECT count(*) AS n_exact FROM tu_du"))
    single(ctes,
      s"""SELECT CAST(s.rn - 1 AS BIGINT) AS pos, s.v, t.theta,
         |  (c.below * $dom) // t.theta AS est_union,
         |  CAST(x.n_exact AS BIGINT) AS n_exact,
         |  abs((c.below * $dom) // t.theta - x.n_exact) * 10000
         |    // x.n_exact AS err_e4
         |FROM tu_sk s, tu_th t, tu_c c, tu_ex x""".stripMargin)
  }

  def thetaIntersect(k: Int, groupA: String, groupB: String): String = {
    val dom = "4503599627370496" // 2^52
    val (hS, hT) = longChain("th_du", Seq("event_type", "kk"),
      "xu_u64(CAST(kk AS HUGEINT))", "42::HUGEINT", "th_h_", "h")
    val ctes = Seq(
      ("th_k", "SELECT event_type, user_id * 100000 + " +
        "datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS kk " +
        s"FROM events WHERE event_type IN ('$groupA', '$groupB')"),
      ("th_du", "SELECT DISTINCT event_type, kk FROM th_k")
    ) ++ hS ++ Seq(
      ("th_v", "SELECT DISTINCT event_type, " +
        s"CAST(xu_u64(CAST(h AS HUGEINT)) % $dom AS BIGINT) AS v FROM $hT"),
      ("th_rk", "SELECT event_type, v, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY v) AS rn FROM th_v"),
      ("th_n", "SELECT event_type, count(*) AS nd FROM th_v GROUP BY event_type"),
      ("th_sk", s"SELECT event_type, v FROM th_rk WHERE rn <= $k"),
      ("th_th", "SELECT s.event_type, " +
        s"CASE WHEN max(n.nd) >= $k THEN max(s.v) ELSE $dom END AS theta, " +
        "max(n.nd) AS nd FROM th_sk s JOIN th_n n USING (event_type) " +
        "GROUP BY s.event_type"),
      ("th_t", "SELECT least(a.theta, b.theta) AS theta, " +
        "a.theta AS theta_a, b.theta AS theta_b, a.nd AS n_a, b.nd AS n_b " +
        s"FROM th_th a, th_th b WHERE a.event_type = '$groupA' " +
        s"AND b.event_type = '$groupB'"),
      ("th_m", "SELECT count(*) AS n_matched FROM th_sk x, th_sk y, th_t t " +
        s"WHERE x.event_type = '$groupA' AND y.event_type = '$groupB' " +
        "AND x.v = y.v AND x.v < t.theta"),
      ("th_ca", "SELECT count(*) AS ca FROM th_sk, th_t " +
        s"WHERE event_type = '$groupA' AND v < theta"),
      ("th_cb", "SELECT count(*) AS cb FROM th_sk, th_t " +
        s"WHERE event_type = '$groupB' AND v < theta"),
      ("th_caa", "SELECT count(*) AS caa FROM th_sk, th_t " +
        s"WHERE event_type = '$groupA' AND v < theta_a"),
      ("th_cbb", "SELECT count(*) AS cbb FROM th_sk, th_t " +
        s"WHERE event_type = '$groupB' AND v < theta_b"),
      ("th_ex", "SELECT count(*) AS exact_intersect FROM th_du a " +
        "JOIN th_du b ON a.kk = b.kk " +
        s"WHERE a.event_type = '$groupA' AND b.event_type = '$groupB'"))
    single(ctes,
      s"""SELECT t.n_a, t.n_b, t.theta, m.n_matched,
         |  (caa * $dom) // t.theta_a AS est_a,
         |  (cbb * $dom) // t.theta_b AS est_b,
         |  (m.n_matched * $dom) // t.theta AS est_intersect,
         |  ((ca + cb - m.n_matched) * $dom) // t.theta AS est_union,
         |  ((ca - m.n_matched) * $dom) // t.theta AS est_diff_ab,
         |  ((cb - m.n_matched) * $dom) // t.theta AS est_diff_ba,
         |  ex.exact_intersect,
         |  abs((m.n_matched * $dom) // t.theta - ex.exact_intersect)
         |    * 10000 // nullif(ex.exact_intersect, 0) AS err_e4
         |FROM th_t t, th_m m, th_ca, th_cb, th_caa, th_cbb, th_ex ex"""
        .stripMargin)
  }
}
