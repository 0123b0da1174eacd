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
  * Structure of the emitted SQL (one multi-statement script per query):
  *
  *  - a prelude of `CREATE OR REPLACE MACRO` statements for the word
  *    primitives (mul/rot/xor/shift-fold, byte extraction from a hex
  *    dump of the UTF-8 bytes). Each macro alone stays well under
  *    DuckDB's 128-deep binder recursion limit; the full hash is NOT
  *    one macro (that blows the limit — and macro argument substitution
  *    re-expands textually, so a nested composition also multiplies the
  *    bound expression tree ~3× per arithmetic level).
  *  - the hash proper as a chain of `CREATE OR REPLACE TEMP TABLE`
  *    stages, one XXH64 phase per stage (stripe lanes, merge rounds,
  *    8/4/1-byte tails, avalanche). Every macro argument is then a
  *    plain column reference, so each stage's bound tree stays flat.
  *    Stages carry the rows of ONE logical projection each — the whole
  *    chain is a dozen scans of a sub-million-row temp table at the
  *    verify scale (sf 0.01).
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

  /** Macro prelude. XXH64 primes (unsigned):
    * P1=11400714785074694791 P2=14029467366897019727 P3=1609587929392839161
    * P4=9650029242287828579 P5=2870177450012600261.
    * All macros take/return HUGEINT in [0, 2^64).
    */
  val prelude: Seq[String] = Seq(
    // wrapping 64x64 multiply: split both factors at 2^32 so no
    // intermediate exceeds HUGEINT's 2^127-1
    s"""CREATE OR REPLACE MACRO xu_mul(a, b) AS
       |  ((a % 4294967296) * (b % 4294967296)
       |   + (((a // 4294967296) * (b % 4294967296)
       |       + (a % 4294967296) * (b // 4294967296)) % 4294967296) * 4294967296)
       |  % $M""".stripMargin,
    // rotl by r: pl = 2^r, pr = 2^(64-r); the two halves occupy
    // disjoint bit ranges so + is |
    s"CREATE OR REPLACE MACRO xu_rot(x, pl, pr) AS (x * pl) % $M + (x // pr)",
    "CREATE OR REPLACE MACRO xu_sx(h, p) AS xor(h, h // p)", // h ^= h >>> log2 p
    // XXH64 avalanche: h^=h>>>33; h*=P2; h^=h>>>29; h*=P3; h^=h>>>32
    """CREATE OR REPLACE MACRO xu_fmix(h) AS
      |  xu_sx(xu_mul(xu_sx(xu_mul(xu_sx(h, 8589934592), 14029467366897019727),
      |                     536870912), 1609587929392839161), 4294967296)""".stripMargin,
    s"CREATE OR REPLACE MACRO xu_u64(x) AS CASE WHEN x < 0 THEN x + $M ELSE x END",
    s"""CREATE OR REPLACE MACRO xu_s64(x) AS
       |  CAST(CASE WHEN x >= 9223372036854775808 THEN x - $M
       |            ELSE x END AS BIGINT)""".stripMargin,
    // hashInt: h = seed+P5+4; h ^= (i&0xffffffff)*P1; h = rotl(h,23)*P2+P3; fmix
    s"""CREATE OR REPLACE MACRO xxh64_int(iu, seed) AS
       |  xu_fmix((xu_mul(xu_rot(xor((seed + 2870177450012600265) % $M,
       |                             xu_mul(iu, 11400714785074694791)),
       |                         8388608, 2199023255552),
       |                  14029467366897019727) + 1609587929392839161) % $M)""".stripMargin,
    // byte / little-endian word extraction from a hex dump (0-based
    // byte offset j); '0x...' parses as BIGINT (not HUGEINT), so w8
    // assembles from two 32-bit halves
    """CREATE OR REPLACE MACRO xh_b(hx, j) AS
      |  CAST(CAST(concat('0x', substr(hx, 2*j+1, 2)) AS BIGINT) AS HUGEINT)""".stripMargin,
    """CREATE OR REPLACE MACRO xh_w4(hx, j) AS
      |  CAST(CAST(concat('0x', substr(hx,2*j+7,2), substr(hx,2*j+5,2),
      |              substr(hx,2*j+3,2), substr(hx,2*j+1,2)) AS BIGINT) AS HUGEINT)""".stripMargin,
    "CREATE OR REPLACE MACRO xh_w8(hx, j) AS xh_w4(hx, j+4) * 4294967296 + xh_w4(hx, j)",
    // one 32-byte-stripe accumulator lane: fold round() over the words
    // at byte offsets 32s + 8*lane, s < ns (ns = 0 folds nothing)
    s"""CREATE OR REPLACE MACRO xh_lane(hx, ns, lane, init) AS
       |  list_reduce(list_prepend(init,
       |    list_transform(range(0, ns), s -> xh_w8(hx, 32*s + 8*lane))),
       |    (acc, w) -> xu_mul(xu_rot((acc + xu_mul(w, 14029467366897019727)) % $M,
       |                              2147483648, 8589934592),
       |                       11400714785074694791))""".stripMargin,
    // merge round: h = (h ^ (rotl(v*P2,31)*P1))*P1 + P4
    s"""CREATE OR REPLACE MACRO xh_merge(h, v) AS
       |  (xu_mul(xor(h, xu_mul(xu_rot(xu_mul(v, 14029467366897019727),
       |                               2147483648, 8589934592),
       |                        11400714785074694791)),
       |          11400714785074694791) + 9650029242287828579) % $M""".stripMargin,
    // 8-byte tail words ((n%32)//8 of them, from byte 32*(n//32))
    s"""CREATE OR REPLACE MACRO xh_t8(hx, n, h) AS
       |  list_reduce(list_prepend(h,
       |    list_transform(range(0, (n % 32) // 8), t -> xh_w8(hx, 32*(n // 32) + 8*t))),
       |    (acc, w) -> (xu_mul(xu_rot(xor(acc,
       |        xu_mul(xu_rot(xu_mul(w, 14029467366897019727), 2147483648, 8589934592),
       |               11400714785074694791)),
       |        134217728, 137438953472), 11400714785074694791)
       |      + 9650029242287828579) % $M)""".stripMargin,
    // optional 4-byte tail word at byte (n//8)*8. The hex dump is
    // zero-padded past n so the not-taken arm never reads off the end
    // even under eager CASE evaluation.
    s"""CREATE OR REPLACE MACRO xh_t4(hx, n, h) AS
       |  CASE WHEN n % 8 >= 4 THEN
       |    (xu_mul(xu_rot(xor(h, xu_mul(xh_w4(hx, (n // 8) * 8), 11400714785074694791)),
       |                   8388608, 2199023255552), 14029467366897019727)
       |     + 1609587929392839161) % $M
       |  ELSE h END""".stripMargin,
    // trailing n%4 single bytes
    """CREATE OR REPLACE MACRO xh_tb(hx, n, h) AS
      |  list_reduce(list_prepend(h,
      |    list_transform(range(0, n % 4), t -> xh_b(hx, n - (n % 4) + t))),
      |    (acc, b) -> xu_mul(xu_rot(xor(acc, xu_mul(b, 2870177450012600261)),
      |                              2048, 9007199254740992),
      |                       11400714785074694791))""".stripMargin
  )

  /** Staged XXH64 of the UTF-8 bytes of `strExpr` with HUGEINT seed
    * `seedExpr` (both evaluated against `src`). Emits CREATE TEMP TABLE
    * statements `<pfx>c1..c12`; the final table has `keys` + `outCol`
    * (signed BIGINT). Stage init seeds: v1 = seed+P1+P2, v2 = seed+P2,
    * v3 = seed, v4 = seed-P1 (all mod 2^64).
    */
  def strChain(src: String, keys: Seq[String], strExpr: String,
      seedExpr: String, pfx: String, outCol: String): (Seq[String], String) = {
    val k = keys.mkString(", ")
    // each stage DROPs its predecessor once built: the oracle scripts
    // share one long-lived driver connection, and at bench scale the
    // undropped stage tables of a single chain exhausted DuckDB's
    // memory budget (observed at sf0.1 — millions of rows x 12 stages
    // x 3 scripts). Peak live footprint is now ~2 stages per chain.
    def tt(name: String, prev: String, cols: String) = Seq(
      s"CREATE OR REPLACE TEMP TABLE $pfx$name AS SELECT $k, $cols FROM $pfx$prev",
      s"DROP TABLE $pfx$prev")
    val parts = Seq(
      s"CREATE OR REPLACE TEMP TABLE ${pfx}c1 AS SELECT $k, $seedExpr AS se, " +
        s"hex(encode($strExpr)) || repeat('0', 64) AS hx, " +
        s"octet_length(encode($strExpr)) AS n FROM $src") ++
      tt("c2", "c1", "se, hx, n, " +
        s"xh_lane(hx, n // 32, 0, (se + 6983438078262162902) % $M) AS v1, " +
        s"xh_lane(hx, n // 32, 1, (se + 14029467366897019727) % $M) AS v2, " +
        "xh_lane(hx, n // 32, 2, se) AS v3, " +
        s"xh_lane(hx, n // 32, 3, (se + 7046029288634856825) % $M) AS v4") ++
      tt("c3", "c2", "se, hx, n, v1, v2, v3, v4, " +
        "(xu_rot(v1, 2, 9223372036854775808) + xu_rot(v2, 128, 144115188075855872) " +
        s"+ xu_rot(v3, 4096, 4503599627370496) + xu_rot(v4, 262144, 70368744177664)) % $M AS m0") ++
      tt("c4", "c3", "se, hx, n, v2, v3, v4, xh_merge(m0, v1) AS m1") ++
      tt("c5", "c4", "se, hx, n, v3, v4, xh_merge(m1, v2) AS m2") ++
      tt("c6", "c5", "se, hx, n, v4, xh_merge(m2, v3) AS m3") ++
      tt("c7", "c6", "se, hx, n, xh_merge(m3, v4) AS m4") ++
      tt("c8", "c7",
        s"hx, n, ((CASE WHEN n >= 32 THEN m4 ELSE (se + 2870177450012600261) % $M END) + n) % $M AS a1") ++
      tt("c9", "c8", "hx, n, xh_t8(hx, n, a1) AS a2") ++
      tt("c10", "c9", "hx, n, xh_t4(hx, n, a2) AS a3") ++
      tt("c11", "c10", "hx, n, xh_tb(hx, n, a3) AS a4") ++
      tt("c12", "c11", s"xu_s64(xu_fmix(a4)) AS $outCol")
    (parts, s"${pfx}c12")
  }

  /** Staged XXH64 of one 8-byte long (`luExpr`, unsigned HUGEINT) with
    * seed `seedExpr` — the minhash lane re-hash. Same staging rationale.
    */
  def longChain(src: String, keys: Seq[String], luExpr: String,
      seedExpr: String, pfx: String, outCol: String): (Seq[String], String) = {
    val k = keys.mkString(", ")
    def tt(name: String, prev: String, cols: String) = Seq(
      s"CREATE OR REPLACE TEMP TABLE $pfx$name AS SELECT $k, $cols FROM $pfx$prev",
      s"DROP TABLE $pfx$prev")
    val parts = Seq(
      s"CREATE OR REPLACE TEMP TABLE ${pfx}l1 AS SELECT $k, $seedExpr AS se, $luExpr AS lu FROM $src") ++
      tt("l2", "l1", "se, " +
        "xu_mul(xu_rot(xu_mul(lu, 14029467366897019727), 2147483648, 8589934592), " +
        "11400714785074694791) AS k1") ++
      tt("l3", "l2",
        s"(xu_mul(xu_rot(xor((se + 2870177450012600269) % $M, k1), " +
        s"134217728, 137438953472), 11400714785074694791) + 9650029242287828579) % $M AS h2") ++
      tt("l4", "l3", "xu_mul(xu_sx(h2, 8589934592), 14029467366897019727) AS f1") ++
      tt("l5", "l4", "xu_mul(xu_sx(f1, 536870912), 1609587929392839161) AS f2") ++
      tt("l6", "l5", s"xu_s64(xu_sx(f2, 4294967296)) AS $outCol")
    (parts, s"${pfx}l6")
  }

  /** Full oracle for `dd_minhash_lsh` (32 lanes / 8 bands / jaccard_e4
    * >= 5000 on the xx-hashed shingle sets). `w`/`shingle` are the
    * DuckDB token/3-gram-shingle fragments shared with the md5 twins.
    */
  def minhash(w: String, shingle: String): String = {
    val (h0S, h0T) = strChain("mh_u0", Seq("doc_id", "sg"), "sg", "42::HUGEINT", "mh_h_", "h0")
    val (mhS, mhT) = longChain("mh_lx0", Seq("doc_id", "i"),
      "xu_u64(CAST(h0 AS HUGEINT))", "lseed", "mh_m_", "mh")
    val (bkS, bkT) = strChain("mh_bd0", Seq("doc_id", "b"), "bs", "bseed", "mh_k_", "bkt")
    val stmts = prelude ++ Seq(
      s"CREATE OR REPLACE TEMP TABLE mh_u0 AS WITH t AS (SELECT doc_id, $w AS w FROM documents), " +
        s"s AS (SELECT doc_id, $shingle AS sh FROM t) SELECT doc_id, unnest(sh) AS sg FROM s"
    ) ++ h0S ++ Seq(
      "DROP TABLE mh_u0",
      s"CREATE OR REPLACE TEMP TABLE mh_hl AS SELECT doc_id, list(h0) AS hl FROM $h0T GROUP BY doc_id",
      "CREATE OR REPLACE TEMP TABLE mh_lanes AS SELECT i, " +
        "xxh64_int(CAST(i AS HUGEINT), 42::HUGEINT) AS lseed FROM range(0, 32) r(i)",
      s"CREATE OR REPLACE TEMP TABLE mh_lx0 AS SELECT x.doc_id, l.i, x.h0, l.lseed FROM $h0T x, mh_lanes l",
      s"DROP TABLE $h0T",
      "DROP TABLE mh_lanes"
    ) ++ mhS ++ Seq(
      "DROP TABLE mh_lx0",
      s"CREATE OR REPLACE TEMP TABLE mh_lh AS SELECT doc_id, i, min(mh) AS mh FROM $mhT GROUP BY doc_id, i",
      s"DROP TABLE $mhT",
      "CREATE OR REPLACE TEMP TABLE mh_sig AS SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh_lh GROUP BY doc_id",
      "DROP TABLE mh_lh",
      "CREATE OR REPLACE TEMP TABLE mh_bseeds AS SELECT b, " +
        "xxh64_int(CAST(b AS HUGEINT), 42::HUGEINT) AS bseed FROM range(0, 8) r(b)",
      "CREATE OR REPLACE TEMP TABLE mh_bd0 AS SELECT doc_id, b, " +
        "array_to_string(sig[b*4+1 : b*4+4], ',') AS bs, bseed FROM mh_sig, mh_bseeds",
      "DROP TABLE mh_sig",
      "DROP TABLE mh_bseeds"
    ) ++ bkS ++ Seq(
      "DROP TABLE mh_bd0",
      "CREATE OR REPLACE TEMP TABLE mh_cand AS SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b " +
        s"FROM $bkT a JOIN $bkT c ON a.b = c.b AND a.bkt = c.bkt AND a.doc_id < c.doc_id",
      s"DROP TABLE $bkT",
      "SELECT id_a, id_b, jaccard_e4 FROM (SELECT mh_cand.id_a, mh_cand.id_b, " +
        "CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 / " +
        "(len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl)))) AS BIGINT) AS jaccard_e4 " +
        "FROM mh_cand JOIN mh_hl ha ON ha.doc_id = mh_cand.id_a " +
        "JOIN mh_hl hb ON hb.doc_id = mh_cand.id_b) WHERE jaccard_e4 >= 5000")
    stmts.mkString(";\n")
  }

  /** Full oracle for `dd_simhash` (64-bit fingerprint, 4 bands x 16
    * bits, hamming <= 6). Bit i votes via (h0u >> i) & 1 on the
    * UNSIGNED value — same bits as Spark's signed >>> votes.
    */
  def simhash(w: String, shingle: String): String = {
    val (h0S, h0T) = strChain("shx_u0", Seq("doc_id", "sg"), "sg", "42::HUGEINT", "shx_h_", "h0")
    val p2 = (0 until 64).map(b => s"($b, '${BigInt(1) << b}')").mkString(", ")
    val bsv = (0 until 4).map(b => s"($b, '${BigInt(1) << (16 * b)}')").mkString(", ")
    val stmts = prelude ++ Seq(
      s"CREATE OR REPLACE TEMP TABLE shx_u0 AS WITH t AS (SELECT doc_id, $w AS w FROM documents), " +
        s"s AS (SELECT doc_id, $shingle AS sh FROM t) SELECT doc_id, unnest(sh) AS sg FROM s"
    ) ++ h0S ++ Seq(
      "DROP TABLE shx_u0",
      s"CREATE OR REPLACE TEMP TABLE shx_hu AS SELECT doc_id, xu_u64(CAST(h0 AS HUGEINT)) AS h0u FROM $h0T",
      s"DROP TABLE $h0T",
      s"CREATE OR REPLACE TEMP TABLE shx_p2 AS SELECT b, CAST(p AS HUGEINT) AS p FROM (VALUES $p2) v(b, p)",
      "CREATE OR REPLACE TEMP TABLE shx_bits AS SELECT doc_id, b, p, " +
        "sum(CASE WHEN (h0u // p) % 2 = 1 THEN 1 ELSE -1 END) AS vote " +
        "FROM shx_hu, shx_p2 GROUP BY doc_id, b, p",
      "DROP TABLE shx_hu",
      "DROP TABLE shx_p2",
      "CREATE OR REPLACE TEMP TABLE shx_f AS SELECT doc_id, " +
        "CAST(sum(CASE WHEN vote > 0 THEN p ELSE 0::HUGEINT END) AS HUGEINT) AS fpu " +
        "FROM shx_bits GROUP BY doc_id",
      "DROP TABLE shx_bits",
      s"CREATE OR REPLACE TEMP TABLE shx_bsh AS SELECT b2, CAST(s AS HUGEINT) AS s FROM (VALUES $bsv) v(b2, s)",
      "CREATE OR REPLACE TEMP TABLE shx_bb AS SELECT doc_id, fpu, b2, " +
        "(fpu // s) % 65536 AS bucket FROM shx_f, shx_bsh",
      "DROP TABLE shx_f",
      "DROP TABLE shx_bsh",
      "SELECT id_a, id_b, hamming FROM (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, " +
        "CAST(bit_count(xor(xu_s64(a.fpu), xu_s64(c.fpu))) AS INT) AS hamming " +
        "FROM shx_bb a JOIN shx_bb c ON a.b2 = c.b2 AND a.bucket = c.bucket AND a.doc_id < c.doc_id) " +
        "WHERE hamming <= 6")
    stmts.mkString(";\n")
  }

  /** Full oracle for `dd_embed_neardup_lsh` (224 planes / 28 bands of 8
    * bits / cos_e6 >= 450000). Plane (i,j) replays SignBands.planes'
    * mix exactly; products are folded ascending-j like VectorDot's
    * left fold, so every double rounding step matches. `cosE6` is the
    * caller's proven verify-cosine fragment over aliases a/c with
    * vector column v.
    */
  def embedNearDup(cosE6: String): String = {
    // SignBands.planes constants (SignBands.scala:67-68), unsigned
    val a = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
    val b = java.lang.Long.toUnsignedString(0xC2B2AE3D27D4EB4FL)
    val c = java.lang.Long.toUnsignedString(0x165667B19E3779F9L)
    val stmts = prelude ++ Seq(
      "CREATE OR REPLACE TEMP TABLE em_pl0 AS SELECT i, j, " +
        s"xor(xu_mul(CAST(i AS HUGEINT), $a), xu_mul(CAST(j AS HUGEINT), $b)) AS x0 " +
        "FROM range(0, 224) a(i), range(0, 64) b(j)",
      "CREATE OR REPLACE TEMP TABLE em_pl1 AS SELECT i, j, " +
        s"xu_mul(xu_rot(x0, 2147483648, 8589934592), $c) AS h FROM em_pl0",
      "DROP TABLE em_pl0",
      // (h >>> 11).toDouble / 2^52 - 1.0; both divisions exact powers of 2
      "CREATE OR REPLACE TEMP TABLE em_pl2 AS SELECT i, j, " +
        "CAST(h // 2048 AS DOUBLE) / 4503599627370496.0 - 1.0 AS comp FROM em_pl1",
      "DROP TABLE em_pl1",
      // vector elements as scalar rows (unnest runs lists in lockstep)
      "CREATE OR REPLACE TEMP TABLE em_ev AS SELECT vec_id AS id, " +
        "unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x, " +
        "unnest(range(0, len(embedding))) AS j FROM embeddings",
      "CREATE OR REPLACE TEMP TABLE em_prod AS SELECT ev.id, pl.i, ev.j, " +
        "ev.x * pl.comp AS prod FROM em_ev ev JOIN em_pl2 pl USING (j)",
      "DROP TABLE em_ev",
      "DROP TABLE em_pl2",
      // ascending-j left fold == VectorDot's 0.0-init fold (0.0+x == x)
      "CREATE OR REPLACE TEMP TABLE em_dots AS SELECT id, i, " +
        "list_reduce(list(prod ORDER BY j), (x, y) -> x + y) AS d FROM em_prod GROUP BY id, i",
      "DROP TABLE em_prod",
      "CREATE OR REPLACE TEMP TABLE em_bb AS SELECT id, i // 8 AS band, " +
        "sum(CASE WHEN d >= 0 THEN (1 << (i % 8)) ELSE 0 END) AS bucket " +
        "FROM em_dots GROUP BY id, i // 8",
      "DROP TABLE em_dots",
      "CREATE OR REPLACE TEMP TABLE em_cand AS SELECT DISTINCT a.id AS id_a, c.id AS id_b " +
        "FROM em_bb a JOIN em_bb c ON a.band = c.band AND a.bucket = c.bucket AND a.id < c.id",
      "DROP TABLE em_bb",
      "CREATE OR REPLACE TEMP TABLE em_e AS SELECT vec_id AS id, embedding AS v FROM embeddings",
      s"SELECT id_a, id_b, cos_e6 FROM (SELECT em_cand.id_a, em_cand.id_b, $cosE6 AS cos_e6 " +
        "FROM em_cand JOIN em_e a ON a.id = em_cand.id_a JOIN em_e c ON c.id = em_cand.id_b) " +
        "WHERE cos_e6 >= 450000")
    stmts.mkString(";\n")
  }
}
