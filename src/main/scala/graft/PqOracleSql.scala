package graft

/** DuckDB SQL replaying the product-quantization pipeline
  * ([[graft.operators.ProductQuantization]]) for value-level oracles.
  *
  * Every arithmetic step mirrors the Spark side exactly: centroids are
  * canonical e6-quantized integers (`comp_e6`), distances run the
  * ascending-index left fold from 0.0 (VectorSqDist's contract),
  * 1e6-scaling multiplies AFTER the fold, means are floor(double
  * division) of floor-scaled integer sums, and all argmins/rankings
  * break ties by ascending code/id. Shared CTE prelude; each query
  * appends its own final SELECT.
  */
object PqOracleSql {

  /** Ascending-j squared-distance fold of `sv` against double-list
    * `cv`, e6-scaled to BIGINT.
    */
  private def distE6(sv: String, cv: String, dsub: Int): String =
    s"""CAST(floor(list_reduce(list_prepend(0.0,
       |  list_transform(range(1, ${dsub + 1}), j ->
       |    ($sv[j] - $cv[j]) * ($sv[j] - $cv[j]))),
       |  (a, b) -> a + b) * 1000000.0) AS BIGINT)""".stripMargin

  /** Cosine (e6-floored) of two DOUBLE-list expressions — the same
    * dot/(sqrt·sqrt) shape as Spark's `Similarity.cosine`, folds
    * ascending (0.0-init ≡ first-element-init since 0.0 + x == x).
    */
  private def cosE6d(a: String, b: String): String =
    s"""CAST(floor(
       |  list_reduce([$a[i] * $b[i] for i in range(1, len($a)+1)], (x, y) -> x + y)
       |  / (sqrt(list_reduce([$a[i] * $a[i] for i in range(1, len($a)+1)], (x, y) -> x + y))
       |   * sqrt(list_reduce([$b[i] * $b[i] for i in range(1, len($b)+1)], (x, y) -> x + y)))
       |  * 1000000.0) AS BIGINT)""".stripMargin

  /** CTE prelude: trained codebook (`pq_cb` component rows, `pq_cbl`
    * double-list form) and the encoded corpus (`pq_codes`), for
    * m subspaces of dsub dims, ksub codes, ONE Lloyd iteration.
    * `pre` prepends extra CTEs (comma-terminated); `src` supplies the
    * (id, v: list<double>) training rows.
    */
  def prelude(m: Int, dsub: Int, ksub: Int,
      pre: String = "",
      src: String = "SELECT vec_id AS id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"
  ): String = {
    // iteration-0 centroid components inline the same /1e6 the list form
    // uses, so assignment distances match Spark's assembleCodebook path
    val d0 = distE6("s.sv", "list_transform(c.ce, x -> CAST(x AS DOUBLE) / 1000000.0)", dsub)
    val dEnc = distE6("s.sv", "c.cv", dsub)
    s"""WITH ${pre}pq_e AS ($src),
       |pq_subs AS (SELECT id, sub, v[sub*$dsub+1 : sub*$dsub+$dsub] AS sv
       |  FROM pq_e, range(0, $m) r(sub)),
       |pq_init AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS code
       |  FROM (SELECT id FROM pq_e ORDER BY id LIMIT $ksub)),
       |pq_cb0 AS (SELECT s.sub, i.code,
       |    list_transform(s.sv, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS ce
       |  FROM pq_subs s JOIN pq_init i USING (id)),
       |pq_a0 AS (SELECT s.id, s.sub, s.sv, c.code, $d0 AS d_e6
       |  FROM pq_subs s JOIN pq_cb0 c ON c.sub = s.sub),
       |pq_assign AS (SELECT id, sub, sv, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id, sub
       |      ORDER BY d_e6, code) AS rn FROM pq_a0) WHERE rn = 1),
       |pq_means AS (SELECT sub, code, CAST(j - 1 AS INT) AS dim,
       |    CAST(floor(CAST(sum(CAST(floor(sv[j] * 1000000.0) AS BIGINT))
       |      AS DOUBLE) / count(*)) AS BIGINT) AS new_e6
       |  FROM pq_assign, range(1, ${dsub + 1}) r(j) GROUP BY sub, code, dim),
       |pq_cb0r AS (SELECT sub, code, CAST(j - 1 AS INT) AS dim, ce[j] AS comp_e6
       |  FROM pq_cb0, range(1, ${dsub + 1}) r(j)),
       |pq_cb AS (SELECT c0.sub, c0.code, c0.dim,
       |    COALESCE(m.new_e6, c0.comp_e6) AS comp_e6
       |  FROM pq_cb0r c0 LEFT JOIN pq_means m
       |    ON m.sub = c0.sub AND m.code = c0.code AND m.dim = c0.dim),
       |pq_cbl AS (SELECT sub, code,
       |    list(CAST(comp_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cv
       |  FROM pq_cb GROUP BY sub, code),
       |pq_enc0 AS (SELECT s.id, s.sub, c.code, $dEnc AS d_e6
       |  FROM pq_subs s JOIN pq_cbl c ON c.sub = s.sub),
       |pq_codes AS (SELECT id, sub, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id, sub
       |      ORDER BY d_e6, code) AS rn FROM pq_enc0) WHERE rn = 1)""".stripMargin
  }

  /** Oracle for `emb_pq_codebooks`: the trained component rows. */
  def codebooks(m: Int, dsub: Int, ksub: Int): String =
    s"""${prelude(m, dsub, ksub)}
       |SELECT CAST(sub AS INT) AS sub, code, dim, comp_e6 FROM pq_cb""".stripMargin

  /** Oracle for `sim_pq_codes`: the encoded corpus. */
  def codes(m: Int, dsub: Int, ksub: Int): String =
    s"""${prelude(m, dsub, ksub)}
       |SELECT id AS vec_id, CAST(sub AS INT) AS sub, code FROM pq_codes""".stripMargin

  /** Oracle for `sim_pq_topk`: ADC top-k for queries `id < nQueries`. */
  def topK(m: Int, dsub: Int, ksub: Int, nQueries: Int, k: Int): String = {
    val dLut = distE6("q.sv", "c.cv", dsub)
    s"""${prelude(m, dsub, ksub)},
       |pq_q AS (SELECT id AS query_id, sub, sv FROM pq_subs WHERE id < $nQueries),
       |pq_lut AS (SELECT q.query_id, q.sub, c.code, $dLut AS d_e6
       |  FROM pq_q q JOIN pq_cbl c ON c.sub = q.sub),
       |pq_sc AS (SELECT l.query_id, k.id AS nbr_id,
       |    CAST(sum(l.d_e6) AS BIGINT) AS adist_e6
       |  FROM pq_codes k JOIN pq_lut l ON l.sub = k.sub AND l.code = k.code
       |  WHERE l.query_id <> k.id GROUP BY l.query_id, k.id)
       |SELECT query_id, nbr_id, adist_e6, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist_e6, nbr_id) AS rn FROM pq_sc) WHERE rn <= $k""".stripMargin
  }

  /** Oracle for `sim_pq_rerank`: ADC shortlist of `shortlist`
    * candidates per query (same arithmetic as [[topK]]), then EXACT
    * full-dimension e6-floored distances over the shortlist alone,
    * re-ranked to top-k. Both cuts tie-break (distance asc, nbr asc).
    */
  def rerankTopK(m: Int, dsub: Int, ksub: Int, nQueries: Int, k: Int,
      shortlist: Int): String = {
    val dLut = distE6("q.sv", "c.cv", dsub)
    val dEx = distE6("q.v", "n.v", m * dsub)
    s"""${prelude(m, dsub, ksub)},
       |pq_q AS (SELECT id AS query_id, sub, sv FROM pq_subs WHERE id < $nQueries),
       |pq_lut AS (SELECT q.query_id, q.sub, c.code, $dLut AS d_e6
       |  FROM pq_q q JOIN pq_cbl c ON c.sub = q.sub),
       |pq_sc AS (SELECT l.query_id, kk.id AS nbr_id,
       |    CAST(sum(l.d_e6) AS BIGINT) AS adist_e6
       |  FROM pq_codes kk JOIN pq_lut l ON l.sub = kk.sub AND l.code = kk.code
       |  WHERE l.query_id <> kk.id GROUP BY l.query_id, kk.id),
       |pq_sh AS (SELECT query_id, nbr_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist_e6, nbr_id) AS rn FROM pq_sc) WHERE rn <= $shortlist),
       |pq_ex AS (SELECT s.query_id, s.nbr_id, $dEx AS dist_e6
       |  FROM pq_sh s
       |  JOIN pq_e q ON q.id = s.query_id
       |  JOIN pq_e n ON n.id = s.nbr_id)
       |SELECT query_id, nbr_id, dist_e6, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY dist_e6, nbr_id) AS rn FROM pq_ex) WHERE rn <= $k""".stripMargin
  }

  /** Oracle for `sim_ivfpq_topk`: coarse IVF assignment (max cosine,
    * `centMod`-strided centroids), PQ trained/encoded on RESIDUALS, and
    * per-probe residual LUTs for queries `id < nQueries` probing their
    * `nprobe` nearest buckets.
    */
  def ivfPqTopK(m: Int, dsub: Int, ksub: Int, dim: Int, centMod: Int,
      nQueries: Int, k: Int, nprobe: Int): String = {
    val cos = cosE6d("e.v", "c.cv")
    val dLut = distE6("q.sv", "c.cv", dsub)
    val pre =
      s"""ivf_c AS (SELECT vec_id AS cent_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM embeddings WHERE vec_id % $centMod = 0),
         |ivf_e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |ivf_s AS (SELECT e.id, c.cent_id, e.v, c.cv, $cos AS cos_e6
         |  FROM ivf_e e CROSS JOIN ivf_c c),
         |ivf_a AS (SELECT id, cent_id, v, cv FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM ivf_s) WHERE rn = 1),
         |ivf_res AS (SELECT id, cent_id,
         |    list_transform(range(1, ${dim + 1}), j -> v[j] - cv[j]) AS v
         |  FROM ivf_a),
         |""".stripMargin
    s"""${prelude(m, dsub, ksub, pre, "SELECT id, v FROM ivf_res")},
       |pq_kc AS (SELECT k.id, a.cent_id, k.sub, k.code
       |  FROM pq_codes k JOIN ivf_a a USING (id)),
       |ivf_probe AS (SELECT query_id, cent_id,
       |    list_transform(range(1, ${dim + 1}), j -> qv[j] - cv[j]) AS qr
       |  FROM (SELECT id AS query_id, cent_id, cv, v AS qv,
       |      row_number() OVER (PARTITION BY id
       |        ORDER BY cos_e6 DESC, cent_id ASC) AS rn
       |    FROM ivf_s WHERE id < $nQueries) WHERE rn <= $nprobe),
       |pq_qsub AS (SELECT query_id, cent_id, sub,
       |    qr[sub*$dsub+1 : sub*$dsub+$dsub] AS sv
       |  FROM ivf_probe, range(0, $m) r(sub)),
       |pq_plut AS (SELECT q.query_id, q.cent_id, q.sub, c.code, $dLut AS d_e6
       |  FROM pq_qsub q JOIN pq_cbl c ON c.sub = q.sub),
       |pq_psc AS (SELECT l.query_id, k.id AS nbr_id,
       |    CAST(sum(l.d_e6) AS BIGINT) AS adist_e6
       |  FROM pq_kc k JOIN pq_plut l
       |    ON l.cent_id = k.cent_id AND l.sub = k.sub AND l.code = k.code
       |  WHERE l.query_id <> k.id GROUP BY l.query_id, k.id)
       |SELECT query_id, nbr_id, adist_e6, CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist_e6, nbr_id) AS rn FROM pq_psc) WHERE rn <= $k""".stripMargin
  }
}
