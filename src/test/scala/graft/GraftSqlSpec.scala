package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, SignBands, TopKByScore}

/** The full SQL registration surface: every codegen'd expression plus the
  * TopKByScore aggregate is callable from `spark.sql` and agrees with its
  * Column-API form.
  */
class GraftSqlSpec extends SparkTestBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "tabs\tand\nnewlines mixed  runs"),
      (4L, ""),
      (5L, "one")
    ).toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
  }

  test("registration is idempotent and covers every function") {
    GraftFunctions.register(spark) // second call must not throw
    val names = Seq("shingle_hashes", "minhash_xx_signature", "simhash_xx",
      "shingle_md5_hashes", "minhash_md5_signature", "simhash_md5",
      "nfc_normalize", "vector_dot", "vector_sqdist", "sign_bands",
      "top_k_by_score", "gram_matrix", "bpe_segment", "bpe_encode",
      "frequent_items", "hll_registers", "hll_merge_registers",
      "cms_counters", "cms_merge_counters", "kmv_merge_vals",
      "unigram_encode")
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n not registered")
    }
  }

  test("unigram_encode from SQL matches the Column form and enforces " +
    "the literal piece-table contract") {
    import spark.implicits._
    val viaSql = spark.sql(
      """SELECT unigram_encode('small table dup',
        |  array('sm 40000', 'all 45000', 'sma 45000', 'll 40000',
        |        'table 75000', 'tab 36000', 'le 39000'),
        |  5, 50000) AS p""".stripMargin)
      .as[Seq[String]].head()
    assert(viaSql == Seq("sm", "all", "table", "d", "u", "p"))
    val viaCol = Seq(("small table dup")).toDF("t")
      .select(graft.operators.UnigramLm.encode(col("t"),
        Seq(("sm", 40000L), ("all", 45000L), ("sma", 45000L),
          ("ll", 40000L), ("table", 75000L), ("tab", 36000L),
          ("le", 39000L)), 5, 50000L).as("p"))
      .as[Seq[String]].head()
    assert(viaSql == viaCol)
    // malformed piece rows fail loudly, not silently
    intercept[Exception] {
      spark.sql("SELECT unigram_encode('x', array('nocost'), 5, 50000)")
        .collect()
    }
  }

  test("sketch aggregates from SQL: hll build+re-merge and cms " +
    "build+re-merge equal the Column forms") {
    import spark.implicits._
    (1L to 500L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
      .createOrReplaceTempView("sk_in")
    // per-group sketches, then re-merge to one global sketch — all SQL
    val viaSql = spark.sql(
      """WITH per AS (SELECT g, hll_registers(xxhash64(id), 9) AS sk
        |             FROM sk_in GROUP BY g)
        |SELECT hll_merge_registers(sk.registers, 9).est_raw AS est
        |FROM per""".stripMargin).as[Long].head()
    val perCol = (1L to 500L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
      .selectExpr("g", "xxhash64(id) AS h")
      .groupBy("g")
      .agg(graft.functions.HllRegisters.hllRegisters(col("h"), 9).as("sk"))
    val viaCol = perCol
      .agg(graft.functions.HllRegisters
        .hllMergeRegisters(col("sk.registers"), 9).as("m"))
      .select(col("m.est_raw")).as[Long].head()
    assert(viaSql == viaCol)
    val cmsSql = spark.sql(
      """WITH per AS (SELECT g, cms_counters(xxhash64(id), 4, 10) AS sk
        |             FROM sk_in GROUP BY g)
        |SELECT cms_merge_counters(sk.counters, 4, 10).n_total AS n
        |FROM per""".stripMargin).as[Long].head()
    assert(cmsSql == 500L)
    // kmv: per-group bottom-k sketches re-merge to the direct global
    // sketch — all SQL, against the Column-form direct construction
    val kmvSql = spark.sql(
      """WITH h AS (SELECT g, xxhash64(id) & 4503599627370495 AS v
        |           FROM sk_in),
        |per AS (SELECT g, sort_array(collect_set(v)) AS allv FROM h GROUP BY g),
        |sk AS (SELECT g, slice(allv, 1, 64) AS vals FROM per)
        |SELECT kmv_merge_vals(vals, 64).theta AS theta FROM sk"""
        .stripMargin).as[Long].head()
    val kmvCol = graft.operators.ThetaSketch.kmvSketch(
      (1L to 500L).map(i => ("all", i)).toDF("g", "kk"), "g", "kk", k = 64)
      .select(element_at(col("vals"), 64)).as[Long].head()
    assert(kmvSql == kmvCol)
  }

  test("bpe_encode from SQL equals the Column form; gram_matrix aggregates") {
    val viaSql = spark.sql(
      """SELECT doc_id,
        |       bpe_encode(text, array('t h', 'th e', 'e s')) AS toks
        |FROM sql_docs ORDER BY doc_id""".stripMargin)
      .as[(Long, Seq[String])].collect()
    val merges = Seq(graft.operators.TextBpe.Merge("t", "h", 0),
      graft.operators.TextBpe.Merge("th", "e", 0),
      graft.operators.TextBpe.Merge("e", "s", 0))
    val viaCol = spark.table("sql_docs")
      .select(col("doc_id"), graft.operators.TextBpe.encode(col("text"), merges))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.head._2.contains("the"))

    val g = spark.sql(
      """SELECT gram_matrix(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 2, 10) AS g
        |FROM sql_docs""".stripMargin).select("g.n", "g.sums", "g.gram").head()
    assert(g.getLong(0) == 5L) // five rows aggregated
    assert(g.getSeq[Long](1) == Seq(50L, 100L)) // 5·10, 5·20
    assert(g.getSeq[Long](2) == Seq(500L, 1000L, 2000L))
  }

  test("text family: SQL results equal the Column-API expressions") {
    val viaSql = spark.sql(
      """SELECT doc_id, shingle_hashes(text, 3) AS sh,
        |       minhash_xx_signature(text, 8) AS mx,
        |       simhash_xx(text) AS sx,
        |       shingle_md5_hashes(text) AS sm,
        |       minhash_md5_signature(text, 4, 2) AS mm,
        |       simhash_md5(text, 2) AS fm
        |FROM sql_docs""".stripMargin)
      .as[(Long, Seq[Long], Seq[Long], Long, Seq[Long], Seq[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    val viaCol = spark.table("sql_docs").select(col("doc_id"),
        GraftFunctions.shingleHashes(col("text"), 3).as("sh"),
        GraftFunctions.minhashXxSignature(col("text"), numHashes = 8).as("mx"),
        GraftFunctions.simhashXx(col("text")).as("sx"),
        GraftFunctions.shingleMd5Hashes(col("text")).as("sm"),
        GraftFunctions.minhashMd5Signature(col("text"), numHashes = 4, k = 2).as("mm"),
        GraftFunctions.simhashMd5(col("text"), k = 2).as("fm"))
      .as[(Long, Seq[Long], Seq[Long], Long, Seq[Long], Seq[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(viaSql === viaCol)
  }

  test("nfc_normalize and vector_dot from SQL") {
    // e + combining acute accent composes to the single NFC codepoint
    val n = spark.sql("SELECT nfc_normalize('é') AS s").as[String].head()
    assert(n == "é")
    val d = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(d === 32.0)
    val sq = spark.sql(
      "SELECT vector_sqdist(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(sq === 27.0)
  }

  test("vector_sqdist equals the declarative zip_with/aggregate fold") {
    val vecs = (0 until 20).map { r =>
      (r.toLong,
        (0 until 8).map(j => ((r * 37 + j * 11) % 101 - 50).toDouble / 13.0).toArray,
        (0 until 8).map(j => ((r * 53 + j * 29) % 97 - 48).toDouble / 17.0).toArray)
    }
    val df = vecs.toDF("id", "a", "b")
    val viaExpr = df.selectExpr("id", "vector_sqdist(a, b) AS d")
      .as[(Long, Double)].collect().toMap
    val viaHof = df.select(col("id"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("d"))
      .as[(Long, Double)].collect().toMap
    vecs.foreach { case (id, _, _) => assert(viaExpr(id) === viaHof(id)) }
  }

  test("sign_bands from SQL equals the Column form") {
    val vec = (0 until 8).map(j => (j + 1).toDouble / 7.0 - 0.5)
    val lit8 = vec.map(v => s"${v}d").mkString(", ")
    val viaSql = spark.sql(s"SELECT sign_bands(array($lit8), 16, 4) AS b")
      .as[Seq[Long]].head()
    val viaCol = Seq(Tuple1(vec.toArray)).toDF("v")
      .select(SignBands.signBands(col("v"), 16, 4).as("b"))
      .as[Seq[Long]].head()
    assert(viaSql === viaCol)
  }

  test("top_k_by_score aggregates from SQL like the window formulation") {
    val scored = (1L to 40L).map(i => (i % 4, i, (i * 7919L) % 100))
      .toDF("g", "id", "score")
    scored.createOrReplaceTempView("sql_scored")
    val viaSql = spark.sql(
      """SELECT g, top_k_by_score(struct(score, id), 3) AS top
        |FROM sql_scored GROUP BY g""".stripMargin)
      .select(col("g"), col("top.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = scored.groupBy("g")
      .agg(TopKByScore.topKByScore(struct(col("score"), col("id")), 3).as("top"))
      .select(col("g"), col("top.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).orderBy(col("score").desc, col("id").asc)
      .groupBy("g").agg(collect_list("id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql === viaAgg)
    assert(viaSql === viaWindow)
  }

  test("frequent_items from SQL: exact regime equals GROUP BY counts; " +
    "capacity is a hard memory bound with a certified error interval") {
    import graft.functions.FrequentItems
    // exact regime: capacity >= distinct — entries are true counts and
    // the interval collapses (cnt_lo = cnt_hi)
    val viaSql = spark.sql(
      """SELECT explode(frequent_items(t.token, 64)) AS e FROM (
        |  SELECT explode(split(text, '\\s+')) AS token FROM sql_docs
        |) t WHERE length(t.token) > 0""".stripMargin)
      .select("e.item", "e.cnt_lo", "e.cnt_hi")
      .as[(String, Long, Long)].collect()
    val truth = spark.table("sql_docs")
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    assert(viaSql.map(e => (e._1, e._2)).toMap === truth)
    assert(viaSql.forall(e => e._2 == e._3))
    // sorted (cnt desc, item asc)
    assert(viaSql.sortBy(e => (-e._2, e._1)).toSeq === viaSql.toSeq)

    // approximate regime: capacity 2 over a skewed single-partition
    // stream — MG guarantees, not exact counts: retained intervals
    // bracket the truth, and any item above the error bound is present
    val stream = (Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 30).map(i => s"rare$i")) // 65 heavy + 30 singletons
    val df = spark.createDataset(stream).repartition(1).toDF("item")
    val out = df.agg(FrequentItems.frequentItems(col("item"), 2).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select("e.item", "e.cnt_lo", "e.cnt_hi")
      .as[(String, Long, Long)].collect()
    val trueCnt = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    out.foreach { case (item, lo, hi) =>
      assert(lo <= trueCnt(item) && trueCnt(item) <= hi,
        s"$item: [$lo,$hi] vs ${trueCnt(item)}")
    }
    val n = stream.size.toLong
    val bound = (n - out.map(_._2).sum) / 3L
    // every item with true frequency above the bound must be retained
    trueCnt.filter(_._2 > bound).keys.foreach { k =>
      assert(out.exists(_._1 == k), s"guaranteed item $k missing")
    }
    assert(out.length <= 2)
  }

  test("frequent_items: exact-regime result is partitioning-independent " +
    "(mergeable summaries)") {
    import graft.functions.FrequentItems
    val stream = (1 to 500).map(i => s"t${i % 17}")
    def run(parts: Int) =
      spark.createDataset(stream).repartition(parts).toDF("item")
        .agg(FrequentItems.frequentItems(col("item"), 64).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select("e.item", "e.cnt_lo", "e.cnt_hi")
        .as[(String, Long, Long)].collect().toSeq
    assert(run(1) === run(13))
  }

  test("arity and literal-argument errors are loud") {
    intercept[Exception](spark.sql("SELECT vector_dot(array(1.0d))").collect())
    intercept[Exception](spark.sql("SELECT shingle_hashes()").collect())
    // k must be a literal: sizing a heap per-row has no meaning
    intercept[Exception](spark.sql(
      "SELECT g, top_k_by_score(struct(score, id), id) FROM sql_scored GROUP BY g")
      .collect())
  }

  test("the extensions hook injects the same descriptor set register() uses") {
    // one descriptor per SQL name, no duplicates; the hook iterates the
    // identical list, so set equality here pins hook/register parity
    val reg = new graft.functions.GraftExtensions
    assert(reg != null)
    val ids = GraftFunctions.descriptors.map(_._1.funcName)
    assert(ids.distinct.size == ids.size)
    assert(ids.size == 24) // + cdc_cuts, sketch build+merge, unigram_encode,
    // adjacent_pairs + upper_triangle_pairs (round-17 pair expansion)
  }
}
