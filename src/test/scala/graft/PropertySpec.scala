package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AnnotationJoin, Dedup}

/** Property-based checks of the operator algebra (SURVEY.md §7.6), using
  * scalacheck generators sampled with a fixed seed (the scalatest bridge
  * artifact isn't in the offline cache, so sampling is hand-rolled —
  * deterministic and replayable by seed).
  *
  * Generators deliberately draw ids/dates/times from tiny alphabets so
  * collisions — the interesting case for dedup/join laws — are dense.
  */
case class Row0(id: String, date: Date, parserTime: Timestamp, payload: Long)

class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val genRow: Gen[Row0] = for {
    id <- Gen.oneOf("a", "b", "c", "d")
    day <- Gen.choose(1, 3)
    hour <- Gen.choose(0, 4)
    payload <- Gen.choose(0L, 999L)
  } yield Row0(id, Date.valueOf(f"2023-05-$day%02d"),
    Timestamp.valueOf(f"2023-05-$day%02d $hour%02d:00:00"), payload)

  private val genRows: Gen[List[Row0]] = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, genRow))

  /** Deterministic samples: seed walks per case. */
  private def samples[T](gen: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private def df(rows: List[Row0]): DataFrame =
    rows.toDF("id", "date", "parserTime", "payload")

  private def canon(d: DataFrame): Set[(String, Date, Timestamp, Long)] =
    d.select("id", "date", "parserTime", "payload")
      .collect().map(r => (r.getString(0), r.getDate(1), r.getTimestamp(2), r.getLong(3))).toSet

  test("keep-set dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    samples(genRows, 8).foreach { rows =>
      val once = Dedup.keepLatest(df(rows), Seq("id", "date"), col("parserTime"))
      val twice = Dedup.keepLatest(once, Seq("id", "date"), col("parserTime"))
      assert(canon(twice) === canon(once))
    }
  }

  test("keep-set ⊎ deleted-set partitions the input (as multisets)") {
    samples(genRows, 8).foreach { rows =>
      val d = df(rows)
      val kept = Dedup.keepLatest(d, Seq("id", "date"), col("parserTime"))
      val deleted = Dedup.deletedSet(d, Seq("id", "date"), col("parserTime"))
      // disjoint on the (keys, orderKey) level and unioning back to the input
      assert(kept.count() + deleted.count() === d.count())
      assert(canon(kept.union(deleted)) === canon(d))
      val keptKeys = kept.select("id", "date", "parserTime").distinct()
      val delKeys = deleted.select("id", "date", "parserTime").distinct()
      assert(keptKeys.join(delKeys, Seq("id", "date", "parserTime")).count() === 0)
    }
  }

  test("keep-set keeps ALL max-time ties; every group keeps >= 1 row") {
    samples(genRows, 8).foreach { rows =>
      val kept = Dedup.keepLatest(df(rows), Seq("id", "date"), col("parserTime"))
      val expected = rows.groupBy(r => (r.id, r.date))
        .flatMap { case (_, g) =>
          val maxT = g.map(_.parserTime.getTime).max
          g.filter(_.parserTime.getTime == maxT)
        }.toSet
      assert(canon(kept) === expected.map(r => (r.id, r.date, r.parserTime, r.payload)))
    }
  }

  test("skew formulation equals the window formulation on every sample") {
    samples(genRows, 8).foreach { rows =>
      val d = df(rows)
      val win = Dedup.keepLatest(d, Seq("id", "date"), col("parserTime"))
      val skew = Dedup.keepLatestForSkew(d, Seq("id", "date"), col("parserTime"))
      assert(canon(skew) === canon(win))
      assert(skew.count() === win.count())
    }
  }

  test("approx duplicate stats flags the same groups as the exact form") {
    samples(genRows, 6).foreach { rows =>
      val d = df(rows)
      val exact = Dedup.duplicateStats(d, Seq("id", "date"), col("parserTime"))
        .select("id", "date").collect().map(r => (r.getString(0), r.getDate(1))).toSet
      val approx = Dedup.duplicateStatsApprox(d, Seq("id", "date"), col("parserTime"))
        .select("id", "date").collect().map(r => (r.getString(0), r.getDate(1))).toSet
      // HLL++ is exact in its sparse range; at these group sizes the sets match
      assert(approx === exact)
    }
  }

  test("ranked dedup keeps exactly one row per key") {
    samples(genRows, 8).foreach { rows =>
      val d = df(rows)
      val ranked = Dedup.rankedFirst(d, Seq(col("id"), col("date")),
        Seq(col("parserTime").desc, col("payload").asc))
      val nKeys = d.select("id", "date").distinct().count()
      assert(ranked.count() === nKeys)
      assert(ranked.select("id", "date").distinct().count() === nKeys)
    }
  }

  test("rankedFirstAgg ≡ rankedFirst under every invertible direction mix") {
    // payload as the unique tiebreak makes each ordering total, so the
    // window and aggregate forms must agree EXACTLY on every sample;
    // direction mixes cover desc timestamp/long and asc string
    val orderings: Seq[Seq[org.apache.spark.sql.Column]] = Seq(
      Seq(col("parserTime").desc, col("payload").asc),
      Seq(col("payload").desc, col("parserTime").asc),
      Seq(col("id").asc, col("parserTime").desc, col("payload").desc),
      Seq(col("parserTime").asc, col("payload").asc))
    samples(genRows, 6).foreach { rows =>
      val d = df(rows)
      orderings.foreach { ord =>
        val win = Dedup.rankedFirst(d, Seq(col("id"), col("date")), ord)
        val agg = Dedup.rankedFirstAgg(d, Seq(col("id"), col("date")), ord)
        assert(canon(agg) === canon(win), s"ordering: $ord")
      }
    }
  }

  test("dedup is scoped: other (id,date) groups pass through untouched") {
    samples(genRows, 5).foreach { rows =>
      val d = df(rows)
      val kept = Dedup.keepLatest(d, Seq("id", "date"), col("parserTime"))
      // rows whose group has a single distinct time survive verbatim
      val singleGroups = rows.groupBy(r => (r.id, r.date))
        .filter(_._2.map(_.parserTime).distinct.size <= 1)
        .values.flatten.map(r => (r.id, r.date, r.parserTime, r.payload)).toSet
      assert(singleGroups.subsetOf(canon(kept)))
    }
  }

  test("annotation join row-multiplication law: one output row per " +
    "(measurement, matching-ann) pair, at least one per measurement") {
    val genAnn: Gen[List[Row0]] = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, genRow))
    samples(Gen.zip(genRows, genAnn), 6).foreach { case (mRows, aRows) =>
      val m = df(mRows)
      val ann = df(aRows).withColumnRenamed("payload", "geo")
        .withColumnRenamed("parserTime", "parser_time")
      val out = AnnotationJoin.annotateAsOf(m, ann, windowDays = 1)
      // expected multiplicity per measurement row, computed independently
      val annByIdDate = aRows.groupBy(a => a.id)
      val expected = mRows.map { r =>
        val matches = annByIdDate.getOrElse(r.id, Nil).count { a =>
          val diff = r.date.toLocalDate.toEpochDay - a.date.toLocalDate.toEpochDay
          diff >= 0 && diff <= 1
        }
        math.max(1, matches)
      }.sum
      assert(out.count() === expected)
    }
  }

  test("copy-then-delete conserves rows across tables (partition move)") {
    samples(genRows, 4).foreach { rows =>
      val d = df(rows).withColumn("date", col("date"))
      val total = d.count()
      val target = Date.valueOf("2023-05-02")
      val copied = d.filter(col("date") === lit(target))
      val remaining = d.filter(col("date") =!= lit(target))
      assert(copied.count() + remaining.count() === total)
      assert(canon(copied.union(remaining)) === canon(d))
    }
  }

  // ---- laws for the round-2 operators ----

  test("sessionize conserves events, orders sessions, and respects the gap") {
    import graft.operators.Sessions
    val gapMs = 30L * 60 * 1000
    samples(genRows, 6).foreach { rows =>
      val ev = df(rows).select(col("id").as("user_id"), col("parserTime").as("ts"))
      val sessions = Sessions.sessionize(ev, "user_id", "ts",
          java.time.Duration.ofMillis(gapMs))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      // conservation: every event lands in exactly one session
      assert(sessions.map(_._5).sum === ev.count())
      sessions.groupBy(_._1).foreach { case (_, ss) =>
        val byIdx = ss.sortBy(_._2)
        // session_idx is 1..n and time-ordered
        assert(byIdx.map(_._2).toSeq === (1L to ss.length).toSeq)
        // within a session start <= end; consecutive sessions are
        // separated by MORE than the gap (else they would have merged)
        byIdx.foreach(s => assert(!s._3.after(s._4)))
        byIdx.toSeq.sliding(2).foreach {
          case Seq(a, b) =>
            assert(b._3.getTime - a._4.getTime > gapMs)
          case _ =>
        }
      }
    }
  }

  test("minLabelClusters: labels are component minima, stable under edge order") {
    import graft.operators.TextDedup
    val genPairs = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b))))
    samples(genPairs, 6).filter(_.nonEmpty).foreach { pairs =>
      val d = pairs.toDF("id_a", "id_b")
      val labels = TextDedup.minLabelClusters(d).as[(Long, Long)].collect().toMap
      // label <= id, and every label is itself in its own cluster root
      labels.foreach { case (id, l) => assert(l <= id && labels(l) == l) }
      // edge endpoints share a label (connectivity)
      pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
      // permutation invariance: reversed edge list, distributed path
      val rev = pairs.reverse.toDF("id_a", "id_b")
      val labels2 = TextDedup.minLabelClusters(rev, localEdgeThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(labels2 === labels)
    }
  }

  test("packGreedy laws: placement partition, budget bound, next-fit offsets") {
    import graft.operators.Packing
    val genDocs = Gen.choose(1, 50).flatMap(n => Gen.listOfN(n, for {
      len <- Gen.frequency(8 -> Gen.choose(1L, 60L), 1 -> Gen.choose(200L, 400L))
    } yield len)).map(_.zipWithIndex.map { case (len, i) => (i.toLong, len) })
    samples(genDocs, 8).foreach { docsL =>
      val d = docsL.toDF("doc_id", "n_tokens")
      val out = Packing.packGreedy(d, "doc_id", "n_tokens",
        budgetTokens = 128L, nShards = 3)
        .select("doc_id", "shard", "bin", "bin_offset", "n_tokens")
        .as[(Long, Long, Long, Long, Long)].collect()
      // placement is a partition of the input
      assert(out.map(_._1).sorted.toSeq === docsL.map(_._1).sorted)
      // lengths survive unchanged
      assert(out.map(r => r._1 -> r._5).toMap === docsL.toMap)
      out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
        // multi-doc bins fit the budget; oversize docs sit alone
        if (rows.length > 1) assert(rows.map(_._5).sum <= 128L)
        // offsets are the next-fit prefix sums in ascending id order
        rows.sortBy(_._1).foldLeft(0L) { (expect, r) =>
          assert(r._4 === expect); expect + r._5
        }
      }
      // bins within a shard are dense from 0 (no skipped bin index)
      out.groupBy(_._2).foreach { case (_, rows) =>
        val bins = rows.map(_._3).distinct.sorted
        assert(bins === (0L until bins.length).toSeq)
      }
    }
  }

  test("assignSplits ∘ hashSample coherence: split sizes sum and stay disjoint") {
    import graft.operators.Curation
    val genIds = Gen.choose(1, 80).map(n => (0 until n).map(_.toLong).toList)
    samples(genIds, 4).foreach { ids =>
      val d = ids.toDF("doc_id")
      val out = Curation.assignSplits(d, "doc_id",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
        .select("doc_id", "split").as[(Long, String)].collect()
      assert(out.length === ids.length)
      // each id appears once with exactly one split
      assert(out.map(_._1).distinct.length === ids.length)
      // the same weights re-expressed as cumulative hashSample thresholds
      // give identical membership (the split IS the nested-prefix rule)
      val h = graft.operators.TextDedup.md5Long(
        concat(lit("split#"), col("doc_id").cast("string"))) % 10000L
      val trainIds = d.filter(h < 9000L).as[Long].collect().toSet
      assert(out.filter(_._2 == "train").map(_._1).toSet === trainIds)
    }
  }

  test("temperatureSample: subset, smallest stratum whole, rates match " +
    "a driver-side recompute") {
    import graft.operators.Sampling
    val genDocs = Gen.choose(5, 120).flatMap(n => Gen.listOfN(n, for {
      lang <- Gen.frequency(4 -> Gen.const("en"), 2 -> Gen.const("de"),
        1 -> Gen.const("fr"))
    } yield lang)).map(_.zipWithIndex.map { case (l, i) => (i.toLong, l) })
    samples(genDocs, 5).foreach { docs =>
      val d = docs.toDF("doc_id", "lang")
      val out = Sampling.temperatureSample(d, "doc_id", "lang")
        .select("doc_id", "lang").as[(Long, String)].collect()
      // subset of the input, no duplication
      assert(out.map(_._1).distinct.length === out.length)
      assert(out.map(_._1).toSet.subsetOf(docs.map(_._1).toSet))
      val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val minN = counts.values.min
      // membership equals the explicit hashSample at the sqrt rate
      counts.foreach { case (lang, n) =>
        val rate = math.floor(math.sqrt(minN.toDouble / n) * 10000).toLong
        val expected = Sampling.hashSample(
          d.filter(col("lang") === lang), "doc_id", lit(rate), salt = "temp")
          .select("doc_id").as[Long].collect().toSet
        assert(out.filter(_._2 == lang).map(_._1).toSet === expected)
        if (n == minN) assert(expected.size.toLong === n) // rate 10000 keeps all
      }
    }
  }

  test("percentileRankByValue matches the strictly-below definition on " +
    "every sample and stays in [0, 10000)") {
    import graft.operators.TextAnalysis
    val genVals = Gen.choose(1, 100).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    samples(genVals, 5).foreach { rows =>
      val d = rows.toDF("doc_id", "score")
      val got = TextAnalysis.percentileRankByValue(d, "score")
        .select("doc_id", "pct_e4").as[(Long, Long)].collect().toMap
      val vals = rows.map(_._2)
      rows.foreach { case (id, v) =>
        val below = vals.count(_ < v).toLong
        val expected = math.floor(below * 10000.0 / vals.length).toLong
        assert(got(id) === expected)
        assert(got(id) >= 0L && got(id) < 10000L)
      }
    }
  }

  test("tokenize conserves positions and ids stay within [0, V]") {
    import graft.operators.TextAnalysis
    val words = Seq("a", "b", "c", "d", "e", "f")
    val genDocs = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" ")))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    samples(genDocs, 5).foreach { docs =>
      val d = docs.toDF("doc_id", "text")
      val v = 3
      val out = TextAnalysis.tokenize(d, "doc_id", "text", vocabSize = v)
        .as[(Long, Long, Long)].collect()
      docs.foreach { case (id, t) =>
        val ps = out.filter(_._1 == id).map(_._2).sorted.toSeq
        // every position 1..len(tokens) present exactly once
        assert(ps === (1L to t.split("\\s+").length.toLong))
      }
      assert(out.forall(r => r._3 >= 0L && r._3 <= v.toLong))
      // ids 1..V each belong to exactly ONE token string globally
      val byId = out.filter(_._3 > 0).map(_._3).distinct
      assert(byId.length <= v)
    }
  }

  test("centroidSums conserves counts and scaled mass per group") {
    import graft.operators.Similarity
    val genVecs = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    } yield (g, v)))
    samples(genVecs, 6).foreach { vecs =>
      val d = vecs.toDF("label", "embedding")
      val out = Similarity.centroidSums(d, "label", "embedding")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      vecs.groupBy(_._1).foreach { case (g, vs) =>
        val dims = out.filter(_._1 == g)
        assert(dims.length === 4)
        // every dim sees every vector of the group
        assert(dims.forall(_._4 === vs.length.toLong))
        // scaled mass matches a driver-side recompute exactly
        (0 until 4).foreach { i =>
          val expected = vs.map(v => math.floor(v._2(i).toDouble * 1e6).toLong).sum
          assert(dims.find(_._2 == i).get._3 === expected)
        }
      }
    }
  }

  test("centroidOutliers matches a driver-side brute-force recompute, " +
    "ties broken (dist desc, id asc)") {
    import graft.operators.Similarity
    val genVecs = Gen.choose(4, 18).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    } yield (g, v)))
    samples(genVecs, 5).foreach { vecs =>
      val rows = vecs.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      val d = rows.toDF("vec_id", "label", "embedding")
      val k = 3
      val out = Similarity.centroidOutliers(d, "vec_id", "label", "embedding", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      rows.groupBy(_._2).foreach { case (g, grp) =>
        val n = grp.length
        val w = grp.map { case (id, _, v) =>
          (id, v.map(x => math.floor(x.toDouble * 1e6).toLong)) }
        val s = (0 until 4).map(i => w.map(_._2(i)).sum)
        val scores = w.map { case (id, wv) =>
          val d2 = (0 until 4).map { i =>
            val dev = wv(i).toDouble - s(i).toDouble / n
            math.floor(dev * dev).toLong
          }.sum
          (id, d2)
        }
        val expect = scores.sortBy(t => (-t._2, t._1)).take(k).toSeq
        val got = out.filter(_._1 == g).sortBy(_._4).map(t => (t._2, t._3)).toSeq
        assert(got === expect, s"group $g")
      }
    }
  }

  test("marginPairs matches a driver-side brute-force recompute " +
    "(single cluster)") {
    import graft.operators.Similarity
    val genVecs = Gen.choose(5, 12).flatMap(n => Gen.listOfN(n,
      Gen.listOfN(4, Gen.choose(1, 1000).map(_ / 1000.0f)))) // positive → dens > 0
    samples(genVecs, 4).foreach { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val d = rows.toDF("vec_id", "embedding")
      val k = 2
      val out = Similarity.marginPairs(d, "vec_id", "embedding",
        d.limit(1), "vec_id", "embedding", k, minMarginE4 = Long.MinValue,
        cacheAssignment = false)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val dv = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
      def cosE6(i: Long, j: Long): Long = {
        val (a, b) = (dv(i), dv(j))
        math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6).toLong
      }
      val ids = rows.map(_._1)
      val den = ids.map { i =>
        val tk = ids.filter(_ != i).map(j => (cosE6(i, j), j))
          .sortBy(t => (-t._1, t._2)).take(k)
        i -> tk.map(_._1).sum.toDouble / tk.length
      }.toMap
      val expect = (for {
        i <- ids; j <- ids if i < j
      } yield {
        val c = cosE6(i, j)
        ((i, j), (c, math.floor(20000.0 * c / (den(i) + den(j))).toLong))
      }).toMap
      assert(out === expect)
      // hub suppression direction: margins normalize by neighborhood
      // density, so a pair's margin exceeds 1 (10000e4) iff its cosine
      // beats the mean of its endpoints' top-k averages
      out.foreach { case ((i, j), (c, m)) =>
        assert((m >= 10000L) === (c >= (den(i) + den(j)) / 2.0) ||
          math.abs(20000.0 * c / (den(i) + den(j)) - 10000.0) < 1.0)
      }
    }
  }

  test("frequent_items guarantees hold on random streams, capacities, " +
    "and partitionings: intervals bracket truth, bound respected, " +
    "heavy items guaranteed present") {
    import graft.functions.FrequentItems
    val genCase = for {
      n <- Gen.choose(50, 400)
      alpha <- Gen.choose(1, 8) // skew: item id ~ x % (alpha*10)
      cap <- Gen.choose(2, 12)
      parts <- Gen.choose(1, 7)
      xs <- Gen.listOfN(n, Gen.choose(0, 1000))
    } yield (xs.map(x => s"i${(x * x) % (alpha * 10)}"), cap, parts)
    samples(genCase, 8).foreach { case (stream, cap, parts) =>
      val truth = stream.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val out = spark.createDataset(stream).repartition(parts).toDF("item")
        .agg(FrequentItems.frequentItems(col("item"), cap).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select("e.item", "e.cnt_lo", "e.cnt_hi")
        .as[(String, Long, Long)].collect()
      assert(out.length <= cap, s"cap $cap exceeded: ${out.length}")
      out.foreach { case (item, lo, hi) =>
        assert(lo <= truth(item) && truth(item) <= hi,
          s"$item [$lo,$hi] vs ${truth(item)} (cap $cap parts $parts)")
      }
      val bound = (stream.size.toLong - out.map(_._2).sum) / (cap + 1L)
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(out.exists(_._1 == k),
          s"item $k (freq ${truth(k)} > bound $bound) missing " +
            s"(cap $cap parts $parts)")
      }
    }
  }

  test("tokenEntropy's in-row fold matches a driver-side relational " +
    "recompute on random corpora") {
    import graft.operators.TextAnalysis
    val words = Seq("a", "b", "c", "dd", "eee")
    val genDocs = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" ")))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    samples(genDocs, 6).foreach { docs =>
      val out = TextAnalysis.tokenEntropy(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      docs.foreach { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val counts = toks.groupBy(identity).map(_._2.length.toLong)
        val l = toks.length.toLong
        val ent = counts.map(c => math.floor(
          1e6 * (c.toDouble / l) * math.log(l.toDouble / c)).toLong).sum
        assert(out(id) === (id, l, counts.size.toLong,
          if (l == 0) 0L else ent))
      }
    }
  }

  test("tx warehouse model check: random append/replace/delete sequences " +
    "match an in-memory partition model at every step") {
    import graft.tableops.TxWarehouse
    sealed trait Op
    case class Append(date: Int, vs: List[Long]) extends Op
    case class Replace(date: Int, vs: List[Long]) extends Op
    case class DeleteP(date: Int) extends Op
    val genOp: Gen[Op] = Gen.frequency(
      4 -> (for { d <- Gen.choose(1, 3); n <- Gen.choose(1, 3)
                  vs <- Gen.listOfN(n, Gen.choose(0L, 999L)) } yield Append(d, vs)),
      3 -> (for { d <- Gen.choose(1, 3); n <- Gen.choose(0, 2)
                  vs <- Gen.listOfN(n, Gen.choose(0L, 999L)) } yield Replace(d, vs)),
      2 -> Gen.choose(1, 3).map(DeleteP(_)))
    val genOps = Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, genOp))

    samples(genOps, 3).zipWithIndex.foreach { case (ops, i) =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-model$i").toString
      val wh = new TxWarehouse(root)
      val path = wh.tablePath("m", "t")
      def date(d: Int) = java.time.LocalDate.parse(f"2024-01-0$d")
      def dfOf(d: Int, vs: List[Long]) =
        vs.map(v => (v, Date.valueOf(f"2024-01-0$d"))).toDF("v", "date")
      // the model: partition -> multiset of values
      var model = Map[Int, List[Long]]().withDefaultValue(Nil)
      ops.foreach { op =>
        op match {
          case Append(d, vs) =>
            wh.append(spark, dfOf(d, vs), path); model += (d -> (model(d) ++ vs))
          case Replace(d, vs) =>
            wh.overwritePartition(spark, dfOf(d, vs), path, date(d))
            model += (d -> vs)
          case DeleteP(d) =>
            wh.deletePartition(spark, path, date(d)); model -= d
        }
        // full-table readback equals the model as a multiset per partition
        val got =
          if (model.values.forall(_.isEmpty)) Nil
          else wh.read(spark, path).collect()
            .map(r => (r.getAs[Date]("date").toLocalDate.getDayOfMonth,
              r.getAs[Long]("v"))).toSeq
        val want = model.toSeq.flatMap { case (d, vs) => vs.map(d -> _) }
        assert(got.sorted == want.sorted, s"ops so far: $ops")
      }
      // the final version count equals the number of effective commits
      // (deletes of absent partitions commit nothing)
      assert(wh.currentVersion(spark, path) > 0 || ops.isEmpty)
    }
  }

  test("merge model check: random upsert/delete change sets — with and " +
    "without bloom skipping — match a key-value model at every step, " +
    "and time travel replays every intermediate state") {
    import graft.tableops.TxWarehouse
    val D = Date.valueOf("2024-01-01")
    case class ChangeSet(ups: Map[Long, Long], dels: Set[Long])
    val keys = 0L until 50L
    val genCs: Gen[ChangeSet] = for {
      delKeys <- Gen.someOf(keys)
      upsKeys <- Gen.someOf(keys.filterNot(delKeys.contains))
      vals <- Gen.listOfN(upsKeys.size, Gen.choose(0L, 999L))
    } yield ChangeSet(upsKeys.zip(vals).toMap, delKeys.toSet)
    val genRun = for {
      n <- Gen.choose(2, 4)
      css <- Gen.listOfN(n, genCs)
      bloom <- Gen.oneOf(true, false)
    } yield (css, bloom)

    samples(genRun, 3).zipWithIndex.foreach { case ((css, bloom), i) =>
      val root =
        java.nio.file.Files.createTempDirectory(s"graft-mmodel$i").toString
      val wh = new TxWarehouse(root)
      val path = wh.tablePath("m", "t")
      if (bloom) wh.setBloomFilter(spark, path, "k", 100, 0.01)
      // bootstrap: even keys present, scattered so ranges can't prune
      var model: Map[Long, Long] = keys.filter(_ % 2 == 0).map(_ -> 0L).toMap
      wh.append(spark,
        model.toSeq.map { case (k, v) => (k, v, D) }.toDF("k", "v", "date")
          .repartition(4, col("k") % 4), path)
      def readBack(): Map[Long, Long] =
        wh.read(spark, path).select("k", "v").as[(Long, Long)]
          .collect().toMap
      var history = List(wh.currentVersion(spark, path) -> model)
      css.foreach { cs =>
        val changes =
          (cs.ups.toSeq.map { case (k, v) => (k, v, D, false) } ++
            cs.dels.toSeq.map(k => (k, 0L, D, true)))
            .toDF("k", "v", "date", "del")
        if (cs.ups.nonEmpty || cs.dels.nonEmpty) {
          wh.mergeInto(spark, changes, path, Seq("k"), Some("del"))
          model = (model -- cs.dels) ++ cs.ups
          history ::= wh.currentVersion(spark, path) -> model
        }
        assert(readBack() == model, s"bloom=$bloom changes so far: $css")
      }
      // every committed state is still reachable by version
      history.foreach { case (v, m) =>
        val got = wh.readAt(spark, path, v).select("k", "v")
          .as[(Long, Long)].collect().toMap
        assert(got == m, s"time travel to v$v diverged (bloom=$bloom)")
      }
    }
  }

  test("deletion-vector model check: interleaved MoR deletes, CoW " +
    "deletes, merges, and compaction folds match a key-value model at " +
    "every step, and time travel replays every intermediate state") {
    import graft.tableops.TxWarehouse
    val D = Date.valueOf("2024-01-01")
    sealed trait Op
    case class MorDel(keys: Set[Long]) extends Op
    case class CowDel(keys: Set[Long]) extends Op
    case class Ups(kv: Map[Long, Long]) extends Op
    case object Fold extends Op
    val keys = 0L until 60L
    val genOp: Gen[Op] = Gen.frequency(
      3 -> Gen.someOf(keys).map(ks => MorDel(ks.toSet)),
      2 -> Gen.someOf(keys).map(ks => CowDel(ks.toSet)),
      2 -> (for {
        ks <- Gen.someOf(keys)
        vs <- Gen.listOfN(ks.size, Gen.choose(0L, 999L))
      } yield Ups(ks.zip(vs).toMap)),
      1 -> Gen.const(Fold))
    val genRun = Gen.choose(3, 5).flatMap(n => Gen.listOfN(n, genOp))

    samples(genRun, 3).zipWithIndex.foreach { case (ops, i) =>
      val root =
        java.nio.file.Files.createTempDirectory(s"graft-dvmodel$i").toString
      val wh = new TxWarehouse(root)
      val path = wh.tablePath("m", "t")
      var model: Map[Long, Long] = keys.map(_ -> 0L).toMap
      wh.append(spark,
        model.toSeq.map { case (k, v) => (k, v, D) }.toDF("k", "v", "date")
          .repartition(4, col("k") % 4), path)
      def readBack(): Map[Long, Long] =
        wh.read(spark, path).select("k", "v").as[(Long, Long)]
          .collect().toMap
      var history = List(wh.currentVersion(spark, path) -> model)
      ops.foreach { op =>
        val v0 = wh.currentVersion(spark, path)
        op match {
          case MorDel(ks) if ks.nonEmpty =>
            wh.deleteWhereMor(spark, path,
              col("k").isin(ks.toSeq.map(x => x: Any): _*))
            model = model -- ks
          case CowDel(ks) if ks.nonEmpty =>
            wh.deleteWhere(spark, path,
              col("k").isin(ks.toSeq.map(x => x: Any): _*))
            model = model -- ks
          case Ups(kv) if kv.nonEmpty =>
            wh.mergeInto(spark,
              kv.toSeq.map { case (k, v) => (k, v, D) }
                .toDF("k", "v", "date"), path, Seq("k"))
            model = model ++ kv
          case Fold =>
            wh.compact(spark, path, smallBytes = 1L): Unit
            assert(wh.deletionVectorStats(spark, path).isEmpty,
              s"fold left vectors standing (ops=$ops)")
          case _ => () // empty key set: no-op
        }
        if (wh.currentVersion(spark, path) != v0)
          history ::= wh.currentVersion(spark, path) -> model
        assert(readBack() == model, s"ops so far: $ops")
        // the manifest fast count must track the model exactly
        assert(wh.fastRowCount(spark, path).forall(_ == model.size.toLong),
          s"fastRowCount diverged (ops=$ops)")
      }
      history.foreach { case (v, m) =>
        val got = wh.readAt(spark, path, v).select("k", "v")
          .as[(Long, Long)].collect().toMap
        assert(got == m, s"time travel to v$v diverged (ops=$ops)")
      }
    }
  }
}
