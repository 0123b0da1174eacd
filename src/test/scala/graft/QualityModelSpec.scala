package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** The deterministic logistic-regression trainer: it learns (separable
  * toy corpus → training accuracy beats the base rate and improves
  * with iterations), and it is bit-deterministic across runs.
  */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  // 40 docs: positives speak one vocabulary, negatives another
  private def corpus = (0 until 40).map { i =>
    val pos = i % 2 == 0
    val text = if (pos) "good clean prose sentence here"
               else "zzspam zzjunk zzgarbage zzblob zzq"
    (i.toLong, text + s" tail$i", if (pos) "en" else "xx")
  }.toDF("doc_id", "text", "lang")

  private def weights(iters: Int): Map[Int, Long] =
    QualityModel.trainLogRegE6(spark, corpus, "doc_id", "text",
      col("lang") === "en", dim = 8, iters = iters)
      .as[(Int, Long)].collect().toMap

  private def accuracy(w: Map[Int, Long]): Double = {
    val docs = corpus.select(col("doc_id"), col("text"),
      (col("lang") === "en").as("y")).collect()
    val scored = docs.map { r =>
      val toks = Option(r.getString(1)).getOrElse("")
        .split("\\s+").filter(_.nonEmpty)
      // same md5 bucketing as the trainer, recomputed independently
      val m = toks.map { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val j = (java.lang.Long.parseLong(hex.take(15), 16) % 8).toInt
        w.getOrElse(j, 0L)
      }.sum + w.getOrElse(8, 0L)
      (m > 0L) == r.getBoolean(2)
    }
    scored.count(identity).toDouble / scored.length
  }

  test("training learns the separable corpus and is bit-deterministic") {
    val w2 = weights(2)
    assert(w2.size == 9)
    assert(accuracy(w2) >= 0.9, s"2-iter accuracy ${accuracy(w2)}; w=$w2")
    // determinism: a second training run lands on the same integers
    assert(weights(2) == w2)
    // more iterations do not hurt on a separable corpus
    val w4 = weights(4)
    assert(accuracy(w4) >= accuracy(w2) - 1e-9)
  }
}
