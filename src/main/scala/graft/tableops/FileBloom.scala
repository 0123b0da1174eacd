package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualNullSafe,
  EqualTo, Expression, In, Literal, Or, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file BLOOM FILTERS in the commit manifest — the point-lookup
  * complement of [[FileStats]] min/max skipping. Range stats prune a
  * predicate only when the layout CLUSTERS the column: a key scattered
  * across files (uuid keys, hash-distributed ids, a CDC change set
  * drawn from the whole key space) makes every file's [min,max] span
  * the domain and nothing prunes. A per-file bloom answers the question
  * ranges can't: "can this file contain THIS key?" — false-positive
  * rate bounded by sizing, false negatives impossible, so pruning stays
  * sound and `readWhere`/`mergeInto` open O(matching files + fp·files)
  * instead of O(files) for equality/IN probes.
  *
  * Build side is pure public Spark: one column-pruned pass over the
  * just-written files, `bloom_filter_agg(xxhash64(CAST(col AS STRING)))`
  * per file (groupBy on the filename), serialized with the sketch
  * module's stable format. Values canonicalize THROUGH STRING so the
  * probe side can hash a literal of any promoted type (int column vs
  * long literal, date vs its string) to the same 64-bit key; columns
  * whose string form is ambiguous for equality (floating point) should
  * simply not be bloom columns.
  *
  * TIMESTAMP canonicalization is timezone-dependent (`cast(ts AS
  * STRING)` renders in the session zone), so each per-file payload
  * records the timezone the BUILD session canonicalized under and the
  * probe side re-renders its literal under that recorded zone — a table
  * written under UTC and probed under Asia/Tokyo still hashes the same
  * string and skipping stays sound. Legacy payloads (written before the
  * zone was recorded) carry no zone: timestamp-typed probes against
  * them return "maybe" and the file is kept.
  *
  * The manifest carries one `B <payload> <rel>` line per file
  * (~`bits/8` bytes base64 each — at the default 2^13 bits that is
  * ~1.4 KB per file, the price of skipping a footer+column read); the
  * table's bloom SPEC (column, items, bits) is a `P` property line, so
  * every writer — append, merge, compaction publish — harvests blooms
  * for its adds automatically once the property is set. Files written
  * BEFORE the property (or whose harvest failed) have no `B` line and
  * are never pruned; a bloom re-materializes when compaction rewrites
  * the file.
  *
  * Reference context: the reference's dedup/join queries always probe
  * BigQuery by partition date (cloud/bq/ops.go:158-253) and lean on the
  * warehouse for anything finer; at 100 TB the finer granularity is
  * exactly this layer.
  */
object FileBloom {

  /** Bloom spec recorded as the table property: column (matched
    * lowercased, like [[FileStats]]), expected distinct items per file,
    * bloom bits per file.
    */
  final case class Spec(col: String, items: Long, bits: Long)

  val PropKey = "bloom"

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  def encodeSpec(s: Spec): String =
    s"${b64(s.col.getBytes(UTF_8))}:${s.items}:${s.bits}"

  def decodeSpec(s: String): Option[Spec] = Try {
    val f = s.split(":", -1)
    require(f.length == 3)
    Spec(new String(unb64(f(0)), UTF_8), f(1).toLong, f(2).toLong)
  }.toOption

  /** The property may carry SEVERAL specs (one bloom column per
    * equality-probed key), comma-joined; a single legacy spec decodes
    * as a one-element list.
    */
  def encodeSpecs(ss: Seq[Spec]): String = ss.map(encodeSpec).mkString(",")

  def decodeSpecs(s: String): Seq[Spec] =
    s.split(',').toSeq.flatMap(decodeSpec)

  /** File payload: `b64(col):b64(serialized bloom):b64(buildTz)`
    * entries, one per bloomed column, ';'-joined — columns repeated per
    * file so a later spec change cannot misattribute old blooms. The
    * third field is the session timezone the build-side `CAST(col AS
    * STRING)` canonicalized under; probes of timezone-sensitive
    * literals (TIMESTAMP) must re-render under it. Two-field entries
    * are the pre-timezone legacy format: decoded with no zone, so
    * timestamp probes keep the file.
    */
  def encodePayload(blooms: Seq[(String, Array[Byte])], buildTz: String): String =
    blooms.map { case (c, b) =>
      s"${b64(c.getBytes(UTF_8))}:${b64(b)}:${b64(buildTz.getBytes(UTF_8))}"
    }.mkString(";")

  def decodePayload(s: String): Seq[(String, BloomFilter, Option[String])] =
    s.split(';').toSeq.flatMap { e =>
      Try {
        val f = e.split(":", -1)
        require(f.length == 2 || f.length == 3)
        (new String(unb64(f(0)), UTF_8),
          BloomFilter.readFrom(unb64(f(1))),
          if (f.length == 3) Some(new String(unb64(f(2)), UTF_8)) else None)
      }.toOption
    }

  /** One distributed, column-pruned pass over the files just written
    * under `dir`: per-file bloom of the spec column, keyed by file
    * BASENAME (task-uuid part names are unique; `input_file_name`'s
    * URI prefix differs from the manifest's relativization, the
    * basename does not). Any failure degrades to "no blooms" — the
    * files then simply never bloom-prune.
    */
  def harvest(spark: SparkSession, path: String, dir: String,
      specs: Seq[Spec]): Map[String, String] = Try {
    val df = spark.read.parquet(s"$path/$dir")
    val present = specs.flatMap(sp =>
      df.columns.find(_.equalsIgnoreCase(sp.col)).map(c => (sp, c)))
    if (present.isEmpty) Map.empty[String, String]
    else {
      // The zone the analyzer resolves this plan's CASTs under — record
      // it in the payload so probes re-render literals identically.
      val buildTz = spark.sessionState.conf.sessionLocalTimeZone
      val aggs = present.zipWithIndex.map { case ((sp, c), i) =>
        org.apache.spark.sql.graftshim.AggBridge
          .bloomAgg(col(s"`$c`").cast("string"), sp.items, sp.bits)
          .as(s"__b$i")
      }
      df.select(element_at(split(input_file_name(), "/"), -1).as("__f") +:
          present.map { case (_, c) => col(s"`$c`") }: _*)
        .groupBy(col("__f"))
        .agg(aggs.head, aggs.drop(1): _*)
        .collect()
        .map { r =>
          r.getString(0) -> encodePayload(
            present.zipWithIndex.map { case ((sp, _), i) =>
              sp.col -> r.getAs[Array[Byte]](s"__b$i")
            }, buildTz)
        }
        .toMap
    }
  }.getOrElse(Map.empty)

  /** Hash a predicate literal the way the build side hashed column
    * values: canonicalize through STRING, then XxHash64 (seed 42, the
    * SQL function's default). None when the literal cannot cast —
    * callers must then keep the file.
    *
    * The Cast MUST use the timezone the BUILD side canonicalized under
    * (recorded in the payload by [[harvest]]), not the probing
    * session's: a TIMESTAMP literal rendered under a different zone
    * produces a different string, the bloom reports "absent", and files
    * CONTAINING the key would be pruned — unsound skipping. When the
    * payload predates the recorded zone (`buildTz` None), a
    * timezone-sensitive literal cannot be hashed soundly: return None
    * and keep the file. Timezone-INSENSITIVE types (ints, strings,
    * dates, TIMESTAMP_NTZ) render identically under any zone, so the
    * probing session's zone serves.
    */
  private def literalHash(l: Literal, buildTz: Option[String]): Option[Long] = {
    val tzSensitive = l.dataType == TimestampType
    if (tzSensitive && buildTz.isEmpty) None
    else Try {
      val tz = buildTz.getOrElse(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      val s = Cast(l, StringType, Some(tz)).eval(null)
      if (s == null) None
      else Some(new XxHash64(Seq(Literal(s, StringType))).eval(null)
        .asInstanceOf[Long])
    }.toOption.flatten
  }

  private def attrIs(e: Expression, col: String): Boolean =
    FileStats.attrNamePublic(e).contains(col.toLowerCase)

  /** Sound bloom refutation: false ONLY when `pred` requires a bloomed
    * column to equal one of a literal set and that column's bloom rules
    * out every member. Each bloomed column refutes independently (a
    * conjunct refuted by ANY of them empties the file); leaves over
    * other columns stay "maybe". Mirrors [[FileStats.mayMatch]]'s
    * And/Or folding.
    */
  def mayMatch(payload: String, pred: Expression): Boolean =
    decodePayload(payload).forall { case (col, bloom, buildTz) =>
      def walk(p: Expression): Boolean = p match {
        case And(a, b) => walk(a) && walk(b)
        case Or(a, b) => walk(a) || walk(b)
        case EqualTo(a, l: Literal) if attrIs(a, col) => test(bloom, l, buildTz)
        case EqualTo(l: Literal, a) if attrIs(a, col) => test(bloom, l, buildTz)
        case EqualNullSafe(a, l: Literal) if attrIs(a, col) && l.value != null =>
          test(bloom, l, buildTz)
        case EqualNullSafe(l: Literal, a) if attrIs(a, col) && l.value != null =>
          test(bloom, l, buildTz)
        case In(a, list) if attrIs(a, col) &&
            list.forall(_.isInstanceOf[Literal]) =>
          list.exists(l => test(bloom, l.asInstanceOf[Literal], buildTz))
        case _ => true
      }
      walk(pred)
    }

  private def test(bloom: BloomFilter, l: Literal,
      buildTz: Option[String]): Boolean =
    literalHash(l, buildTz) match {
      case Some(h) => bloom.mightContainLong(h)
      case None => true
    }
}
