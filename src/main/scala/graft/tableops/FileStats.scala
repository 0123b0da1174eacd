package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.language.existentials // parquet's Statistics[T <: Comparable[T]]
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-FILE column statistics for manifest-level data skipping.
  *
  * The transactional warehouse records, for every data file it commits, a
  * compact payload of per-column (nullCount, min, max) harvested from the
  * parquet FOOTER — a metadata-only read at commit time, never a data
  * scan. [[TxWarehouse.readWhere]] then prunes files whose stats prove a
  * predicate cannot match before Spark ever lists them: at archive scale
  * a range query on a clustered column opens O(overlapping files), not
  * O(table) — the same skipping story Delta/Iceberg build on their
  * manifests, here folded into the existing commit log (a new `S` line
  * type; old logs without it simply don't prune).
  *
  * Soundness over completeness, everywhere:
  *  - evaluation answers "MAY this file contain a matching row" — any
  *    unsupported predicate shape, unknown stat, or type mismatch keeps
  *    the file;
  *  - string min/max compare as unsigned UTF-8 BYTES (parquet's binary
  *    stats order and Spark's UTF8String order — NOT java.lang.String
  *    order, which disagrees beyond the BMP);
  *  - float/double columns are never pruned: parquet-mr's stats ignore
  *    NaN while Spark orders NaN above every double, so footer min/max
  *    are not sound bounds for Spark semantics;
  *  - a column ABSENT from a file's payload is absent from the file's
  *    schema (harvest records every leaf, supported or not) — under
  *    mergeSchema it reads as all-null, so comparisons prune and IsNull
  *    keeps.
  */
object FileStats {

  /** Column stat: nulls (-1 unknown), domain tag, canonical min/max.
    * Tags: 'l' = long domain (ints, dates as epoch days), 's' = UTF-8
    * string, '?' = column present but not prunable (floats, timestamps,
    * decimals, unsigned, raw binary...).
    */
  final case class ColStat(nulls: Long, tag: Char,
      min: Option[String], max: Option[String])

  /** rows = file row count; cols keyed by LOWERCASED dot-path. */
  final case class Payload(rows: Long, cols: Map[String, ColStat])

  // ---------------------------------------------------------------- encode

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), UTF_8)

  /** `rows;colEntry,colEntry,...` with
    * `colEntry = b64(name):nulls:tag:b64(min)?:b64(max)?` — no spaces,
    * so the payload embeds as one token in a manifest `S` line.
    */
  def encode(p: Payload): String = {
    val cols = p.cols.toSeq.sortBy(_._1).map { case (name, c) =>
      val mn = c.min.map(b64).getOrElse("")
      val mx = c.max.map(b64).getOrElse("")
      s"${b64(name)}:${c.nulls}:${c.tag}:$mn:$mx"
    }
    s"${p.rows};${cols.mkString(",")}"
  }

  /** None on any malformed payload (forward compat: an unreadable stat
    * must degrade to "keep the file", never to a failed read).
    */
  def decode(s: String): Option[Payload] = Try {
    val semi = s.indexOf(';')
    val rows = s.substring(0, semi).toLong
    val rest = s.substring(semi + 1)
    val cols =
      if (rest.isEmpty) Map.empty[String, ColStat]
      else rest.split(',').map { entry =>
        val f = entry.split(":", -1)
        require(f.length == 5 && f(2).length == 1)
        val mn = if (f(3).isEmpty) None else Some(unb64(f(3)))
        val mx = if (f(4).isEmpty) None else Some(unb64(f(4)))
        unb64(f(0)) -> ColStat(f(1).toLong, f(2).charAt(0), mn, mx)
      }.toMap
    Payload(rows, cols)
  }.toOption

  // --------------------------------------------------------------- harvest

  /** Footer-only stats for one parquet file; None if anything about the
    * footer is unreadable (the commit then records no `S` line and the
    * file is simply never pruned).
    */
  def harvest(conf: Configuration, file: Path): Option[String] = Try {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      var rows = 0L
      // per column: (nulls or -1, mins, maxes, allBlocksHaveStats)
      val acc = scala.collection.mutable.LinkedHashMap[String,
        (Long, List[AnyRef], List[AnyRef], Boolean)]()
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val cc = cit.next()
          val name = cc.getPath.toDotString.toLowerCase
          val st = cc.getStatistics
          val (n0, mins, maxes, ok) =
            acc.getOrElse(name, (0L, Nil, Nil, true))
          if (st == null) acc(name) = (-1L, mins, maxes, false)
          else {
            val nulls =
              if (n0 < 0 || st.getNumNulls < 0) -1L else n0 + st.getNumNulls
            if (st.hasNonNullValue)
              acc(name) = (nulls,
                st.genericGetMin.asInstanceOf[AnyRef] :: mins,
                st.genericGetMax.asInstanceOf[AnyRef] :: maxes, ok)
            else
              // no non-null value in this chunk: nothing to widen by
              acc(name) = (nulls, mins, maxes, ok)
          }
        }
      }
      // leaf schema drives tags, so present-but-unsupported columns are
      // distinguishable from columns missing entirely from the file
      val cols = footer.getFileMetaData.getSchema.getColumns.iterator()
      val out = scala.collection.mutable.Map[String, ColStat]()
      while (cols.hasNext) {
        val cd = cols.next()
        val name = cd.getPath.mkString(".").toLowerCase
        val tag = tagOf(cd.getPrimitiveType)
        val (nulls, mins0, maxes0, ok) =
          acc.getOrElse(name, (0L, Nil, Nil, true))
        // 't' stats normalize to MICROS at harvest (exact — the only
        // admitted source units are millis/micros), then reduce in the
        // long domain like 'l'
        val mult = if (tag == 't') microsMult(cd.getPrimitiveType) else 1L
        def scale(vs: List[AnyRef]): List[AnyRef] =
          if (tag == 't') vs.map(v => java.lang.Long.valueOf(longOf(v) * mult))
          else vs
        val (mins, maxes) = (scale(mins0), scale(maxes0))
        // a column only prunable if every chunk had stats and min/max
        // cover every non-null value; all-null files have empty mins —
        // nulls==rows then carries the pruning power
        val (mn, mx) =
          if (tag != 'l' && tag != 's' && tag != 't') (None, None)
          else if (!ok || mins.isEmpty) (None, None)
          else (reduceMin(tag, mins), reduceMax(tag, maxes))
        out(name) = ColStat(nulls, tag, mn, mx)
      }
      encode(Payload(rows, out.toMap))
    } finally reader.close()
  }.toOption

  private def tagOf(t: org.apache.parquet.schema.PrimitiveType): Char = {
    val l = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => l match {
        case null => 'l'
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => 'l'
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
          if (i.isSigned) 'l' else '?'
        // timestamps: MILLIS/MICROS normalize exactly to a micros long
        // domain ('t') — Spark's TimestampType/TimestampNTZType literals
        // are micros, so comparisons stay in one unit. NANOS stays '?':
        // Spark surfaces it per-session as long-nanos or truncated
        // micros, and a truncating normalization would be unsound on
        // the max side.
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS |
                 LogicalTypeAnnotation.TimeUnit.MICROS => 't'
            case _ => '?'
          }
        case _ => '?' // decimals, unsigned: not sound in the long domain
      }
      case PrimitiveTypeName.BINARY => l match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation |
             _: LogicalTypeAnnotation.EnumLogicalTypeAnnotation |
             _: LogicalTypeAnnotation.JsonLogicalTypeAnnotation => 's'
        case _ => '?'
      }
      case _ => '?' // float/double (NaN), boolean, int96, fixed
    }
  }

  private def longOf(v: AnyRef): Long = v match {
    case i: java.lang.Integer => i.longValue
    case j: java.lang.Long => j.longValue
    case other => throw new IllegalArgumentException(other.getClass.getName)
  }

  private def reduceMin(tag: Char, vs: List[AnyRef]): Option[String] =
    Try {
      if (tag == 'l' || tag == 't') vs.map(longOf).min.toString
      else vs.map(_.asInstanceOf[Binary].toStringUsingUTF8)
        .reduceLeft((a, b) => if (cmpBytes(bytes(a), bytes(b)) <= 0) a else b)
    }.toOption

  private def reduceMax(tag: Char, vs: List[AnyRef]): Option[String] =
    Try {
      if (tag == 'l' || tag == 't') vs.map(longOf).max.toString
      else vs.map(_.asInstanceOf[Binary].toStringUsingUTF8)
        .reduceLeft((a, b) => if (cmpBytes(bytes(a), bytes(b)) >= 0) a else b)
    }.toOption

  private def microsMult(t: org.apache.parquet.schema.PrimitiveType): Long =
    t.getLogicalTypeAnnotation match {
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
          if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
      case _ => 1L
    }

  // ------------------------------------------------------------- evaluate

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  /** Unsigned lexicographic — parquet's UTF8 stat order and Spark's
    * UTF8String order agree on this; java String order does not.
    */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = java.lang.Byte.compareUnsigned(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private sealed trait DV
  private final case class DL(v: Long) extends DV
  private final case class DS(b: Array[Byte]) extends DV

  private def cmpDV(a: DV, b: DV): Int = (a, b) match {
    case (DL(x), DL(y)) => java.lang.Long.compare(x, y)
    case (DS(x), DS(y)) => cmpBytes(x, y)
    case _ => 0 // unreachable: callers pair same-tag values
  }

  private def statDV(tag: Char, s: String): Option[DV] = tag match {
    case 'l' | 't' => Try(DL(s.toLong)).toOption
    case 's' => Some(DS(bytes(s)))
    case _ => None
  }

  /** Literal → the column's domain, or None (type mismatch = no prune). */
  private def litDV(l: Literal, tag: Char): Option[DV] =
    if (l.value == null) None
    else (tag, l.dataType) match {
      case ('l', ByteType | ShortType | IntegerType | DateType) =>
        Some(DL(l.value.asInstanceOf[Number].longValue))
      case ('l', LongType) => Some(DL(l.value.asInstanceOf[Long]))
      case ('s', StringType) => Some(DS(bytes(l.value.toString)))
      // timestamp literals (both TZ flavors) are micros longs — the
      // same unit 't' stats normalized to at harvest
      case ('t', TimestampType | TimestampNTZType) =>
        Some(DL(l.value.asInstanceOf[Long]))
      case _ => None
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name.toLowerCase)
    case a: AttributeReference => Some(a.name.toLowerCase)
    case _ => None
  }

  /** [[FileBloom]]'s attribute matcher — one definition of "this
    * expression IS that column" shared by both skipping layers.
    */
  private[tableops] def attrNamePublic(e: Expression): Option[String] =
    attrName(e)

  /** May `pred` be true for ANY row of a file with stats `p`? False is a
    * proof of emptiness (safe to skip the file); true is merely "cannot
    * rule it out". And/Or fold satisfiability per conjunct — a sound
    * overapproximation.
    */
  def mayMatch(p: Payload, pred: Expression): Boolean = pred match {
    case And(a, b) => mayMatch(p, a) && mayMatch(p, b)
    case Or(a, b) => mayMatch(p, a) || mayMatch(p, b)
    case Literal(true, BooleanType) => p.rows > 0
    case Literal(false, BooleanType) => false
    case Not(EqualTo(a, l: Literal)) => mayNotEqual(p, a, l)
    case Not(EqualTo(l: Literal, a)) => mayNotEqual(p, a, l)
    case Not(_) => true
    case EqualTo(a, l: Literal) => mayCompare(p, a, l, 0, 0)
    case EqualTo(l: Literal, a) => mayCompare(p, a, l, 0, 0)
    case EqualNullSafe(a, l: Literal) =>
      if (l.value == null) mayBeNull(p, a) else mayCompare(p, a, l, 0, 0)
    case EqualNullSafe(l: Literal, a) =>
      if (l.value == null) mayBeNull(p, a) else mayCompare(p, a, l, 0, 0)
    case LessThan(a, l: Literal) => mayCompare(p, a, l, -1, -1)
    case LessThan(l: Literal, a) => mayCompare(p, a, l, 1, 1)
    case LessThanOrEqual(a, l: Literal) => mayCompare(p, a, l, -1, 0)
    case LessThanOrEqual(l: Literal, a) => mayCompare(p, a, l, 1, 0)
    case GreaterThan(a, l: Literal) => mayCompare(p, a, l, 1, 1)
    case GreaterThan(l: Literal, a) => mayCompare(p, a, l, -1, -1)
    case GreaterThanOrEqual(a, l: Literal) => mayCompare(p, a, l, 1, 0)
    case GreaterThanOrEqual(l: Literal, a) => mayCompare(p, a, l, -1, 0)
    case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists(l => mayCompare(p, a, l.asInstanceOf[Literal], 0, 0))
    case IsNull(a) => mayBeNull(p, a)
    case IsNotNull(a) => mayBeNonNull(p, a)
    case StartsWith(a, l: Literal) => mayStartWith(p, a, l)
    case _ => true // unsupported shape: never prune on it
  }

  /** Shared range test. `dir` -1/0/1 = attr must be below / equal-able /
    * above the literal; `strict` -1/1 makes the bound strict, 0 closed.
    * Equality = dir 0. Nulls never satisfy a comparison, so an all-null
    * column (absent from the file, or nulls==rows) is a proof of
    * emptiness for every shape here.
    */
  private def mayCompare(p: Payload, attr: Expression, l: Literal,
      dir: Int, strict: Int): Boolean = {
    if (p.rows == 0) return false
    if (l.value == null) return false // comparisons with null are never true
    attrName(attr) match {
      case None => true
      case Some(name) => p.cols.get(name) match {
        case None => false // column not in this file: all-null under merge
        case Some(c) =>
          if (c.nulls >= 0 && c.nulls >= p.rows) false // every row null
          else litDV(l, c.tag) match {
            case None => true
            case Some(v) =>
              val mn = c.min.flatMap(statDV(c.tag, _))
              val mx = c.max.flatMap(statDV(c.tag, _))
              if (mn.isEmpty || mx.isEmpty) true
              else if (dir == 0)
                cmpDV(mn.get, v) <= 0 && cmpDV(mx.get, v) >= 0
              else if (dir < 0) { // need a value below the literal
                val cmp = cmpDV(mn.get, v)
                if (strict != 0) cmp < 0 else cmp <= 0
              } else { // need a value above the literal
                val cmp = cmpDV(mx.get, v)
                if (strict != 0) cmp > 0 else cmp >= 0
              }
          }
      }
    }
  }

  /** `a != lit`: a non-null value different from the literal must exist —
    * impossible only when min==max==lit covers every non-null row.
    */
  private def mayNotEqual(p: Payload, attr: Expression, l: Literal): Boolean = {
    if (p.rows == 0) return false
    if (l.value == null) return false
    attrName(attr) match {
      case None => true
      case Some(name) => p.cols.get(name) match {
        case None => false // all-null: != is null, never true
        case Some(c) =>
          if (c.nulls >= 0 && c.nulls >= p.rows) false
          else litDV(l, c.tag) match {
            case None => true
            case Some(v) =>
              (c.min.flatMap(statDV(c.tag, _)), c.max.flatMap(statDV(c.tag, _))) match {
                case (Some(mn), Some(mx)) =>
                  !(cmpDV(mn, v) == 0 && cmpDV(mx, v) == 0)
                case _ => true
              }
          }
      }
    }
  }

  private def mayBeNull(p: Payload, attr: Expression): Boolean = {
    if (p.rows == 0) return false
    attrName(attr) match {
      case None => true
      case Some(name) => p.cols.get(name) match {
        case None => true // column absent: every row reads null
        case Some(c) => c.nulls != 0 // -1 unknown keeps; 0 proves none
      }
    }
  }

  private def mayBeNonNull(p: Payload, attr: Expression): Boolean = {
    if (p.rows == 0) return false
    attrName(attr) match {
      case None => true
      case Some(name) => p.cols.get(name) match {
        case None => false
        case Some(c) =>
          if (c.min.nonEmpty) true // a recorded min IS a non-null value
          else if (c.nulls < 0) true
          else c.nulls < p.rows
      }
    }
  }

  /** String prefix: possible iff min truncated to the prefix length is
    * ≤ prefix and max ≥ prefix (unsigned bytes) — the standard interval
    * test, sound under parquet's own stat truncation (truncated mins
    * stay lower bounds, truncated maxes are rounded up).
    */
  private def mayStartWith(p: Payload, attr: Expression, l: Literal): Boolean = {
    if (p.rows == 0) return false
    if (l.value == null) return false
    attrName(attr) match {
      case None => true
      case Some(name) => p.cols.get(name) match {
        case None => false
        case Some(c) =>
          if (c.tag != 's') true
          else if (c.nulls >= 0 && c.nulls >= p.rows) false
          else (c.min, c.max) match {
            case (Some(mn), Some(mx)) =>
              val pb = bytes(l.value.toString)
              val mnb = bytes(mn)
              val mnTrunc = java.util.Arrays.copyOf(mnb,
                math.min(mnb.length, pb.length))
              cmpBytes(mnTrunc, pb) <= 0 && cmpBytes(bytes(mx), pb) >= 0
            case _ => true
          }
      }
    }
  }
}
