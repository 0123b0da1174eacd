package graft.config

import java.time.{Duration, Instant, LocalDate, ZoneOffset}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.model.Datasets
import graft.jobservice.SourceSpec

/** YAML configuration (reference: config/config.go:16-51 and
  * config/config.yml). Shape:
  *
  * {{{
  * start_date: 2019-03-04T00:01:02Z
  * tracker: { timeout: 5h }
  * monitor: { polling_interval: 5m }
  * sources:
  * - bucket: fake-bucket
  *   experiment: ndt
  *   datatype: ndt7
  *   filter: ".*T??:??:00.*Z"
  *   target_datasets: { tmp: tmp_ndt, raw: raw_ndt, join: ndt }
  *   daily_only: true
  *   full_history: false
  * }}}
  */
/** Per-datatype dedup configuration (reference: the per-datatype
  * PartitionKeys/OrderKeys tables in cloud/bq/ops.go:53-83, lifted from
  * code into config). Config-layer mirror of
  * [[graft.tableops.DatatypeSpec]] — kept Spark-free here; `cmd.Gardener`
  * converts.
  */
final case class ContentDedupConfig(
    textCol: String, minJaccardE4: Long, vsRawCorpus: Boolean)
final case class DatatypeConfig(
    partitionKeys: Seq[String], orderKey: String, skewedKeys: Boolean,
    contentDedup: Option[ContentDedupConfig],
    bloomKey: Option[String] = None,
    checks: Seq[(String, String)] = Nil)

final case class GardenerConfig(
    startDate: LocalDate,
    trackerTimeout: Duration,
    pollingInterval: Duration,
    sources: Seq[SourceSpec],
    datatypes: Map[String, DatatypeConfig] = Map.empty,
    maintenanceInterval: Duration = Duration.ofHours(1)
)

object GardenerConfig {

  /** Go-style duration strings: "5h", "2m30s", "90s", "1h30m". */
  def parseDuration(s: String): Duration = {
    val re = raw"(\d+)([hms])".r
    val parts = re.findAllMatchIn(s).toSeq
    require(parts.nonEmpty, s"unparseable duration: $s")
    parts.foldLeft(Duration.ZERO) { (acc, m) =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "h" => acc.plusHours(n)
        case "m" => acc.plusMinutes(n)
        case "s" => acc.plusSeconds(n)
      }
    }
  }

  def parse(yaml: String): GardenerConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](yaml).asScala

    def str(m: collection.Map[String, Object], k: String, dflt: String = ""): String =
      m.get(k).map(_.toString).getOrElse(dflt)
    def bool(m: collection.Map[String, Object], k: String): Boolean =
      m.get(k).exists(_.toString.toBoolean)
    def sub(o: Object): collection.Map[String, Object] = o match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }
      case _ => Map.empty[String, Object]
    }

    val startDate = root.get("start_date").map {
      // snakeyaml auto-parses ISO timestamps into java.util.Date
      case d: java.util.Date => d.toInstant.atZone(ZoneOffset.UTC).toLocalDate
      case v => Instant.parse(v.toString).atZone(ZoneOffset.UTC).toLocalDate
    }.getOrElse(LocalDate.of(2015, 11, 19)) // reference default start

    val trackerTimeout = root.get("tracker").map(sub)
      .flatMap(_.get("timeout")).map(v => parseDuration(v.toString))
      .getOrElse(Duration.ofHours(5))

    val polling = root.get("monitor").map(sub)
      .flatMap(_.get("polling_interval")).map(v => parseDuration(v.toString))
      .getOrElse(Duration.ofMinutes(1))

    // storage-maintenance sweep cadence (compaction / vacuum / log
    // truncation); hourly default — each pass is metadata-only when
    // nothing is fragmented
    val maintenance = root.get("monitor").map(sub)
      .flatMap(_.get("maintenance_interval")).map(v => parseDuration(v.toString))
      .getOrElse(Duration.ofHours(1))

    val sources = root.get("sources").toSeq.flatMap {
      case l: java.util.List[_] => l.asScala.map(o => sub(o.asInstanceOf[Object]))
      case _ => Nil
    }.map { m =>
      val ds = m.get("target_datasets").map(sub).getOrElse(Map.empty[String, Object])
      SourceSpec(
        bucket = str(m, "bucket"),
        experiment = str(m, "experiment"),
        datatype = str(m, "datatype"),
        filter = str(m, "filter"),
        datasets = Datasets(
          tmp = str(ds, "tmp"), raw = str(ds, "raw"), join = str(ds, "join")),
        dailyOnly = bool(m, "daily_only"),
        fullHistory = bool(m, "full_history"))
    }

    // per-datatype dedup keys + opt-in content tiers, e.g.
    //   datatypes:
    //     textlog:
    //       partition_keys: [id, date]
    //       order_key: parser.Time
    //       skewed_keys: false
    //       content_dedup: { text_col: text, min_jaccard_e4: 8000,
    //                        vs_raw_corpus: true }
    val datatypes = root.get("datatypes").map(sub).getOrElse(Map.empty)
      .map { case (dt, o) =>
        val m = sub(o)
        val keys = m.get("partition_keys").toSeq.flatMap {
          case l: java.util.List[_] => l.asScala.map(_.toString)
          case v => Seq(v.toString)
        }
        val cd = m.get("content_dedup").map(sub).map { c =>
          ContentDedupConfig(
            textCol = str(c, "text_col", "text"),
            minJaccardE4 = str(c, "min_jaccard_e4", "8000").toLong,
            vsRawCorpus = bool(c, "vs_raw_corpus"))
        }
        // declarative raw-table governance: a bloom key column for
        // scattered point probes and named CHECK constraints, e.g.
        //   bloom_key: id
        //   checks: { nonempty_id: "id IS NOT NULL" }
        val bloomKey = m.get("bloom_key").map(_.toString)
        val checks = m.get("checks").map(sub).getOrElse(Map.empty)
          .map { case (n, v) => n -> v.toString }.toSeq.sortBy(_._1)
        dt -> DatatypeConfig(
          partitionKeys = if (keys.nonEmpty) keys else Seq("id", "date"),
          orderKey = str(m, "order_key", "parser.Time"),
          skewedKeys = bool(m, "skewed_keys"),
          contentDedup = cd,
          bloomKey = bloomKey,
          checks = checks)
      }.toMap

    GardenerConfig(startDate, trackerTimeout, polling, sources, datatypes,
      maintenance)
  }
}
