package graft.model

import java.time.{Instant, LocalDate, ZoneOffset}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** JSON codecs matching the reference's wire/persisted shapes
  * (tracker/job.go marshalling; tracker/tracker.go:61-65 saverStructV2).
  * Hand-rolled over Jackson's tree model: field names and the state
  * strings (incl. ParseComplete = "postProcessing") must match exactly.
  */
object Codec {
  private val mapper = new ObjectMapper()

  private def dateToJson(d: LocalDate): String =
    d.atStartOfDay(ZoneOffset.UTC).toInstant.toString

  private def dateFromJson(s: String): LocalDate =
    Instant.parse(s).atZone(ZoneOffset.UTC).toLocalDate

  // Go marshals time.Time as an RFC3339 string, with the zero time as
  // "0001-01-01T00:00:00Z" (tracker/job.go Status fields, saverStructV2
  // SaveTime). Our model carries epoch millis; 0 maps to the Go zero time.
  private val GoZeroTime = "0001-01-01T00:00:00Z"

  private def timeToJson(millis: Long): String =
    if (millis == 0L) GoZeroTime else Instant.ofEpochMilli(millis).toString

  private def timeFromJson(n: JsonNode): Long =
    if (n == null || n.isMissingNode) 0L
    else if (n.isNumber) n.asLong(0) // tolerate pre-RFC3339 snapshots
    else {
      val s = n.asText("")
      if (s.isEmpty || s == GoZeroTime) 0L
      else Instant.parse(s).toEpochMilli
    }

  // ---- Job ----

  def jobToNode(j: Job): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("Bucket", j.bucket)
    n.put("Experiment", j.experiment)
    n.put("Datatype", j.datatype)
    n.put("Date", dateToJson(j.date))
    n.put("Filter", j.filter)
    val ds = n.putObject("Datasets")
    ds.put("Tmp", j.datasets.tmp)
    ds.put("Raw", j.datasets.raw)
    ds.put("Join", j.datasets.join)
    n
  }

  def jobFromNode(n: JsonNode): Job = {
    val ds = Option(n.get("Datasets"))
    Job(
      bucket = n.path("Bucket").asText(""),
      experiment = n.path("Experiment").asText(""),
      datatype = n.path("Datatype").asText(""),
      date = dateFromJson(n.path("Date").asText()),
      filter = n.path("Filter").asText(""),
      datasets = ds.map(d => Datasets(
        d.path("Tmp").asText(""), d.path("Raw").asText(""), d.path("Join").asText("")
      )).getOrElse(Datasets.empty))
  }

  def jobToJson(j: Job): String = mapper.writeValueAsString(jobToNode(j))
  def jobFromJson(s: String): Job = jobFromNode(mapper.readTree(s))

  // ---- JobWithTarget (the /v2/job/next response payload) ----

  def jobWithTargetToJson(jt: JobWithTarget): String = {
    val n = mapper.createObjectNode()
    n.put("ID", jt.id)
    n.set[ObjectNode]("Job", jobToNode(jt.job))
    // DailyOnly/FullHistory are scheduling-internal: the reference tags
    // them json:"-" so they never reach the wire (tracker/job.go:54-60)
    mapper.writeValueAsString(n)
  }

  def jobWithTargetFromJson(s: String): JobWithTarget = {
    val n = mapper.readTree(s)
    JobWithTarget(
      id = n.path("ID").asText(""),
      job = jobFromNode(n.get("Job")),
      dailyOnly = n.path("DailyOnly").asBoolean(false),
      fullHistory = n.path("FullHistory").asBoolean(false))
  }

  // ---- Status / StateInfo ----

  def statusToNode(st: Status): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("HeartbeatTime", timeToJson(st.heartbeatTime))
    n.put("UpdateCount", st.updateCount)
    val h = n.putArray("History")
    st.history.foreach { si =>
      val e = h.addObject()
      e.put("State", si.state.name)
      e.put("Start", timeToJson(si.start))
      e.put("DetailTime", timeToJson(si.detailTime))
      e.put("Detail", si.detail)
    }
    n
  }

  def statusFromNode(n: JsonNode): Status = {
    val hist = Option(n.get("History")).map(_.elements().asScala.map { e =>
      StateInfo(
        state = State.parse(e.path("State").asText()),
        start = timeFromJson(e.get("Start")),
        detailTime = timeFromJson(e.get("DetailTime")),
        detail = e.path("Detail").asText(""))
    }.toVector).getOrElse(Vector.empty)
    Status(
      heartbeatTime = timeFromJson(n.get("HeartbeatTime")),
      updateCount = n.path("UpdateCount").asInt(0),
      history = hist)
  }

  // ---- tracker snapshot (saverStructV2 shape) ----

  def snapshotToJson(saveTime: Long, jobs: Map[String, (Job, Status)]): String = {
    val n = mapper.createObjectNode()
    n.put("SaveTime", timeToJson(saveTime))
    val statuses = n.putObject("Statuses")
    val jobsNode = n.putObject("Jobs")
    jobs.foreach { case (key, (job, status)) =>
      statuses.set[ObjectNode](key, statusToNode(status))
      jobsNode.set[ObjectNode](key, jobToNode(job))
    }
    mapper.writeValueAsString(n)
  }

  def snapshotFromJson(s: String): Map[String, (Job, Status)] = {
    val n = mapper.readTree(s)
    val jobsNode = Option(n.get("Jobs")).getOrElse(mapper.createObjectNode())
    val statusesNode = Option(n.get("Statuses")).getOrElse(mapper.createObjectNode())
    jobsNode.properties().asScala.flatMap { e =>
      val job = jobFromNode(e.getValue)
      // jobs with no Tmp dataset are dropped on load (tracker/tracker.go:120-126)
      if (job.datasets.tmp.isEmpty) None
      else {
        val status = Option(statusesNode.get(e.getKey))
          .map(statusFromNode)
          .getOrElse(Status.init(0L))
        Some(e.getKey -> (job, status))
      }
    }.toMap
  }

  // ---- iterator state {"Date": "..."} (job-service/iterators.go:34-45) ----

  def iterStateToJson(d: LocalDate): String = {
    val n = mapper.createObjectNode()
    n.put("Date", dateToJson(d))
    mapper.writeValueAsString(n)
  }

  def iterStateFromJson(s: String): LocalDate =
    dateFromJson(mapper.readTree(s).path("Date").asText())
}
