package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Duration, Instant, LocalDate}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.JobsApi
import graft.jobservice._
import graft.model._
import graft.persistence.MemorySaver
import graft.tracker.Tracker

/** Full HTTP round trip against the Jobs API over a real socket (port of
  * tracker/handler_test.go + client/v2 intents): routes, codes, payloads.
  */
class JobsApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val now = Instant.parse("2024-06-01T12:00:00Z")
  private val saver = new MemorySaver
  private val tracker = new Tracker(saver, clock = () => now.toEpochMilli)
  private val spec = SourceSpec("bkt", "ndt", "ndt7",
    datasets = Datasets("tmp_ndt", "raw_ndt", "ndt"), dailyOnly = true)
  private val service = new JobService(
    new JobIterator(new DailyIterator(saver, delay = Duration.ofHours(10),
      clock = () => now), Seq(spec)),
    new JobIterator(new HistoricalIterator(saver, LocalDate.parse("2024-05-30"),
      saverName = "hist", clock = () => now), Seq.empty),
    1, _ => true, clock = () => now)
  private val api = new JobsApi(tracker, service)
  private var port: Int = 0
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = { port = api.start() }
  override def afterAll(): Unit = api.stop()

  private def post(path: String, form: String = ""): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /v2/job/next returns a JobWithTarget and registers it") {
    val resp = post("/v2/job/next")
    assert(resp.statusCode() == 200)
    val jt = Codec.jobWithTargetFromJson(resp.body())
    assert(jt.job.datatype == "ndt7")
    assert(jt.job.date == LocalDate.parse("2024-05-31"))
    // scheduling flags are json:"-" in the reference — never on the wire
    assert(!resp.body().contains("DailyOnly"))
    assert(jt.job.datasets == Datasets("tmp_ndt", "raw_ndt", "ndt"))
    assert(tracker.getState().contains(jt.job.key))
  }

  test("update/heartbeat/error round trip with reference status codes") {
    val key = tracker.getState().keys.head
    // method not allowed
    assert(get("/v2/job/update").statusCode() == 405)
    // missing id → 422 Unprocessable Entity (reference tracker/handler.go)
    assert(post("/v2/job/update").statusCode() == 422)
    assert(post("/v2/job/update", "state=parsing").statusCode() == 422)
    // missing state → 424 Failed Dependency
    assert(post("/v2/job/update", s"id=$key").statusCode() == 424)
    assert(post("/v2/job/heartbeat").statusCode() == 422)
    assert(post("/v2/job/error", s"id=$key").statusCode() == 424)
    // any state string is accepted (State is a plain string in the reference)
    assert(post("/v2/job/update", s"id=$key&state=nonsense").statusCode() == 200)
    assert(tracker.getState()(key)._2.state.name == "nonsense")
    // happy path: parsing → postProcessing with detail
    assert(post("/v2/job/update", s"id=$key&state=parsing&detail=50%25").statusCode() == 200)
    assert(tracker.getState()(key)._2.state == State.Parsing)
    assert(tracker.getState()(key)._2.detail == "50%")
    assert(post("/v2/job/update", s"id=$key&state=postProcessing").statusCode() == 200)
    assert(tracker.getState()(key)._2.state == State.ParseComplete)
    // heartbeat
    assert(post("/v2/job/heartbeat", s"id=$key").statusCode() == 200)
    // unknown job → 410 Gone
    assert(post("/v2/job/heartbeat", "id=nope").statusCode() == 410)
    assert(post("/v2/job/update", "id=nope&state=parsing").statusCode() == 410)
    // error route → ParseError
    assert(post("/v2/job/error", s"id=$key&error=corrupt+archive").statusCode() == 200)
    assert(tracker.getState()(key)._2.state == State.ParseError)
    assert(post("/v2/job/error", "id=nope&error=x").statusCode() == 410)
  }

  test("next returns 500 when no work is available") {
    // daily already consumed; historical iterator empty
    val resp = post("/v2/job/next")
    assert(resp.statusCode() == 500)
  }

  test("health and status endpoints") {
    assert(get("/alive").statusCode() == 200)
    assert(get("/ready").statusCode() == 200)
    // HTML job table (reference: tracker/job.go:381-443 WriteHTML)
    val st = get("/status")
    assert(st.statusCode() == 200)
    val html = st.body()
    assert(html.contains("<table"))
    assert(html.contains("<th> Job </th>"))
    assert(html.contains("bkt/ndt/ndt7/20240531"))
    // ParseError is not a red-highlighted state (only Init/ParseComplete)
    assert(!html.contains("color: red"))
    assert(html.contains("jobs=1"))
    // Prometheus text exposition (reference: metrics/metrics.go via promhttp)
    val m = get("/metrics")
    assert(m.statusCode() == 200)
    assert(m.body().contains("# TYPE gardener_tasks_in_flight gauge"))
    assert(m.body().contains("gardener_started_total"))
    // JVM runtime vars (reference: expvar /debug/vars,
    // cmd/gardener/gardener.go:36) — valid JSON with live readings
    val dv = get("/debug/vars")
    assert(dv.statusCode() == 200)
    assert(dv.headers().firstValue("Content-Type").orElse("")
      .startsWith("application/json"))
    val body = dv.body()
    for (k <- Seq("\"memstats\"", "\"heap_used\"", "\"gc\"", "\"threads\"",
        "\"uptime_ms\"", "\"processors\""))
      assert(body.contains(k), s"missing $k in $body")
    assert("\"heap_used\":(\\d+)".r.findFirstMatchIn(body)
      .exists(_.group(1).toLong > 0), "heap reading must be live")
  }

  test("load-stats and query-cost families render with reference buckets") {
    val job = tracker.getState().values.head._1
    // observed by the load action / the monitor in production wiring
    // (Gardener.main / Monitor.applyAction); fed directly here
    tracker.observeLoadStats(job, files = 120L, bytes = 3_500_000_000L)
    tracker.observeQueryCost(job.datatype, "deduplicating", 42.0)
    val m = get("/metrics").body()
    assert(m.contains("# TYPE gardener_files histogram"))
    assert(m.contains("# TYPE gardener_bytes histogram"))
    assert(m.contains("# TYPE query_cost_seconds histogram"))
    val base = """{experiment="ndt",datatype="ndt7",date="2024""""
    // observation lands in the right reference-ladder bucket…
    assert(m.contains(s"""gardener_files_bucket${base},le="120"} 1"""))
    assert(m.contains(s"""gardener_bytes_bucket${base},le="4000000000"} 1"""))
    assert(m.contains(
      """query_cost_seconds_bucket{datatype="ndt7",query="deduplicating",le="46.4"} 1"""))
    // …below the preceding bound…
    assert(m.contains(s"""gardener_files_bucket${base},le="100"} 0"""))
    assert(m.contains(s"""gardener_bytes_bucket${base},le="2800000000"} 0"""))
    assert(m.contains(
      """query_cost_seconds_bucket{datatype="ndt7",query="deduplicating",le="21.5"} 0"""))
    // …and the reference ladders' top bounds are all present
    // (metrics/metrics.go:152-209: 900k files, 80 GB, 4.64e7 s)
    assert(m.contains(s"""gardener_files_bucket${base},le="900000"} 1"""))
    assert(m.contains(s"""gardener_bytes_bucket${base},le="80000000000"} 1"""))
    assert(m.contains(
      """query_cost_seconds_bucket{datatype="ndt7",query="deduplicating",le="46400000"} 1"""))
    assert(m.contains(s"""gardener_files_count${base}} 1"""))
    assert(m.contains(s"""gardener_bytes_sum${base}} 3500000000"""))
  }

  test("JobsClient: typed round trip against the live server") {
    val c = new graft.api.JobsClient(s"http://localhost:$port")
    // work already exhausted by earlier tests => NoWork, not an error
    assert(c.next() == Left(c.NoWork))
    val id = tracker.getState().keys.head
    assert(c.heartbeat(id) == c.Ok)
    assert(c.update(id, State.Parsing, "via client") == c.Ok)
    assert(tracker.getState()(id)._2.state == State.Parsing)
    assert(c.update("bkt/none/x/20240101", State.Parsing) == c.JobGone)
    assert(c.heartbeat("bkt/none/x/20240101") == c.JobGone)
    assert(c.error(id, "boom") == c.Ok)
    assert(tracker.getState()(id)._2.state == State.ParseError)
  }

  test("claim routes: cross-process drivers coordinate leases over HTTP") {
    val j = Job("bkt", "ndt", "ndt7", LocalDate.parse("2024-04-01"),
      datasets = Datasets("t", "r", ""))
    assert(tracker.addJob(j).isRight)
    val id = java.net.URLEncoder.encode(j.key, "UTF-8")
    // grant, then deny while held
    assert(post("/v2/claim/take", s"id=$id&owner=a&lease_ms=60000")
      .statusCode() == 200)
    assert(post("/v2/claim/take", s"id=$id&owner=b").statusCode() == 409)
    // release is owner-fenced: b cannot free a's lease
    assert(post("/v2/claim/release", s"id=$id&owner=b").statusCode() == 200)
    assert(post("/v2/claim/take", s"id=$id&owner=b").statusCode() == 409)
    // park keeps everyone (owner included) out for the backoff
    assert(post("/v2/claim/park", s"id=$id&owner=a&backoff_ms=60000")
      .statusCode() == 200)
    assert(post("/v2/claim/take", s"id=$id&owner=a").statusCode() == 409)
    // the holder's release frees it for another driver
    assert(post("/v2/claim/release", s"id=$id&owner=a").statusCode() == 200)
    assert(post("/v2/claim/take", s"id=$id&owner=b").statusCode() == 200)
    // hygiene mirrors the job routes: 410 unknown, 422/424 params
    assert(post("/v2/claim/take", "id=nope&owner=x").statusCode() == 410)
    assert(post("/v2/claim/take", "owner=x").statusCode() == 422)
    assert(post("/v2/claim/take", s"id=$id").statusCode() == 424)
  }
}
