package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.jobservice.JobService
import graft.model.{Codec, State}
import graft.tracker.Tracker

/** The Jobs HTTP API (reference: tracker/handler.go:32-159) with identical
  * routes, methods, form-encoded params, and status codes:
  *
  *   POST /v2/job/next      → JSON JobWithTarget | 500 when exhausted
  *   POST /v2/job/update    ?id&state&detail → 200 | 422 | 424 | 410
  *   POST /v2/job/heartbeat ?id → 200 | 422 | 410
  *   POST /v2/job/error     ?id&error → 200 | 422 | 424 | 410
  *   GET  /alive, /ready    → 200
  *   GET  /status           → text job table
  *
  * Plus the claim routes this engine adds for cross-PROCESS drivers
  * (the reference keeps claims inside its single monitor process):
  *
  *   POST /v2/claim/take    ?id&owner[&lease_ms] → 200 granted | 409 held
  *   POST /v2/claim/release ?id&owner → 200
  *   POST /v2/claim/park    ?id&owner[&backoff_ms] → 200
  *
  * Non-POST on the job routes → 405; missing id → 422 Unprocessable
  * Entity; missing state/error → 424 Failed Dependency; unknown job →
  * 410 Gone (so parsers drop it). Any state string is accepted, as in the
  * reference (State is a plain string type there).
  */
final class JobsApi(tracker: Tracker, jobService: JobService, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "text/plain"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def formParams(ex: HttpExchange): Map[String, String] = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    (query + "&" + body).split("&").iterator
      .map(_.split("=", 2))
      .collect { case Array(k, v) if k.nonEmpty =>
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
  }

  private def requirePost(ex: HttpExchange)(handle: => Unit): Unit =
    if (ex.getRequestMethod != "POST") respond(ex, 405, "method not allowed")
    else handle

  server.createContext("/v2/job/next", ex => requirePost(ex) {
    jobService.nextJob() match {
      case Some(jt) =>
        tracker.addJob(jt.job) match {
          case Right(_) =>
            respond(ex, 200, Codec.jobWithTargetToJson(jt), "application/json")
          case Left(err) => respond(ex, 500, err)
        }
      case None => respond(ex, 500, "no jobs available")
    }
  })

  server.createContext("/v2/job/update", ex => requirePost(ex) {
    val p = formParams(ex)
    (p.get("id").filter(_.nonEmpty), p.get("state").filter(_.nonEmpty)) match {
      case (None, _) => respond(ex, 422, "id required")
      case (_, None) => respond(ex, 424, "state required")
      case (Some(id), Some(stateName)) =>
        tracker.setStatus(id, State.parse(stateName),
          p.getOrElse("detail", "")) match {
          case Right(_) => respond(ex, 200, "ok")
          case Left(_) => respond(ex, 410, "unknown job")
        }
    }
  })

  server.createContext("/v2/job/heartbeat", ex => requirePost(ex) {
    formParams(ex).get("id").filter(_.nonEmpty) match {
      case Some(id) =>
        tracker.heartbeat(id) match {
          case Right(_) => respond(ex, 200, "ok")
          case Left(_) => respond(ex, 410, "unknown job")
        }
      case None => respond(ex, 422, "id required")
    }
  })

  server.createContext("/v2/job/error", ex => requirePost(ex) {
    val p = formParams(ex)
    (p.get("id").filter(_.nonEmpty), p.get("error").filter(_.nonEmpty)) match {
      case (None, _) => respond(ex, 422, "id required")
      case (_, None) => respond(ex, 424, "error required")
      case (Some(id), Some(err)) =>
        tracker.setJobError(id, err) match {
          case Right(_) => respond(ex, 200, "ok")
          case Left(_) => respond(ex, 410, "unknown job")
        }
    }
  })

  // ---- claim routes: the tracker's leased claims over HTTP, so driver
  // processes that DON'T share this JVM coordinate through the same
  // at-most-one-runner protocol the in-process monitors use (see
  // Tracker.claim — grant/deny is atomic there; these routes only
  // transport it). take → 200 granted / 409 held by an unexpired lease;
  // release and park are owner-fenced no-ops when not held.
  server.createContext("/v2/claim/take", ex => requirePost(ex) {
    val p = formParams(ex)
    (p.get("id").filter(_.nonEmpty), p.get("owner").filter(_.nonEmpty)) match {
      case (None, _) => respond(ex, 422, "id required")
      case (_, None) => respond(ex, 424, "owner required")
      case (Some(id), Some(owner)) =>
        if (!tracker.getState().contains(id)) respond(ex, 410, "unknown job")
        else {
          val lease = p.get("lease_ms").flatMap(_.toLongOption)
            .getOrElse(1800000L)
          if (tracker.claim(id, owner, lease)) respond(ex, 200, "granted")
          else respond(ex, 409, "held")
        }
    }
  })

  server.createContext("/v2/claim/release", ex => requirePost(ex) {
    val p = formParams(ex)
    (p.get("id").filter(_.nonEmpty), p.get("owner").filter(_.nonEmpty)) match {
      case (None, _) => respond(ex, 422, "id required")
      case (_, None) => respond(ex, 424, "owner required")
      case (Some(id), Some(owner)) =>
        tracker.releaseClaim(id, owner); respond(ex, 200, "ok")
    }
  })

  server.createContext("/v2/claim/park", ex => requirePost(ex) {
    val p = formParams(ex)
    (p.get("id").filter(_.nonEmpty), p.get("owner").filter(_.nonEmpty)) match {
      case (None, _) => respond(ex, 422, "id required")
      case (_, None) => respond(ex, 424, "owner required")
      case (Some(id), Some(owner)) =>
        val backoff = p.get("backoff_ms").flatMap(_.toLongOption)
          .getOrElse(120000L)
        tracker.parkClaim(id, owner, backoff); respond(ex, 200, "ok")
    }
  })

  server.createContext("/alive", ex => respond(ex, 200, "ok"))
  server.createContext("/ready", ex => respond(ex, 200, "ok"))

  // Prometheus text exposition (reference: metrics/metrics.go:16-209 via
  // promhttp): counters + time-in-state histogram accumulated by the
  // tracker, in-flight gauges derived from the live JobMap.
  server.createContext("/metrics", ex =>
    respond(ex, 200, PromFormat.render(tracker),
      "text/plain; version=0.0.4; charset=utf-8"))

  // JVM runtime vars (reference: the expvar /debug/vars endpoint the
  // gardener main wires onto the same mux, cmd/gardener/gardener.go:36)
  server.createContext("/debug/vars", ex =>
    respond(ex, 200, DebugVars.render(), "application/json"))

  // HTML job table (reference: cmd/gardener/gardener.go:129-150 Status +
  // tracker/job.go:381-443 WriteHTML): rows ordered by job start time;
  // Init/ParseComplete rows red (the states a healthy pipeline leaves
  // quickly); the reference's os.Environ() dump is deliberately omitted
  // (it leaks credentials-by-env on an unauthenticated port).
  server.createContext("/status", ex => {
    val now = System.currentTimeMillis()
    val fmt = java.time.format.DateTimeFormatter.ofPattern("MM/dd~HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = tracker.getState().toSeq
      .sortBy { case (_, (_, st)) => st.history.headOption.map(_.start).getOrElse(0L) }
      .map { case (key, (_, st)) =>
        val start = st.history.headOption.map(_.start).getOrElse(now)
        val elapsed = java.time.Duration.ofMillis(math.max(0L, now - start))
        val updated = st.history.lastOption.map(_.detailTime).getOrElse(start)
        val stateStyle =
          if (st.state == State.Init || st.state == State.ParseComplete)
            " style=\"color: red;\"" else ""
        val error = if (st.state == State.Failed || st.state == State.ParseError)
          st.detail else ""
        s"""		<tr>
           |			<td> ${esc(key)} </td>
           |			<td> ${elapsed.toHours}h${elapsed.toMinutesPart}m${elapsed.toSecondsPart}s </td>
           |			<td> ${fmt.format(java.time.Instant.ofEpochMilli(updated))} </td>
           |			<td$stateStyle> ${esc(st.state.name)} </td>
           |			<td> ${esc(st.detail)} </td>
           |			<td> ${st.updateCount} </td>
           |			<td> ${esc(error)} </td>
           |		</tr>""".stripMargin
      }
    val body =
      s"""<html><body>
         |	<h1>Jobs</h1>
         |	<style>
         |	table, th, td {
         |	  border: 2px solid black;
         |	}
         |	</style>
         |	<table style="width:100%">
         |		<tr>
         |			<th> Job </th>
         |			<th> Elapsed </th>
         |			<th> Update Time </th>
         |			<th> State </th>
         |			<th> Detail </th>
         |			<th> Updates </th>
         |			<th> Error </th>
         |		</tr>
         |${rows.mkString("\n")}
         |	</table>
         |	<br>jobs=${rows.size} failed=${tracker.numFailed} completed=${tracker.completed}
         |</body></html>
         |""".stripMargin
    respond(ex, 200, body, "text/html; charset=utf-8")
  })

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}
