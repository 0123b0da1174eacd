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

  server.createContext("/alive", ex => respond(ex, 200, "ok"))
  server.createContext("/ready", ex => respond(ex, 200, "ok"))

  // expvar-style JSON metrics (the reference exports Prometheus families,
  // metrics/metrics.go:16-209; same observables, JSON transport)
  server.createContext("/metrics", ex => {
    val state = tracker.getState()
    val byState = state.values.groupBy(_._2.state.name).map {
      case (s, js) => s""""$s":${js.size}"""
    }.mkString(",")
    val updates = state.values.map(_._2.updateCount.toLong).sum
    respond(ex, 200,
      s"""{"jobs":${state.size},"failed":${tracker.numFailed},""" +
        s""""completed":${tracker.completed},"updates":$updates,""" +
        s""""jobs_by_state":{$byState}}""",
      "application/json")
  })

  server.createContext("/status", ex => {
    val rows = tracker.getState().toSeq
      .sortBy { case (_, (_, st)) => st.history.headOption.map(_.start).getOrElse(0L) }
      .map { case (key, (_, st)) =>
        s"$key\t${st.state}\t${st.detail}\tupdates=${st.updateCount}"
      }
    respond(ex, 200,
      s"jobs=${rows.size} failed=${tracker.numFailed} completed=${tracker.completed}\n" +
        rows.mkString("\n"))
  })

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}
