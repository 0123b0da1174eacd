package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.model.{Codec, JobWithTarget, State}

/** Thin parser-side client for the Jobs API (reference:
  * client/v2/client.go:29-76): form-encoded POSTs against
  * `/v2/job/{next,update,heartbeat,error}`, mapping the reference's
  * status-code contract back to typed results.
  *
  *  - next():      200 → JobWithTarget; 500 → NoWork (the server's
  *                 "no jobs available"); anything else → error
  *  - update/heartbeat/error: 200 → ok; 410 Gone → JobGone (parser should
  *    drop the job); other codes → error with the body text
  */
final class JobsClient(baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) {

  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  import JobsClient.{Error, Result}

  // instance aliases so call sites can keep writing client.Ok etc.
  val Ok: JobsClient.Ok.type = JobsClient.Ok
  val JobGone: JobsClient.JobGone.type = JobsClient.JobGone
  val NoWork: JobsClient.NoWork.type = JobsClient.NoWork

  private def post(path: String, params: Map[String, String]): (Int, String) = {
    val form = params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Pull the next work unit. */
  def next(): Either[Result, JobWithTarget] = post("/v2/job/next", Map.empty) match {
    case (200, body) => Right(Codec.jobWithTargetFromJson(body))
    case (500, _) => Left(NoWork)
    case (code, body) => Left(Error(code, body))
  }

  /** Report a state transition (e.g. State.ParseComplete to hand the job
    * to the post-processing monitor).
    */
  def update(id: String, state: State, detail: String = ""): Result =
    post("/v2/job/update",
      Map("id" -> id, "state" -> state.name, "detail" -> detail)) match {
      case (200, _) => Ok
      case (410, _) => JobGone
      case (code, body) => Error(code, body)
    }

  def heartbeat(id: String): Result =
    post("/v2/job/heartbeat", Map("id" -> id)) match {
      case (200, _) => Ok
      case (410, _) => JobGone
      case (code, body) => Error(code, body)
    }

  /** Report a parse failure (server moves the job to ParseError). */
  def error(id: String, message: String): Result =
    post("/v2/job/error", Map("id" -> id, "error" -> message)) match {
      case (200, _) => Ok
      case (410, _) => JobGone
      case (code, body) => Error(code, body)
    }
}

object JobsClient {
  /** Typed call results (top-level: a class-nested ADT captures an outer
    * reference that pattern matches can't check at run time).
    */
  sealed trait Result
  case object Ok extends Result
  case object JobGone extends Result
  case object NoWork extends Result
  final case class Error(code: Int, body: String) extends Result
}
