package graft.sources.geotab

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Production JSON-RPC HTTP implementation of [[GeotabClient]] — the last
  * transport gap between the connector stack and the reference's live API
  * (task.ts:326-355 Authenticate, :301-324 cached-session probe, :148-218
  * entity scans, all `POST <api>/apiv1` with a `{method, params}` body).
  *
  * Protocol fidelity (studied from the reference, not copied):
  *  - `authenticate` POSTs `Authenticate` with (database, userName,
  *    password) and reads `result.credentials` (task.ts:326-355);
  *  - `validateSession` replays the reference's cheap probe — `Get User`
  *    searched by the cached session's own userName (task.ts:301-324,
  *    "the Login endpoint is rightfully rate limited... using this to
  *    test cached credentials") — false exactly when the server rejects
  *    the session, so [[GeotabSessionCache]]'s validate-on-use works
  *    unchanged over HTTP;
  *  - `get` POSTs `Get` with `{credentials, typeName, search?}`; search
  *    values re-type onto the wire the way the reference sends them —
  *    `isDriver`/`excludeUntrackedAssets` as JSON booleans
  *    (task.ts:175-177, :194) and a pushed group shard as
  *    `groups: [{id}]` (task.ts:198-202); each result element returns as
  *    its raw JSON text, so the DSv2 reader's FAILFAST deserialize (the
  *    `req.typed()` analogue) stays the single schema gate.
  *
  * Failure discipline (the [[graft.streaming.HttpFeatureSink]] rules on
  * the ingest side): transport errors and 5xx retry under exponential
  * backoff and surface as [[GeotabTransientException]] when exhausted
  * (the reader retries those with the SAME session); a JSON-RPC error
  * naming an invalid/expired session surfaces as
  * [[GeotabSessionExpiredException]] (the reader re-resolves credentials
  * through the cache, which re-logins); any other rejection throws — a
  * payload the server rejected can't succeed by resending.
  *
  * Cluster shape: instances construct deterministically from the API URL
  * (see [[GeotabClients.apply]]'s URL fallback), so every executor JVM
  * resolves its own client from the scan properties — nothing about the
  * transport is serialized in the plan. One `HttpClient` per client
  * instance per JVM; sessions flow through [[GeotabSessionCache]] exactly
  * as with the fixture client.
  *
  * Cannot be integration-tested against the real API in this offline
  * environment; [[graft.sources.geotab.HttpGeotabClientSpec]] drives the
  * full connector stack against a local stub server speaking the same
  * protocol.
  */
class HttpGeotabClient(
    apiBase: String,
    maxRetries: Int = 3,
    backoffMs: Long = 100,
    connectTimeout: Duration = Duration.ofSeconds(10),
    // Per-REQUEST deadline (r15 ADVICE): connectTimeout alone lets a
    // server that accepts the connection but never responds pin the Spark
    // task thread forever, bypassing the bounded-retry discipline. An
    // HttpTimeoutException is an IOException, so an expired deadline
    // flows through the same retry/backoff path as any transport error.
    requestTimeout: Duration = Duration.ofSeconds(60),
    // 2xx body size cap: a response this large is not a fleet scan, it is
    // a misbehaving endpoint — and resending cannot shrink it, so it
    // fails fast and typed instead of OOMing the executor on readTree.
    maxResponseChars: Int = 64 * 1024 * 1024) extends GeotabClient {

  private val endpoint = URI.create(apiBase.stripSuffix("/") + "/apiv1")

  @transient private lazy val http =
    HttpClient.newBuilder().connectTimeout(connectTimeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def authenticate(database: String, userName: String,
                            password: String): GeotabCredentials = {
    val params = mapper.createObjectNode()
    params.put("database", database)
    params.put("userName", userName)
    params.put("password", password)
    val creds = rpc("Authenticate", params).path("result").path("credentials")
    require(creds.hasNonNull("sessionId"),
      s"Authenticate returned no credentials.sessionId: $creds")
    GeotabCredentials(
      database = Option(creds.get("database")).map(_.asText).getOrElse(database),
      sessionId = creds.get("sessionId").asText,
      userName = Option(creds.get("userName")).map(_.asText).getOrElse(userName))
  }

  override def validateSession(c: GeotabCredentials): Boolean =
    try { get("User", Map("name" -> c.userName), c); true }
    catch { case _: GeotabSessionExpiredException => false }

  override def get(typeName: String, search: Map[String, String],
                   credentials: GeotabCredentials): Seq[String] = {
    val params = mapper.createObjectNode()
    val cred = params.putObject("credentials")
    cred.put("database", credentials.database)
    cred.put("sessionId", credentials.sessionId)
    cred.put("userName", credentials.userName)
    params.put("typeName", typeName)
    if (search.nonEmpty) {
      val s = params.putObject("search")
      search.foreach {
        case ("groups", g) => s.putArray("groups").addObject().put("id", g)
        case (k, "true")   => s.put(k, true)
        case (k, "false")  => s.put(k, false)
        case (k, v)        => s.put(k, v)
      }
    }
    val result = rpc("Get", params).path("result")
    require(result.isArray, s"Get $typeName returned a non-array result: $result")
    (0 until result.size).map(i => result.get(i).toString)
  }

  /** Poll-time snapshot version: every trigger sees a new snapshot, like
    * the reference's scheduled Lambda run (each invocation re-fetches). */
  override def dataVersion: Long = System.currentTimeMillis()

  /** One JSON-RPC call with the sink's bounded-retry discipline. */
  private def rpc(method: String, params: ObjectNode): JsonNode = {
    val body = mapper.createObjectNode()
    body.put("method", method)
    body.set[ObjectNode]("params", params)
    val req = HttpRequest.newBuilder(endpoint)
      .timeout(requestTimeout)
      .header("Accept", "application/json")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    var attempt = 0
    while (true) {
      attempt += 1
      val status =
        try {
          val rsp = http.send(req, HttpResponse.BodyHandlers.ofString())
          if (rsp.statusCode() / 100 == 2) return parseChecked(rsp.body())
          else if (rsp.statusCode() / 100 == 5) rsp.statusCode()
          else throw new RuntimeException(
            s"geotab api: $endpoint rejected $method with " +
              s"${rsp.statusCode()}: ${rsp.body()}")
        } catch {
          // IOException covers transport failures, the per-request
          // deadline (HttpTimeoutException), AND our malformed-2xx-body
          // rethrow below — all retry, all exhaust typed.
          case e: java.io.IOException =>
            if (attempt > maxRetries) throw new GeotabTransientException(
              s"geotab api: $endpoint unreachable after $maxRetries retries: $e")
            -1
        }
      if (attempt > maxRetries)
        throw new GeotabTransientException(
          s"geotab api: $endpoint still failing ($status) after $maxRetries retries")
      Thread.sleep(backoffMs << (attempt - 1))
    }
    throw new IllegalStateException("unreachable")
  }

  /** Parses a 2xx body and maps the API's in-band `error` object: an
    * invalid/expired session becomes the typed exception the reader's
    * recovery path re-authenticates on; anything else fails fast.
    *
    * Protocol garbage discipline (r15 advice): a 200 whose body is not a
    * JSON object — malformed, truncated mid-stream, or plain non-JSON
    * text from a proxy error page — is rethrown as a clean IOException so
    * the rpc() loop retries it like any transport flake and exhausts to
    * [[GeotabTransientException]]; a Jackson stack trace never escapes an
    * executor. An oversized body fails fast as
    * [[GeotabProtocolException]] BEFORE parsing: resending cannot shrink
    * it, and readTree on it would balloon executor heap. */
  private def parseChecked(body: String): JsonNode = {
    if (body.length > maxResponseChars)
      throw new GeotabProtocolException(
        s"geotab api: $endpoint returned a ${body.length}-char body " +
          s"(cap $maxResponseChars) — refusing to parse; narrow the scan " +
          "or raise maxResponseChars")
    val node =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new java.io.IOException(
            s"geotab api: $endpoint returned a malformed JSON-RPC body " +
              s"(${e.getOriginalMessage}); first 200 chars: " +
              body.take(200))
      }
    if (node == null || !node.isObject)
      throw new java.io.IOException(
        s"geotab api: $endpoint returned a non-object JSON-RPC body; " +
          s"first 200 chars: ${body.take(200)}")
    val err = node.get("error")
    if (err != null && !err.isNull) {
      val text = err.toString
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      if (lower.contains("invaliduser") || lower.contains("sessionexpired") ||
          lower.contains("session expired"))
        throw new GeotabSessionExpiredException(s"geotab api: $text")
      throw new RuntimeException(s"geotab api error: $text")
    }
    node
  }
}
