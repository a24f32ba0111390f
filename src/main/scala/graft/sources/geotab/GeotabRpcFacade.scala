package graft.sources.geotab

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Local HTTP facade speaking the Geotab JSON-RPC wire protocol
  * (`POST <base>/apiv1`, `{method, params}` request bodies, `result` /
  * in-band `error` responses — the surface the reference hits at
  * task.ts:326-355 Authenticate and task.ts:148-218 Get) over any
  * [[GeotabClient]].
  *
  * Purpose: the environment is offline, so the production transport
  * ([[HttpGeotabClient]]) cannot be gated against the real API. Fronting
  * the fixture-backed [[InMemoryGeotabClient]] with this facade closes
  * that gap END-TO-END: the g18 correctness gate runs the flagship
  * pipeline through `option("client", "http://127.0.0.1:<port>")` — the
  * URL fallback in [[GeotabClients.apply]], i.e. the exact resolution
  * path a production deployment uses — so login, the validate-on-use
  * session probe, typed search payloads, retry/backoff, and FAILFAST
  * deserialize all execute over real HTTP inside the DuckDB oracle gate.
  *
  * Delegation keeps the semantics single-sourced: search payloads are
  * decoded back to the client-API shape (`isDriver`/
  * `excludeUntrackedAssets` booleans, `groups:[{id}]` → one shard id) and
  * passed to the inner client, whose server-side filter semantics the
  * connector specs already pin. Typed inner failures map back to the
  * wire: session expiry → the in-band `InvalidUserException` error body
  * (what [[HttpGeotabClient.parseChecked]] re-types), transient → HTTP
  * 503 (what the rpc retry loop backs off on).
  *
  * [[failNextRequests]] plants HTTP 503s ahead of the delegation, so a
  * gate can prove the transport's retry path on every run (the g09
  * submit-sink treatment applied to the source side).
  */
class GeotabRpcFacade(inner: GeotabClient) {

  val requests = new AtomicInteger(0)
  val served503 = new AtomicInteger(0)
  private val failNext = new AtomicInteger(0)

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** The next `n` requests (regardless of method) answer 503, exercising
    * the client's bounded-retry/backoff discipline. */
  def failNextRequests(n: Int): Unit = failNext.set(n)

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // a handful of worker threads: the three entity scans (and their
    // session probes) arrive concurrently from parallel Spark tasks
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.createContext("/apiv1", (x: HttpExchange) => handle(x))
    server.start()
  }

  def stop(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ =>
    }
  }

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(status, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def errorBody(name: String, message: String): String = {
    val root = mapper.createObjectNode()
    val err = root.putObject("error").putArray("errors").addObject()
    err.put("name", name)
    err.put("message", message)
    root.toString
  }

  /** Wire search object → the [[GeotabClient.get]] search map (the inverse
    * of [[HttpGeotabClient.get]]'s re-typing: booleans back to "true"/
    * "false" strings, `groups:[{id}]` back to the single shard id). */
  private def decodeSearch(node: JsonNode): Map[String, String] = {
    if (node == null || !node.isObject) return Map.empty
    val b = Map.newBuilder[String, String]
    node.properties().forEach { e =>
      val v = e.getValue
      val s =
        if (e.getKey == "groups" && v.isArray && v.size > 0)
          v.get(0).path("id").asText
        else if (v.isBoolean) String.valueOf(v.asBoolean)
        else v.asText
      b += e.getKey -> s
    }
    b.result()
  }

  /** Error response that never throws on a committed exchange: if a
    * handler failed AFTER respond() sent headers (e.g. the client
    * disconnected mid-write), a second sendResponseHeaders would raise
    * IllegalStateException and leak the exchange — check the committed
    * marker (getResponseCode == -1 until headers go out) and swallow
    * late I/O failures; the finally in handle() closes the exchange. */
  private def respondIfUncommitted(x: HttpExchange, status: Int, body: String): Unit =
    if (x.getResponseCode == -1) {
      try respond(x, status, body)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  private def handle(x: HttpExchange): Unit = try {
    requests.incrementAndGet()
    val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      served503.incrementAndGet()
      respond(x, 503, """{"error":{"errors":[{"name":"Transient","message":"planted"}]}}""")
      return
    }
    val req = mapper.readTree(body)
    val params = req.path("params")
    req.path("method").asText match {
      case "Authenticate" =>
        val c = inner.authenticate(
          params.path("database").asText, params.path("userName").asText,
          params.path("password").asText)
        val root = mapper.createObjectNode()
        val creds = root.putObject("result").putObject("credentials")
        creds.put("database", c.database)
        creds.put("sessionId", c.sessionId)
        creds.put("userName", c.userName)
        respond(x, 200, root.toString)
      case "Get" =>
        val cn = params.path("credentials")
        val creds = GeotabCredentials(
          cn.path("database").asText, cn.path("sessionId").asText,
          cn.path("userName").asText)
        val rows = inner.get(params.path("typeName").asText,
          decodeSearch(params.get("search")), creds)
        respond(x, 200, rows.mkString("""{"result":[""", ",", "]}"))
      case other =>
        respond(x, 400, errorBody("UnknownMethod", other))
    }
  } catch {
    case e: GeotabSessionExpiredException =>
      respondIfUncommitted(x, 200, errorBody("InvalidUserException", e.getMessage))
    case e: GeotabTransientException =>
      respondIfUncommitted(x, 503, errorBody("Transient", e.getMessage))
    case e: Throwable =>
      respondIfUncommitted(x, 400,
        errorBody(e.getClass.getSimpleName, String.valueOf(e.getMessage)))
  } finally x.close()
}
