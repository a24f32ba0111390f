package graft.sources.geotab

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Drives [[HttpGeotabClient]] — and the whole DSv2 connector stack over
  * it — against a local stub server speaking the reference's JSON-RPC
  * protocol (`POST /apiv1`, `{method, params}`, `result`/in-band `error`
  * bodies). The real API is unreachable from this environment; the stub
  * pins the wire format (typed search payload, credentials echo), the
  * retry/backoff discipline, and both recovery paths (503-transient,
  * expired-session re-login). */
class HttpGeotabClientSpec extends SparkSpec {

  /** Minimal reference-protocol stub: Authenticate issues sessions, Get
    * validates them and serves canned entities; counters + captured
    * bodies let tests assert the wire behavior. */
  private class StubApi {
    val logins = new AtomicInteger(0)
    val getBodies = new CopyOnWriteArrayList[String]()
    val failNextWith = new AtomicInteger(0) // HTTP status to fail once with
    // raw 200-body override for the next N requests (protocol-garbage
    // cases: malformed/truncated JSON, HTML error pages, scalar bodies)
    val garbageBody = new java.util.concurrent.atomic.AtomicReference[String](null)
    val garbageCount = new AtomicInteger(0)
    val hangRequests = new AtomicInteger(0) // accept, then never answer in time
    @volatile var validSessions = Set.empty[String]

    private var server: HttpServer = _
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

    def start(): Unit = {
      server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/apiv1", (x: HttpExchange) => handle(x))
      server.start()
    }
    def stop(): Unit = server.stop(0)

    private def respond(x: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(status, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    }

    private def handle(x: HttpExchange): Unit = try {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (hangRequests.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        Thread.sleep(1500) // longer than the test client's request timeout
        respond(x, 200, "{}")
        return
      }
      if (garbageCount.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        respond(x, 200, garbageBody.get())
        return
      }
      val fail = failNextWith.getAndSet(0)
      if (fail != 0) { respond(x, fail, """{"oops":true}"""); return }
      if (body.contains(""""method":"Authenticate"""")) {
        val sid = s"sess-${logins.incrementAndGet()}"
        validSessions += sid
        respond(x, 200,
          s"""{"result":{"credentials":{"database":"db1","sessionId":"$sid","userName":"u@x"}}}""")
      } else if (body.contains(""""method":"Get"""")) {
        getBodies.add(body)
        val sid = """"sessionId":"([^"]+)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        if (!validSessions.contains(sid)) {
          respond(x, 200,
            """{"error":{"errors":[{"name":"InvalidUserException","message":"session expired"}]}}""")
        } else if (body.contains(""""typeName":"User"""")) {
          // name-probe (validate-on-use) and isDriver scans share this
          respond(x, 200,
            """{"result":[{"id":"u1","name":"Driver One","isDriver":true}]}""")
        } else if (body.contains(""""typeName":"DeviceStatusInfo"""")) {
          respond(x, 200,
            """{"result":[{"device":{"id":"d1"},"driver":{"id":"u1"},""" +
              """"latitude":1.5,"longitude":2.5,"speed":36.0,""" +
              """"dateTime":"2026-08-15T00:00:00.000Z","isDeviceCommunicating":true}]}""")
        } else if (body.contains(""""typeName":"Device"""")) {
          respond(x, 200,
            """{"result":[{"id":"d1","name":"Truck 1","serialNumber":"SN1","group":"g1"}]}""")
        } else respond(x, 400, """{"error":{"errors":[{"name":"UnknownType"}]}}""")
      } else respond(x, 400, """{"error":{"errors":[{"name":"UnknownMethod"}]}}""")
    } catch { case e: Throwable => respond(x, 500, s"""{"crash":"$e"}""") }
  }

  private def withStub(body: StubApi => Unit): Unit = {
    val stub = new StubApi
    stub.start()
    try body(stub) finally stub.stop()
  }

  test("authenticate parses result.credentials; get round-trips raw rows") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, backoffMs = 1)
      val creds = c.authenticate("db1", "u@x", "pw")
      assert(creds.sessionId === "sess-1" && creds.database === "db1")
      val rows = c.get("Device", Map("excludeUntrackedAssets" -> "true"), creds)
      assert(rows.length === 1 && rows.head.contains("\"id\":\"d1\""))
    }
  }

  test("search payload re-types onto the wire: booleans and groups:[{id}]") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, backoffMs = 1)
      val creds = c.authenticate("db1", "u@x", "pw")
      c.get("User", Map("isDriver" -> "true"), creds)
      c.get("Device", Map("excludeUntrackedAssets" -> "true", "groups" -> "g1"), creds)
      val bodies = stub.getBodies.toArray.map(_.toString)
      assert(bodies.exists(_.contains(""""isDriver":true""")),
        s"isDriver must be a JSON boolean: ${bodies.mkString("\n")}")
      assert(bodies.exists(_.contains(""""groups":[{"id":"g1"}]""")),
        s"groups must be the reference's [{id}] array: ${bodies.mkString("\n")}")
    }
  }

  test("5xx retries with backoff; 4xx fails fast; exhausted retries are transient") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, maxRetries = 3, backoffMs = 1)
      val creds = c.authenticate("db1", "u@x", "pw")
      stub.failNextWith.set(503) // one 503, then success -> must recover
      assert(c.get("Device", Map.empty, creds).nonEmpty)
      val e = intercept[RuntimeException] {
        stub.failNextWith.set(400)
        c.get("Device", Map.empty, creds)
      }
      assert(e.getMessage.contains("rejected"), e.getMessage)
      assert(!e.isInstanceOf[GeotabTransientException])
    }
  }

  test("protocol garbage on 200 retries typed and recovers; never a Jackson trace") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, maxRetries = 2, backoffMs = 1)
      val creds = c.authenticate("db1", "u@x", "pw")
      // each garbage shape, sustained past the retry budget, must exhaust
      // to GeotabTransientException with a protocol message — not a
      // JsonParseException stack from inside the executor
      for (garbage <- Seq(
          """{"result":[{"id":"d1""",            // truncated mid-object
          "<html><body>502 Bad Gateway</body>",  // proxy error page as 200
          "\"just a string\"",                   // valid JSON, non-object
          "")) {                                  // empty body
        stub.garbageBody.set(garbage)
        stub.garbageCount.set(10)
        val e = intercept[GeotabTransientException] {
          c.get("Device", Map.empty, creds)
        }
        assert(e.getMessage.contains("malformed") ||
          e.getMessage.contains("non-object"),
          s"garbage '$garbage' must surface a protocol message: ${e.getMessage}")
        stub.garbageCount.set(0)
      }
      // one garbage body then a clean one: the retry path must recover
      stub.garbageBody.set("""{"result":[{"id":""")
      stub.garbageCount.set(1)
      assert(c.get("Device", Map.empty, creds).nonEmpty,
        "a single malformed body must be retried through to success")
    }
  }

  test("an oversized 2xx body fails fast and typed, without parsing") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, maxRetries = 3, backoffMs = 1,
        maxResponseChars = 50)
      val e = intercept[GeotabProtocolException] {
        c.authenticate("db1", "u@x", "pw") // the stub's creds body > 50 chars
      }
      assert(e.getMessage.contains("cap 50"), e.getMessage)
    }
  }

  test("a server that accepts but never responds hits the request deadline, not forever") {
    withStub { stub =>
      val c = new HttpGeotabClient(stub.url, maxRetries = 1, backoffMs = 1,
        requestTimeout = java.time.Duration.ofMillis(200))
      val creds = c.authenticate("db1", "u@x", "pw")
      stub.hangRequests.set(10) // every attempt hangs past the deadline
      val t0 = System.nanoTime()
      val e = intercept[GeotabTransientException] {
        c.get("Device", Map.empty, creds)
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(e.getMessage.contains("unreachable"), e.getMessage)
      assert(elapsedMs < 5000,
        s"the per-request deadline must bound the wait: took ${elapsedMs}ms")
      stub.hangRequests.set(0)
    }
  }

  test("expired session surfaces typed; validate-on-use re-logins exactly once") {
    withStub { stub =>
      GeotabSessionCache.clear()
      val name = stub.url // URL-name resolution constructs the HTTP client
      val creds = GeotabSessionCache.credentials(name, "db1", "u@x", "pw")
      assert(stub.logins.get() === 1)
      // cache hit: the cheap probe validates, no second login
      GeotabSessionCache.credentials(name, "db1", "u@x", "pw")
      assert(stub.logins.get() === 1)
      // server-side expiry: typed exception from get, then the cache path
      // re-validates (fails) and re-logins exactly once
      stub.validSessions = Set.empty
      intercept[GeotabSessionExpiredException] {
        GeotabClients(name).get("Device", Map.empty, creds)
      }
      val fresh = GeotabSessionCache.credentials(name, "db1", "u@x", "pw")
      assert(stub.logins.get() === 2)
      assert(fresh.sessionId !== creds.sessionId)
      GeotabSessionCache.clear()
    }
  }

  test("the DSv2 connector reads end-to-end over HTTP (scan, pushdown, FAILFAST)") {
    withStub { stub =>
      GeotabSessionCache.clear()
      val info = spark.read.format("geotab")
        .option("entity", "deviceInfo")
        .option("client", stub.url)
        .option("database", "db1").option("user", "u@x").option("password", "pw")
        .load()
      assert(info.count() === 1L)
      val row = info.selectExpr("device.id", "latitude", "speed").collect().head
      assert(row.getString(0) === "d1" && row.getDouble(2) === 36.0)
      // pushed isDriver predicate must reach the wire as a boolean
      val users = spark.read.format("geotab")
        .option("entity", "user").option("client", stub.url)
        .option("database", "db1").option("user", "u@x").option("password", "pw")
        .load().filter("isDriver = true")
      assert(users.count() === 1L)
      assert(stub.getBodies.toArray.map(_.toString)
        .exists(b => b.contains(""""typeName":"User"""") &&
          b.contains(""""isDriver":true""")),
        "the pushed predicate must appear in the HTTP search payload")
      GeotabSessionCache.clear()
    }
  }
}
