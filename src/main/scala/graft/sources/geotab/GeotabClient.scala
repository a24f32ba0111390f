package graft.sources.geotab

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Client abstraction over the Geotab JSON-RPC API surface the reference
  * uses (task.ts: `Authenticate` task.ts:326-355, `Get User by name` probe
  * task.ts:301-324, `Get {typeName, search}` scans task.ts:148-218).
  *
  * Two implementations ship: [[HttpGeotabClient]] speaks the real JSON-RPC
  * protocol against `<api>/apiv1` (unit-tested against a local stub server
  * — the environment is offline), and [[InMemoryGeotabClient]] is the
  * fixture-backed fake the gates run on. Instances are resolved by name
  * from a registry so executors can look the client up without serializing
  * it; a name that IS an http(s) URL resolves to an [[HttpGeotabClient]]
  * for that API base on any JVM.
  */
case class GeotabCredentials(database: String, sessionId: String, userName: String)

/** Server-side session rejection mid-call — the reference API's expired-
  * session error (its clients re-Authenticate and retry; task.ts:127-143
  * caches exactly because Authenticate is rate-limited). The connector's
  * recovery path: re-resolve credentials through the validate-on-use
  * cache (which re-logins because the server no longer validates the old
  * session) and retry the call once. */
class GeotabSessionExpiredException(msg: String) extends RuntimeException(msg)

/** Transient server failure (HTTP 503 / rate-limit burst) — retryable
  * with the SAME session after a short backoff, the g09 submit-side
  * discipline applied to the ingest side. */
class GeotabTransientException(msg: String) extends RuntimeException(msg)

/** Non-retryable protocol violation from a 2xx response — the server (or
  * an intermediary) answered, but with something a JSON-RPC client cannot
  * act on and resending cannot fix: a response body over the configured
  * size cap, or a structurally non-RPC payload. Malformed/truncated JSON
  * is NOT this — that retries as transient (proxies emit garbage under
  * load) and exhausts to [[GeotabTransientException]]. */
class GeotabProtocolException(msg: String) extends RuntimeException(msg)

trait GeotabClient {
  /** POST Authenticate (rate-limited in production — task.ts:297-300). */
  def authenticate(database: String, userName: String, password: String): GeotabCredentials

  /** Cheap probe validating a cached session (task.ts:301-324). */
  def validateSession(credentials: GeotabCredentials): Boolean

  /** JSON-RPC Get: returns raw JSON rows for an entity scan, with the
    * source-side `search` predicate payload (task.ts:175-177, 194-202). */
  def get(typeName: String, search: Map[String, String],
          credentials: GeotabCredentials): Seq[String]

  /** Monotonic snapshot version used as the streaming offset: a micro-batch
    * fires when the version advances. A live HTTP client derives this from
    * poll time (every trigger sees a new snapshot, like the reference's
    * scheduled Lambda); the fixture client bumps it when test data changes
    * so processAllAvailable() terminates deterministically. */
  def dataVersion: Long
}

object GeotabClients {
  private val registry = new ConcurrentHashMap[String, GeotabClient]()
  def register(name: String, client: GeotabClient): Unit = registry.put(name, client)
  /** Gates that fully execute their read before returning drop their
    * fixture client here; names are per-invocation (UUID-suffixed), so a
    * registration can never be replaced mid-stream by a concurrent run of
    * the same gate — suite parallelism made the shared-name form flaky. */
  def unregister(name: String): Unit = registry.remove(name)
  /** Resolution with the production fallback: a name that IS an http(s)
    * URL lazily constructs (and memoizes) an [[HttpGeotabClient]] for that
    * API base — deterministic from the name alone, so every executor JVM
    * resolves its own transport from the scan properties
    * (`option("client", "https://my.geotab.com")`) with nothing
    * serialized. Registered fixtures always win, keeping tests hermetic
    * even with URL-shaped names. */
  def apply(name: String): GeotabClient = {
    val c = registry.get(name)
    if (c != null) c
    else if (name.startsWith("http://") || name.startsWith("https://"))
      registry.computeIfAbsent(name, n => new HttpGeotabClient(n))
    else throw new IllegalArgumentException(
      s"no GeotabClient registered under '$name'")
  }
}

/** Driver/executor-local session cache with validate-on-use, reproducing the
  * reference's ephemeral-store credential reuse (task.ts:127-143): cached
  * session is probed with a cheap call; only on failure do we re-login,
  * because the login endpoint is rate-limited. Keyed per (client, database,
  * user) — the analogue of the reference's per-layer ephemeral KV.
  *
  * The reference's ephemeral store SURVIVES Lambda invocations — one
  * process's login is the next process's cached session. [[persistTo]]
  * mirrors that: with a persistence directory configured, every fresh
  * login also lands in a small per-key properties file (written atomically
  * via temp-file + ATOMIC_MOVE so a crashed writer never leaves a torn
  * file), and a cache miss falls back to the disk copy BEFORE logging in —
  * still validate-on-use, so a stale disk session re-logins exactly like a
  * stale in-memory one. Point it at a driver-local path (or the job's
  * checkpoint dir) and a restarted driver reuses the previous run's
  * session instead of hitting the rate-limited Authenticate endpoint
  * (task.ts:297-300). Never stores the password — only the issued
  * (database, sessionId, userName) triple, same as the reference's store.
  */
object GeotabSessionCache {
  private val cache = new ConcurrentHashMap[(String, String, String), GeotabCredentials]()
  val logins = new AtomicInteger(0) // observability for tests/metrics
  @volatile private var persistDir: Option[java.nio.file.Path] = None

  /** Enable cross-process persistence under `dir` (created if absent). */
  def persistTo(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    persistDir = Some(dir)
  }

  /** Back to in-memory-only (files under the old dir are left in place). */
  def disablePersistence(): Unit = persistDir = None

  private def keyFile(dir: java.nio.file.Path,
                      key: (String, String, String)): java.nio.file.Path = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${key._1}\n${key._2}\n${key._3}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    dir.resolve(s"geotab-session-$digest.properties")
  }

  private def loadFromDisk(key: (String, String, String)): Option[GeotabCredentials] =
    persistDir.flatMap { dir =>
      val f = keyFile(dir, key)
      if (!java.nio.file.Files.isRegularFile(f)) None
      else try {
        val p = new java.util.Properties()
        val in = java.nio.file.Files.newInputStream(f)
        try p.load(in) finally in.close()
        for {
          db <- Option(p.getProperty("database"))
          sid <- Option(p.getProperty("sessionId"))
          user <- Option(p.getProperty("userName"))
        } yield GeotabCredentials(db, sid, user)
        // unreadable OR corrupted = miss (Properties.load throws
        // IllegalArgumentException on a malformed \uXXXX escape — a torn
        // file must degrade to a re-login, never a permanent crash)
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private def saveToDisk(key: (String, String, String),
                         c: GeotabCredentials): Unit =
    persistDir.foreach { dir =>
      try {
        val p = new java.util.Properties()
        p.setProperty("database", c.database)
        p.setProperty("sessionId", c.sessionId)
        p.setProperty("userName", c.userName)
        val tmp = java.nio.file.Files.createTempFile(dir, "geotab-session-", ".tmp")
        val outStream = java.nio.file.Files.newOutputStream(tmp)
        try p.store(outStream, null) finally outStream.close()
        java.nio.file.Files.move(tmp, keyFile(dir, key),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case _: java.io.IOException => () } // persistence is best-effort
    }

  /** Synchronized: concurrent partition readers must not race a stampede
    * of logins against the rate-limited endpoint — one thread logs in, the
    * rest reuse (exactly the property the reference's ephemeral-store cache
    * provides across Lambda invocations). Lookup order: memory → disk
    * (validate-on-use at each step) → authenticate. */
  def credentials(clientName: String, database: String, userName: String,
                  password: String): GeotabCredentials = synchronized {
    val key = (clientName, database, userName)
    val client = GeotabClients(clientName)
    val cached = cache.get(key)
    if (cached != null && client.validateSession(cached)) cached
    else loadFromDisk(key).filter(client.validateSession) match {
      case Some(fromDisk) =>
        cache.put(key, fromDisk) // promote: later hits skip the disk read
        fromDisk
      case None =>
        val fresh = client.authenticate(database, userName, password)
        logins.incrementAndGet()
        cache.put(key, fresh)
        saveToDisk(key, fresh)
        fresh
    }
  }

  /** Drops the IN-MEMORY cache only — what a process restart does. Disk
    * state (when persistence is on) survives, like the reference's
    * ephemeral store across Lambda invocations. */
  def clearMemory(): Unit = cache.clear()

  def clear(): Unit = { cache.clear(); logins.set(0) }
}

/** Fixture-backed fake client. Records every `get` invocation (typeName +
  * search payload) so tests can assert that predicate pushdown actually
  * reached the source. Applies the search semantics the real API applies
  * server-side: isDriver on User, excludeUntrackedAssets/groups on Device.
  */
class InMemoryGeotabClient(
    users: Seq[Map[String, Any]],
    devices: Seq[Map[String, Any]],
    initialDeviceInfo: Seq[String]) extends GeotabClient {

  @volatile private var deviceInfo: Seq[String] = initialDeviceInfo
  private val version = new java.util.concurrent.atomic.AtomicLong(1L)
  override def dataVersion: Long = version.get()

  /** Test hook: replace the live telemetry snapshot (bumps the version so a
    * streaming read picks it up as a new micro-batch). */
  def setDeviceInfo(rows: Seq[String]): Unit = {
    deviceInfo = rows
    version.incrementAndGet()
  }

  val getCalls = new java.util.concurrent.CopyOnWriteArrayList[(String, Map[String, String])]()
  // concurrent partition readers authenticate in parallel — plain var Set
  // loses updates under the read-modify-write race
  private val sessions = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def authenticate(database: String, userName: String, password: String): GeotabCredentials = {
    val cred = GeotabCredentials(database, s"sess-${System.nanoTime()}", userName)
    sessions.add(cred.sessionId)
    cred
  }

  override def validateSession(c: GeotabCredentials): Boolean =
    sessions.contains(c.sessionId)

  /** Test hook: server-side session expiry. */
  def expireAllSessions(): Unit = sessions.clear()

  // Fault injection for the connector-recovery gate: `injectTransientFailures(n)`
  // makes the next n gets fail 503-style; `expireSessionsAfterGets(k)`
  // expires every live session AFTER the kth successful get — the
  // validated-then-expired race (a session that passed validate-on-use
  // dies server-side before the scan's next call uses it).
  private val transientLeft = new AtomicInteger(0)
  private val expireCountdown = new AtomicInteger(Int.MaxValue)
  def injectTransientFailures(n: Int): Unit = transientLeft.set(n)
  def expireSessionsAfterGets(k: Int): Unit = expireCountdown.set(k)

  private def toJson(m: Map[String, Any]): String =
    m.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v: Boolean) => s""""$k":$v"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")

  override def get(typeName: String, search: Map[String, String],
                   credentials: GeotabCredentials): Seq[String] = {
    if (transientLeft.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new GeotabTransientException("injected 503")
    if (!sessions.contains(credentials.sessionId))
      throw new GeotabSessionExpiredException(
        s"session ${credentials.sessionId} is not valid")
    if (expireCountdown.decrementAndGet() == 0) expireAllSessions()
    getCalls.add((typeName, search))
    typeName match {
      case "User" =>
        val filtered = search.get("isDriver") match {
          case Some("true") => users.filter(_.getOrElse("isDriver", false) == true)
          case _ => users
        }
        filtered.map(toJson)
      case "Device" =>
        var out = devices
        if (search.get("excludeUntrackedAssets").contains("true"))
          out = out.filter(_.getOrElse("tracked", true) == true)
        // a device matches a group search through its primary `group` or any
        // secondary membership listed in `memberOf` (comma-separated) — the
        // single-level analogue of the real API's multi-group membership
        search.get("groups").foreach { g =>
          out = out.filter(d => d.get("group").contains(g) ||
            d.get("memberOf").exists(_.toString.split(",").contains(g)))
        }
        out.map(toJson)
      case "DeviceStatusInfo" => deviceInfo
      case other => throw new IllegalArgumentException(s"unknown typeName $other")
    }
  }
}
