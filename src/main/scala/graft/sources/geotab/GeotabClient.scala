package graft.sources.geotab

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Client abstraction over the Geotab JSON-RPC API surface the reference
  * uses (task.ts: `Authenticate` task.ts:326-355, `Get User by name` probe
  * task.ts:301-324, `Get {typeName, search}` scans task.ts:148-218).
  *
  * The environment is offline, so the shipped implementation is a
  * fixture-backed fake; a production HTTP client implements the same three
  * calls against `<api>/apiv1`. Instances are resolved by name from a
  * registry so executors can look the client up without serializing it.
  */
case class GeotabCredentials(database: String, sessionId: String, userName: String)

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
  def apply(name: String): GeotabClient = {
    val c = registry.get(name)
    require(c != null, s"no GeotabClient registered under '$name'")
    c
  }
}

/** Driver/executor-local session cache with validate-on-use, reproducing the
  * reference's ephemeral-store credential reuse (task.ts:127-143): cached
  * session is probed with a cheap call; only on failure do we re-login,
  * because the login endpoint is rate-limited. Keyed per (client, database,
  * user) — the analogue of the reference's per-layer ephemeral KV.
  */
object GeotabSessionCache {
  private val cache = new ConcurrentHashMap[(String, String, String), GeotabCredentials]()
  val logins = new AtomicInteger(0) // observability for tests/metrics

  /** Synchronized: concurrent partition readers must not race a stampede
    * of logins against the rate-limited endpoint — one thread logs in, the
    * rest reuse (exactly the property the reference's ephemeral-store cache
    * provides across Lambda invocations). */
  def credentials(clientName: String, database: String, userName: String,
                  password: String): GeotabCredentials = synchronized {
    val key = (clientName, database, userName)
    val client = GeotabClients(clientName)
    val cached = cache.get(key)
    if (cached != null && client.validateSession(cached)) cached
    else {
      val fresh = client.authenticate(database, userName, password)
      logins.incrementAndGet()
      cache.put(key, fresh)
      fresh
    }
  }

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

  private def toJson(m: Map[String, Any]): String =
    m.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v: Boolean) => s""""$k":$v"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")

  override def get(typeName: String, search: Map[String, String],
                   credentials: GeotabCredentials): Seq[String] = {
    require(sessions.contains(credentials.sessionId), "invalid session")
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
