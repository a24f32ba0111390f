package graft.sources.geotab

import graft.SparkSpec
import graft.geotab.GeotabSynth

/** Pins the g18 transport gate's wire-level claims — the parts the DuckDB
  * hash-match can't see: the planted 503 was actually SERVED and retried
  * through (not absorbed by a cache), the rate-limited Authenticate ran
  * exactly once per run (parallel entity scans share the session through
  * [[GeotabSessionCache]] over HTTP, task.ts:297-324's discipline), and
  * the HTTP-ingested result row-matches the parquet-native flagship. */
class GeotabRpcFacadeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("g18 rides the 503-retry path and logs in exactly once per run") {
    val loginsBefore = GeotabSessionCache.logins.get()
    var served = -1
    var requests = -1
    val out = GeotabSynth.httpConnectorFlagship(spark, sf, f => {
      served = f.served503.get()
      requests = f.requests.get()
    })
    assert(served == 1, "the planted 503 must be served on the wire")
    // retried-through: the run completed, and at least login + probe +
    // three entity Gets followed the failed request
    assert(requests >= 5, s"expected >=5 wire requests, saw $requests")
    assert(GeotabSessionCache.logins.get() == loginsBefore + 1,
      "parallel scans must share one Authenticate per run (rate-limited endpoint)")
    val viaHttp = out.collect().map(_.toString).sorted
    val native = GeotabSynth.flagship(spark, sf).collect().map(_.toString).sorted
    assert(viaHttp.nonEmpty && viaHttp.sameElements(native))
  }

  test("facade maps an expired session to the in-band InvalidUserException error") {
    val inner = GeotabSynth.buildFixtureClient(spark, sf)
    val facade = new GeotabRpcFacade(inner)
    facade.start()
    try {
      val client = new HttpGeotabClient(facade.url, backoffMs = 1)
      val creds = client.authenticate("fleetdb", "svc", "pw")
      assert(client.validateSession(creds))
      assert(client.get("Device", Map.empty, creds).nonEmpty)
      inner.expireAllSessions()
      // the wire error body must re-type to the session-expired exception
      // (the reader's re-login trigger), not a generic RuntimeException
      assert(!client.validateSession(creds))
      intercept[GeotabSessionExpiredException] {
        client.get("Device", Map.empty, creds)
      }
    } finally facade.stop()
  }

  test("facade decodes typed search payloads back to the client-API shape") {
    val inner = GeotabSynth.buildFixtureClient(spark, sf)
    val facade = new GeotabRpcFacade(inner)
    facade.start()
    try {
      val client = new HttpGeotabClient(facade.url, backoffMs = 1)
      val creds = client.authenticate("fleetdb", "svc", "pw")
      client.get("User", Map("isDriver" -> "true"), creds)
      client.get("Device", Map("excludeUntrackedAssets" -> "true", "groups" -> "g1"), creds)
      import scala.jdk.CollectionConverters._
      val calls = inner.getCalls.asScala.toList
      assert(calls.contains(("User", Map("isDriver" -> "true"))))
      assert(calls.contains(
        ("Device", Map("excludeUntrackedAssets" -> "true", "groups" -> "g1"))))
    } finally facade.stop()
  }
}
