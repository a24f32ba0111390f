package graft.sources

import graft.SparkSpec
import graft.sources.geotab._
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** DSv2 connector tests: filter pushdown reaches the API search payload,
  * column pruning reaches the scan, sessions are cached + revalidated, and
  * end-to-end the connector feeds the reference pipeline. */
class GeotabSourceSpec extends SparkSpec {

  private def freshClient(): InMemoryGeotabClient = new InMemoryGeotabClient(
    users = Seq(
      Map("id" -> "drv1", "name" -> "jdoe", "firstName" -> "John",
        "lastName" -> "Doe", "phoneNumber" -> "555", "designation" -> "Sr",
        "comment" -> "c", "isDriver" -> true),
      Map("id" -> "admin1", "name" -> "admin", "isDriver" -> false)),
    devices = Seq(
      Map("id" -> "d1", "vehicleIdentificationNumber" -> "V1",
        "licensePlate" -> "P1", "licenseState" -> "CO", "name" -> "Truck One",
        "group" -> "g1", "tracked" -> true),
      Map("id" -> "d2", "vehicleIdentificationNumber" -> "V2", "name" -> "Untracked",
        "group" -> "g1", "tracked" -> false),
      Map("id" -> "d3", "vehicleIdentificationNumber" -> "V3", "name" -> "Other Group",
        "group" -> "g2", "tracked" -> true)),
    initialDeviceInfo = Seq(
      """{"bearing":90.0,"latitude":39.7,"longitude":-104.9,"speed":100.0,
        |"dateTime":"2026-01-01T11:30:00Z","device":{"id":"d1"},
        |"driver":"UnknownDriverId","isDriving":true,
        |"isDeviceCommunicating":true,"isHistoricLastDriver":false,
        |"groups":[{"id":"g1"}]}""".stripMargin.replaceAll("\n", "")))

  private def read(client: String, entity: String) =
    spark.read.format("geotab")
      .option("entity", entity).option("client", client)
      .option("database", "fleetdb").option("user", "svc").option("password", "pw")
      .load()

  test("unknown-typed exceptionEvents pass through verbatim as raw JSON (task.ts:15)") {
    // Type.Array(Type.Unknown()): heterogeneous elements — objects, numbers,
    // strings — must survive ingest byte-level, not be dropped or nulled
    val raw = """[{"rule":{"id":"RuleSpeeding"},"distance":1.5},42,"plain"]"""
    val c = new InMemoryGeotabClient(Seq.empty, Seq.empty, Seq(
      s"""{"bearing":1.0,"latitude":0.0,"longitude":0.0,"speed":0.0,
         |"dateTime":"2026-01-01T11:30:00Z","device":{"id":"dE"},
         |"driver":"UnknownDriverId","isDriving":true,
         |"exceptionEvents":$raw,
         |"isDeviceCommunicating":true,"isHistoricLastDriver":false,
         |"groups":[{"id":"g1"}]}""".stripMargin.replaceAll("\n", "")))
    GeotabClients.register("tEx", c)
    GeotabSessionCache.clear()
    val row = read("tEx", "deviceInfo")
      .select(col("device.id"), col("exceptionEvents")).head()
    assert(row.getString(0) === "dE")
    assert(row.getString(1) === raw,
      s"exceptionEvents must round-trip verbatim, got ${row.getString(1)}")
    // and the unknown content stays queryable downstream
    val dist = read("tEx", "deviceInfo")
      .select(get_json_object(col("exceptionEvents"), "$[0].distance")).head().getString(0)
    assert(dist === "1.5")
  }

  test("isDriver predicate is pushed into the API search payload (task.ts:175-177)") {
    val c = freshClient()
    GeotabClients.register("t1", c)
    GeotabSessionCache.clear()
    val drivers = read("t1", "user").filter(col("isDriver") === true).collect()
    assert(drivers.map(_.getAs[String]("id")).toSet === Set("drv1"))
    val calls = c.getCalls.asScala.toList
    assert(calls === List(("User", Map("isDriver" -> "true"))),
      s"predicate not pushed: $calls")
  }

  test("device scan always excludes untracked assets; group filter pushes (task.ts:194-202)") {
    val c = freshClient()
    GeotabClients.register("t2", c)
    GeotabSessionCache.clear()
    val got = read("t2", "device").filter(col("group") === "g1").collect()
    assert(got.map(_.getAs[String]("id")).toSet === Set("d1"),
      "untracked + other-group devices must be filtered at the source")
    val (typeName, search) = c.getCalls.asScala.head
    assert(typeName === "Device")
    assert(search.get("excludeUntrackedAssets").contains("true"))
    assert(search.get("groups").contains("g1"), s"group filter not pushed: $search")
  }

  test("multi-group IN predicate shards the scan: one partition per group") {
    val c = freshClient()
    GeotabClients.register("t2b", c)
    GeotabSessionCache.clear()
    val df = read("t2b", "device").filter(col("group").isin("g1", "g2"))
    assert(df.rdd.getNumPartitions === 2,
      "a 2-group membership filter must plan 2 input partitions")
    val got = df.collect()
    assert(got.map(_.getAs[String]("id")).toSet === Set("d1", "d3"),
      "sharded fetches must union to the tracked members of both groups")
    val searches = c.getCalls.asScala.toList.collect {
      case ("Device", s) => s.get("groups") }
    assert(searches.flatten.toSet === Set("g1", "g2"),
      s"each shard must push exactly its own group id: $searches")
  }

  test("conjunction of group predicates narrows to the intersection") {
    // group = 'g2' AND group IN ('g1','g2'): both predicates are claimed as
    // fully pushed, so the scan itself must enforce their conjunction — the
    // intersection {g2} — and fetch nothing else
    val c = freshClient()
    GeotabClients.register("t2c", c)
    GeotabSessionCache.clear()
    val got = read("t2c", "device")
      .filter(col("group") === "g2" && col("group").isin("g1", "g2"))
      .collect()
    assert(got.map(_.getAs[String]("id")).toSet === Set("d3"),
      s"conjunction must narrow to g2, got ${got.mkString(",")}")
    val searches = c.getCalls.asScala.toList.collect {
      case ("Device", s) => s.get("groups") }.flatten
    assert(searches === List("g2"), s"scan must fetch only the intersection: $searches")
  }

  test("contradictory group equalities return zero rows and fetch nothing") {
    val c = freshClient()
    GeotabClients.register("t2d", c)
    GeotabSessionCache.clear()
    val got = read("t2d", "device")
      .filter(col("group") === "g1" && col("group") === "g2")
      .collect()
    assert(got.isEmpty, "group='g1' AND group='g2' is unsatisfiable")
    assert(c.getCalls.asScala.isEmpty, "a contradictory scan must not call the API")
  }

  test("overlapping shard membership yields distinct ids (dedupe across IN shards)") {
    // d4's primary group is g1 but it is also a member of g2: both shard
    // fetches return it; the scan must emit it exactly once — including when
    // the projection prunes the group column away
    val c = new InMemoryGeotabClient(
      users = Seq.empty,
      devices = Seq(
        Map("id" -> "d1", "name" -> "One", "group" -> "g1", "tracked" -> true),
        Map("id" -> "d3", "name" -> "Three", "group" -> "g2", "tracked" -> true),
        Map("id" -> "d4", "name" -> "Both", "group" -> "g1",
          "memberOf" -> "g2", "tracked" -> true)),
      initialDeviceInfo = Seq.empty)
    GeotabClients.register("t2e", c)
    GeotabSessionCache.clear()
    val ids = read("t2e", "device").filter(col("group").isin("g1", "g2"))
      .select("id").collect().map(_.getString(0))
    assert(ids.length === ids.distinct.length,
      s"duplicate ids across group shards: ${ids.mkString(",")}")
    assert(ids.toSet === Set("d1", "d3", "d4"), ids.mkString(","))
    // both shards did fetch d4 — the dedupe happened in the scan, not the API
    val fetches = c.getCalls.asScala.toList.collect { case ("Device", s) => s("groups") }
    assert(fetches.toSet === Set("g1", "g2"), fetches.toString)
  }

  test("membership over-fetch cannot widen results: residual filter drops foreign groups") {
    // d9's PRIMARY group is outside the pushed set; it matches both shard
    // fetches through memberOf. The partially-pushed predicate means Spark
    // re-applies group IN (...) above the scan, so d9 appears zero times —
    // the scan over-fetch is an optimization detail, never a result change.
    val c = new InMemoryGeotabClient(
      users = Seq.empty,
      devices = Seq(
        Map("id" -> "d1", "name" -> "One", "group" -> "g1", "tracked" -> true),
        Map("id" -> "d9", "name" -> "Foreign", "group" -> "g0",
          "memberOf" -> "g1,g2", "tracked" -> true)),
      initialDeviceInfo = Seq.empty)
    GeotabClients.register("t2g", c)
    GeotabSessionCache.clear()
    val multi = read("t2g", "device").filter(col("group").isin("g1", "g2"))
      .select("id").collect().map(_.getString(0))
    assert(multi.toSeq === Seq("d1"),
      s"foreign-primary-group rows must not survive (or duplicate): ${multi.toSeq}")
    val single = read("t2g", "device").filter(col("group") === "g1")
      .select("id").collect().map(_.getString(0))
    assert(single.toSeq === Seq("d1"),
      s"group='g1' must not return rows with group='g0': ${single.toSeq}")
  }

  test("group-sharded scan reports its clustering: per-group agg plans no Exchange") {
    val c = freshClient()
    GeotabClients.register("t2f", c)
    GeotabSessionCache.clear()
    val bucketing = "spark.sql.sources.v2.bucketing.enabled"
    val aqe = "spark.sql.adaptive.enabled"
    val prevB = spark.conf.get(bucketing)
    val prevA = spark.conf.get(aqe)
    try {
      spark.conf.set(bucketing, "true")
      spark.conf.set(aqe, "false") // inspect the static plan
      val agg = read("t2f", "device").filter(col("group").isin("g1", "g2"))
        .groupBy(col("group")).count()
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"scan is already clustered by group; agg must not shuffle:\n$plan")
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("g1" -> 1L, "g2" -> 1L), got.toString)
    } finally {
      spark.conf.set(bucketing, prevB)
      spark.conf.set(aqe, prevA)
    }
  }

  test("reader enforces exact key ownership: exchange-free agg stays correct under over-fetch") {
    // Every over-fetch shape at once: d4 is returned by both shard fetches
    // (secondary membership), d9's primary group is outside the pushed set,
    // dn has no primary group at all. The scan reports
    // KeyGroupedPartitioning, so the agg elides its shuffle — the counts
    // are only correct if each reader emits exactly its own key's rows
    // (strict ownership), independent of the residual filter.
    val c = new InMemoryGeotabClient(
      users = Seq.empty,
      devices = Seq(
        Map("id" -> "d1", "name" -> "One", "group" -> "g1", "tracked" -> true),
        Map("id" -> "d3", "name" -> "Three", "group" -> "g2", "tracked" -> true),
        Map("id" -> "d4", "name" -> "Both", "group" -> "g1",
          "memberOf" -> "g2", "tracked" -> true),
        Map("id" -> "d9", "name" -> "Foreign", "group" -> "g0",
          "memberOf" -> "g1,g2", "tracked" -> true),
        Map("id" -> "dn", "name" -> "NoGroup", "memberOf" -> "g1", "tracked" -> true)),
      initialDeviceInfo = Seq.empty)
    GeotabClients.register("t2h", c)
    GeotabSessionCache.clear()
    val bucketing = "spark.sql.sources.v2.bucketing.enabled"
    val aqe = "spark.sql.adaptive.enabled"
    val prevB = spark.conf.get(bucketing)
    val prevA = spark.conf.get(aqe)
    try {
      spark.conf.set(bucketing, "true")
      spark.conf.set(aqe, "false")
      val agg = read("t2h", "device").filter(col("group").isin("g1", "g2"))
        .groupBy(col("group")).count()
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"agg must reuse the scan clustering:\n$plan")
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("g1" -> 2L, "g2" -> 1L), got.toString)
    } finally {
      spark.conf.set(bucketing, prevB)
      spark.conf.set(aqe, prevA)
    }
  }

  test("column pruning reaches the scan description") {
    val c = freshClient()
    GeotabClients.register("t3", c)
    GeotabSessionCache.clear()
    val df = read("t3", "device").select("id", "name")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("GeotabScan"), plan)
    assert(plan.contains("columns=id,name") || df.schema.fieldNames.sameElements(Array("id", "name")),
      s"pruned schema not propagated:\n$plan")
    df.collect()
  }

  test("session cache: one login across scans, re-login after invalidation (task.ts:127-143)") {
    val c = freshClient()
    GeotabClients.register("t4", c)
    GeotabSessionCache.clear()
    read("t4", "user").collect()
    read("t4", "device").collect()
    assert(GeotabSessionCache.logins.get() === 1, "session not reused")
    c.expireAllSessions() // expire server-side
    read("t4", "user").collect()
    assert(GeotabSessionCache.logins.get() === 2, "no re-login after expiry")
  }

  test("persisted session survives a process restart: zero re-logins (task.ts:127-143)") {
    // the reference caches credentials in CloudTAK's ephemeral store, which
    // outlives Lambda invocations — a new process reuses the old session.
    // Simulated restart = clearMemory() (in-memory cache gone, disk + the
    // server's session table survive).
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-")
    val c = freshClient()
    GeotabClients.register("t4p", c)
    GeotabSessionCache.clear()
    GeotabSessionCache.persistTo(dir)
    try {
      read("t4p", "user").collect()
      assert(GeotabSessionCache.logins.get() === 1)
      GeotabSessionCache.clearMemory() // "restart"
      read("t4p", "device").collect()
      assert(GeotabSessionCache.logins.get() === 1,
        "restarted process must reuse the persisted session, not re-login")
      // disk session validated-on-use: server-side expiry still re-logins
      c.expireAllSessions()
      GeotabSessionCache.clearMemory()
      read("t4p", "user").collect()
      assert(GeotabSessionCache.logins.get() === 2,
        "stale persisted session must re-login like a stale cached one")
      // and the re-login refreshed the disk copy: another restart reuses it
      GeotabSessionCache.clearMemory()
      read("t4p", "device").collect()
      assert(GeotabSessionCache.logins.get() === 2,
        "refreshed session must be re-persisted after re-login")
    } finally {
      GeotabSessionCache.disablePersistence()
      GeotabSessionCache.clear()
      graft.ops.ExportOps.deleteRecursively(dir.toFile)
    }
  }

  test("FAILFAST deserialize: malformed API row fails the scan (task.ts:161-163)") {
    val bad = new InMemoryGeotabClient(Seq.empty, Seq.empty,
      initialDeviceInfo = Seq("""{"latitude": "not-a-number", "device": 42}"""))
    GeotabClients.register("tbad", bad)
    GeotabSessionCache.clear()
    val ex = intercept[Exception] {
      read("tbad", "deviceInfo").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("FAILFAST") || m.contains("Malformed") || m.contains("parse")),
      s"expected a fail-fast parse error, got: ${messages(ex).mkString(" | ")}")
  }

  test("mid-scan faults: 503 retries with the same session; expired session re-auths; g02 result identical") {
    val d = "/root/testdata/sf0.001"
    // clean reference run
    GeotabSessionCache.clear()
    val clean = graft.geotab.GeotabSynth.connectorFlagship(spark, d)
      .collect().map(_.mkString("|")).sorted
    val cleanLogins = GeotabSessionCache.logins.get()
    // faulted run: the FIRST get 503s (must retry with the SAME session,
    // not burn a login), and after the first SUCCESSFUL get every live
    // session expires server-side — the validated-then-expired race: the
    // next scan's cached credentials pass nothing (server cleared them),
    // so the cache's validate-on-use path must re-login mid-pipeline
    GeotabSessionCache.clear()
    val faulted = graft.geotab.GeotabSynth.connectorFlagship(spark, d, c => {
      c.injectTransientFailures(1)
      c.expireSessionsAfterGets(1)
    }).collect().map(_.mkString("|")).sorted
    assert(faulted.toSeq === clean.toSeq,
      "the faulted run must land exactly the clean g02 result")
    // recovery really happened through Authenticate: the faulted run paid
    // exactly one re-login on top of the clean run's single login
    assert(GeotabSessionCache.logins.get() === cleanLogins + 1,
      s"expected ${cleanLogins + 1} logins (initial + one re-auth), " +
        s"got ${GeotabSessionCache.logins.get()}")
  }

  test("connector feeds the reference pipeline end-to-end") {
    val c = freshClient()
    GeotabClients.register("t5", c)
    GeotabSessionCache.clear()
    val info = read("t5", "deviceInfo")
      .withColumn("n", graft.geotab.GeotabSchemas.normalizeDriver(col("driver")))
      .select(col("device.id").as("device_id"),
        to_timestamp(col("dateTime")).as("dateTime"),
        col("latitude"), col("longitude"), col("speed"), col("bearing"),
        col("n.driverId").as("driverId"), col("n.driverIsObject").as("driverIsObject"),
        lit("g1").as("groups"))
    val devices = read("t5", "device")
    val drivers = read("t5", "user").filter(col("isDriver") === true)
      .drop("isDriver")
    val out = graft.geotab.GeotabPipeline.featuresFlat(devices, info, drivers,
      graft.geotab.GeotabPipeline.Config(
        now = lit(java.sql.Timestamp.valueOf("2026-01-01 12:00:00"))))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("id") === "geotab-d1")
    assert(out.head.getAs[String]("driver_username") === null) // string-variant driver
  }
}
