package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew/scale stress gates (round-7 verdict item 5): the plans were
  * audited right, but nothing END-TO-END exercised a pathological
  * distribution. Each test synthesizes one — a mega-domain, a 100k-token
  * document, a hot user — at roughly sf0.01 row counts and asserts hard
  * wall-time bounds. The bounds are ~10× a healthy run on this co-tenant
  * host (BASELINE.md documents ±40% swings), so they only trip on a
  * complexity-class regression (quadratic per-group work, a skew-blind
  * all-pairs join), not on host noise. Where the scale defense is a plan
  * shape rather than a constant factor, the plan is pinned too.
  */
class StressSpec extends SparkSpec {
  import spark.implicits._

  test("d19 kernel: a 500k-row mega-domain is capped in bounded time via WindowGroupLimit") {
    // 500k rows, 80% in one domain — the CommonCrawl nightmare host. The
    // filter(row_number <= cap) shape must plan as a WindowGroupLimit:
    // each map task keeps ~cap rows per domain BEFORE the shuffle, so the
    // mega-domain ships O(cap × partitions) rows, not 400k, into the
    // single per-domain reducer.
    val df = spark.range(500000).select(
      col("id").as("doc_id"),
      when(col("id") % 5 =!= 0, "www.megahost.example.com")
        .otherwise(concat(lit("www.host"), (col("id") / 5) % 1000,
          lit(".example.com"))).as("domain"),
      md5(col("id").cast("string")).as("ord"))
    val capped = DedupOps.domainCap(df)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — mega-domains ship whole to one reducer:\n$plan")
    val t0 = System.nanoTime()
    val rows = capped.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"mega-domain cap took ${secs}s — skew regression?")
    assert(rows("www.megahost.example.com") === DedupOps.DomainCap.toLong)
    assert(rows.size === 1001 && rows.valuesIterator.forall(_ <= DedupOps.DomainCap))
  }

  test("t15 kernel: a 100k-token document scores in bounded time") {
    // ~5× the existing 20k linearity spec, at the scale where the old
    // compositional per-row form (~10^10 comparisons) would never finish.
    val n = 100000
    val toks = (0 until n).map(i => s"x${i % 50}") ++ Seq("y", "y", "y", "y")
    val doc = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = TextOps.repetitionGopher(doc).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, s"100k-token doc took ${secs}s — quadratic regression?")
    assert(row.getAs[Long]("n_2grams") === (n + 3).toLong)
    assert(row.getAs[Double]("dup_2gram_frac") > 0.99)
  }

  test("q61 kernel: a 400k-event hot user funnels in bounded time with one shuffle") {
    // one user owns 300k of 400k events (the bot-account shape); the
    // funnel must stay three chained windows + one agg over a SINGLE
    // user_id shuffle — never a per-user subquery or self-join.
    val events = spark.range(400000).select(
      when(col("id") % 4 =!= 0, lit(7L)).otherwise(col("id") % 997).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      (lit(1700000000000L) + col("id") * 1000L).as("ms"))
    val staged = Relational.funnelStages(events)
    val exchanges = "(?m)^.*Exchange hashpartitioning".r
      .findAllIn(staged.queryExecution.executedPlan.toString).size
    assert(exchanges <= 2,
      s"funnel should need one user_id shuffle (+1 for the agg at most), saw $exchanges")
    val t0 = System.nanoTime()
    val got = staged.collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_stage")).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"hot-user funnel took ${secs}s — skew regression?")
    assert(got(7L) === 3L) // the hot user reaches purchase
    assert(got.size === 997)
  }
}
