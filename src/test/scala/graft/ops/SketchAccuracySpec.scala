package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value checks for the two bounds-mode sketch gates (r15 verdict item 4;
  * re-keyed in r19 per the r18 verdict's item 4): q31/q41's RAW estimates
  * cannot be DuckDB-oracled because their POINT is Spark's own sketch
  * implementations (HLL++ register layout, GK compress schedule —
  * engine-hash-bound by design). Since r19 the gates emit in-engine
  * VERIFIED-accuracy booleans next to the exact columns (fully
  * hash-oracled); this spec keeps pinning the raw estimate values
  * directly — the same expressions the gates run — so the bounds
  * booleans are never the only look anyone takes at the numbers, and
  * additionally asserts every gate boolean is true at both SFs. Both
  * sketches are deterministic on fixed input, so these pins are stable,
  * not flaky. */
class SketchAccuracySpec extends SparkSpec {

  private def events(d: String) = graft.Tables(spark, d, "events")

  test("q31: HLL++ distinct estimate lands within 3x its documented rsd of exact") {
    // approx_count_distinct's default rsd is 0.05; 3x = 15% is far wider
    // than any healthy HLL++ run drifts, and a register-layout bug blows
    // straight through it
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val joined = events(d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        val relErr = math.abs(approx - exact) / exact
        assert(relErr <= 0.15,
          s"$d ${r.getString(0)}: HLL estimate $approx vs exact $exact — " +
            s"relative error $relErr exceeds 3x rsd (0.15)")
      }
      // and the gate's own verdict column agrees
      val gate = Relational.queries("q31_approx_distinct")(spark, d)
      assert(gate.filter(!col("hll_within_3rsd")).isEmpty,
        s"$d: q31 gate reports an HLL estimate outside its 3x-rsd bound")
    }
  }

  test("q41: GK percentile estimates land within the accuracy-1000 rank bound") {
    // approx_percentile(value, q, 1000) guarantees rank error <= n/1000;
    // the pin brackets each estimate by the EXACT percentiles at
    // q +/- 0.005 (5x the guaranteed bound — generous, still tight enough
    // that a compress-schedule bug lands outside it)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val joined = events(d).groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, 0.25, 1000)").as("p25_approx"),
          expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(value, 0.75, 1000)").as("p75_approx"),
          expr("percentile(value, 0.245)").as("lo25"),
          expr("percentile(value, 0.255)").as("hi25"),
          expr("percentile(value, 0.495)").as("lo50"),
          expr("percentile(value, 0.505)").as("hi50"),
          expr("percentile(value, 0.745)").as("lo75"),
          expr("percentile(value, 0.755)").as("hi75"))
        .collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        def f(name: String) = r.getAs[Double](name)
        for ((q, approxCol, lo, hi) <- Seq(
            (0.25, "p25_approx", "lo25", "hi25"),
            (0.5, "p50_approx", "lo50", "hi50"),
            (0.75, "p75_approx", "lo75", "hi75"))) {
          val a = f(approxCol)
          assert(a >= f(lo) && a <= f(hi),
            s"$d ${r.getString(0)} q=$q: approx $a outside exact rank " +
              s"band [${f(lo)}, ${f(hi)}]")
        }
      }
      // and the gate's own rank-band verdicts agree
      val gate = Relational.queries("q41_approx_percentile")(spark, d)
      assert(gate.filter(!col("p25_in_rank_band") ||
          !col("p50_in_rank_band") || !col("p75_in_rank_band")).isEmpty,
        s"$d: q41 gate reports a GK estimate outside its rank band")
    }
  }
}
