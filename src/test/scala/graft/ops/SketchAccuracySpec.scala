package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value checks for the two deliberately rows-only gates (r15 verdict
  * item 4): q31/q41 cannot be DuckDB-oracled because their POINT is
  * Spark's own sketch implementations (HLL++ register layout, GK compress
  * schedule — engine-hash-bound by design), but each sketch still owes a
  * RELATIVE-ERROR contract against its exact twin, asserted here so
  * "rows-only" never degrades to "values unchecked". Both sketches are
  * deterministic on fixed input, so these pins are stable, not flaky. */
class SketchAccuracySpec extends SparkSpec {

  private def events(d: String) = graft.Tables(spark, d, "events")

  test("q31: HLL++ distinct estimate lands within 3x its documented rsd of exact") {
    // approx_count_distinct's default rsd is 0.05; 3x = 15% is far wider
    // than any healthy HLL++ run drifts, and a register-layout bug blows
    // straight through it
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val joined = Relational.queries("q31_approx_distinct")(spark, d)
        .join(
          events(d).groupBy(col("event_type"))
            .agg(countDistinct(col("user_id")).as("exact_users")),
          "event_type")
        .select(col("event_type"), col("approx_users"), col("exact_users"))
        .collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        val relErr = math.abs(approx - exact) / exact
        assert(relErr <= 0.15,
          s"$d ${r.getString(0)}: HLL estimate $approx vs exact $exact — " +
            s"relative error $relErr exceeds 3x rsd (0.15)")
      }
    }
  }

  test("q41: GK percentile estimates land within the accuracy-1000 rank bound") {
    // approx_percentile(value, q, 1000) guarantees rank error <= n/1000;
    // the pin brackets each estimate by the EXACT percentiles at
    // q +/- 0.005 (5x the guaranteed bound — generous, still tight enough
    // that a compress-schedule bug lands outside it)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = events(d).groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.245)").as("lo25"),
          expr("percentile(value, 0.255)").as("hi25"),
          expr("percentile(value, 0.495)").as("lo50"),
          expr("percentile(value, 0.505)").as("hi50"),
          expr("percentile(value, 0.745)").as("lo75"),
          expr("percentile(value, 0.755)").as("hi75"))
      val joined = Relational.queries("q41_approx_percentile")(spark, d)
        .join(exact, "event_type").collect()
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
    }
  }
}
