package graft

import org.apache.spark.sql.functions._

/** Round-11 plan pins: the forbidable plan shapes of the new operators. */
class PlanAuditR11Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q101: AQE actually splits the planted skewed partition (skew=true)") {
    ops.Relational.withSkewConfs(spark) {
      val joined = ops.Relational.q101Join(spark, d)
      // collect() executes THIS dataframe's QueryExecution (count() would
      // build a separate one and leave this plan un-finalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"skew gate must run a sort-merge join (broadcast must stay off):\n$plan")
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
    }
  }

  test("q101: without the planted hot key no skew split fires (the detector is real)") {
    ops.Relational.withSkewConfs(spark) {
      // uniform keys, same (amplified) volume: AQE must leave the join
      // unsplit, so the q101 pin above is detecting OUR skew, not firing
      // always — uniform partitions sit at the median, and the detector
      // requires median × factor, not just bytes
      val fact = Tables(spark, d, "events").repartition(8)
        .withColumn("rep", explode(expr("sequence(0L, 19L)")))
        .select((col("event_id") % 100).as("k"),
          md5(concat(col("event_id").cast("string"), lit("-"),
            col("rep").cast("string"))).as("payload"))
      val dim = spark.range(100).select(col("id").as("k"))
      val joined = fact.join(dim, Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("skew=true"),
        s"uniform join was marked skewed — thresholds are degenerate:\n$plan")
    }
  }

  test("t29: the histogram cutoff plan carries no per-source global sort of the corpus") {
    // t27 pays Window(row_number) over corpus rows; t29's corpus-side work
    // must stay sort-free — its only window runs over sketch (hist) rows.
    val df = SparkEntry.queries("t29_sketch_prune")(spark, d)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("row_number"),
      s"t29 must not rank corpus rows:\n$plan")
  }
}
