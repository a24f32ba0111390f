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

  test("c07: SQL-defined scalar functions INLINE — no function call survives optimization") {
    ops.TextOps.registerSqlUdfs(spark)
    Tables(spark, d, "documents").createOrReplaceTempView("documents")
    val df = spark.sql(
      "SELECT doc_id, graft_distinct_ratio(text) AS score FROM documents")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_distinct_ratio"),
      s"the scalar SQL UDF must inline to its body:\n$optimized")
    assert(optimized.contains("array_distinct"),
      s"the inlined body's arithmetic must appear in the plan:\n$optimized")
    // and the physical plan stays codegen'd — no UDF eval node
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF") && !physical.contains("BatchEval"),
      s"no black-box UDF eval may appear:\n$physical")
    // "*(n)" is whole-stage codegen's stage marker in the plan string
    assert(physical.contains("*(1)"),
      s"the inlined projection must sit inside whole-stage codegen:\n$physical")
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
