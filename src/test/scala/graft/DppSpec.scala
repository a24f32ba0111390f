package graft

import graft.ops.{ExportOps, Relational}
import org.apache.spark.sql.functions._

/** q80 plan spec: the month-partitioned fact scan must carry a runtime
  * `dynamicpruning` expression in its PartitionFilters — the mechanism,
  * not just the answer — and the runtime-pruned join must land the same
  * rows as the static predicate it discovers. */
class DppSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q80: the fact scan's PartitionFilters carry a dynamicpruning subquery") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_dppspec").toFile
    try {
      val factDir = new java.io.File(dir, "fact").getAbsolutePath
      Tables(s, d, "orders")
        .withColumn("omonth", month(col("o_orderdate")))
        .write.partitionBy("omonth").parquet(factDir)
      val fact = s.read.parquet(factDir)
      val res = Relational.seasonRevenue(fact, Relational.monthsDim(s))

      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in the fact scan:\n$plan")
      val scanLine = plan.linesIterator
        .find(l => l.contains("PartitionFilters") && l.contains("omonth"))
        .getOrElse("")
      assert(scanLine.contains("dynamicpruning"),
        s"PartitionFilters lack the runtime subquery: $scanLine\n$plan")

      // the pruned join equals the static predicate it discovers at runtime
      val got = res.orderBy("omonth").collect()
      val want = fact.filter(col("omonth").between(4, 6))
        .groupBy(col("omonth"))
        .agg(count(lit(1)).as("n_orders"),
          graft.ops.StableAgg.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("omonth").collect()
      assert(got.toSeq == want.toSeq)
      assert(got.map(_.getInt(0)).toSeq == Seq(4, 5, 6))
    } finally ExportOps.deleteRecursively(dir)
  }
}
