package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-path utilities: salted joins/aggregates produce identical results
  * to their naive forms, and bucketed tables join without an exchange. */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join on a skewed dataset") {
    // synthesize skew: 80% of rows share one key
    val skewed = (1 to 5000).map(i => (if (i % 5 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val small = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(skewed, small, "k", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("saltedCount matches groupBy count") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val plain = e.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(e, "event_type")
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("bucketed tables join with no shuffle exchange") {
    // warehouse.dir is static conf — tables land in ./spark-warehouse
    // (gitignored); drop any leftovers from a previous crashed run first
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables(spark, d, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables(spark, d, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    // keep the join a sort-merge so the bucket co-location is what's tested
    // (broadcast would trivially avoid the shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_bkt").join(
        spark.table("orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val got = joined.as[(String, Long)].collect().toMap // finalizes AQE plan
      val plan = joined.queryExecution.executedPlan.toString()
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      // co-located: below the join there must be no shuffle — the scans feed
      // it directly (the aggregation above it may still exchange)
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      val expected = Tables(spark, d, "lineitem").join(Tables(spark, d, "orders"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
