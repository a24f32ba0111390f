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

  test("saltedJoin spreads a hot key across saltFactor shuffle partitions") {
    // the scale claim, tested not argued: one key carries 40% of the fact
    // rows (the shape that stalls an unsalted shuffle join on a single
    // straggler task); after salting, that key's rows must occupy many
    // shuffle partitions with no partition holding a straggler share.
    val saltFactor = 8
    val hot = 42L
    val skewed = (1 to 10000) // cold keys 100..196, disjoint from hot=42
      .map(i => (if (i % 5 < 2) hot else 100L + i % 97, i))
      .toDF("k", "v")
    val small = ((0L to 96L).map(_ + 100) :+ hot)
      .map(k => (k, s"dim$k")).toDF("k", "name")

    // 1) the salt itself: every hot-key row lands in one of saltFactor
    //    buckets, all buckets populated, roughly balanced
    val saltCounts = skewed.filter($"k" === hot)
      .withColumn("__salt", Skew.saltCol(skewed, saltFactor))
      .groupBy($"__salt").count().as[(Long, Long)].collect().toMap
    assert(saltCounts.keySet === (0L until saltFactor.toLong).toSet,
      s"every salt bucket must be populated: $saltCounts")
    assert(saltCounts.values.max < 2L * saltCounts.values.min,
      s"salt buckets badly unbalanced: $saltCounts")

    // 2) the physical plan: with AQE coalescing out of the way, the join's
    //    output partitions ARE the (k, __salt) shuffle partitions — count
    //    how many of them hold the hot key's rows
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Skew.saltedJoin(skewed, small, "k", saltFactor)
      val hotPerPartition = joined.filter($"k" === hot).rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().filter(_._2 > 0)
      val totalHot = hotPerPartition.map(_._2).sum
      assert(totalHot === 4000, s"hot-key rows lost: $totalHot")
      assert(hotPerPartition.length > 1,
        s"hot key stayed on one shuffle partition: ${hotPerPartition.toSeq}")
      // 8 salts into 8 test shuffle partitions: collisions allowed, but the
      // worst partition must carry nowhere near the unsalted 100% share
      val maxShare = hotPerPartition.map(_._2).max.toDouble / totalHot
      assert(maxShare <= 0.5,
        s"straggler partition still holds ${maxShare * 100}% of the hot key: " +
          s"${hotPerPartition.toSeq}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
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

  test("q63 KMV maintenance: exact below k, estimate within 15% above k") {
    // Below the sketch width (sf0.001: 15 distinct users/type, sf0.01:
    // 150 — both < 256) the bottom-k sketch IS the distinct set, so the
    // persisted-merge estimate must EQUAL the exact twin — a much
    // stronger pin than the old HLL 1% band (KMV merge transparency is
    // algebraic: bottom-k over a union is a semilattice).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val merged = graft.SparkEntry.queries("q63_sketch_users")(spark, d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = graft.SparkEntry.queries("q64_exact_users")(spark, d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(merged === exact, s"below-k sketch must be exact at $d")
    }
    // Above the width (sf0.1: 1500 distinct/type) the k-1/h_k estimator
    // carries ~1/sqrt(k-2) ≈ 6.3% standard error; 15% ≈ 2.4σ on the
    // FIXED fixture (deterministic — this is a regression pin, not a
    // statistical test)
    val d1 = "/root/testdata/sf0.1"
    val merged = graft.SparkEntry.queries("q63_sketch_users")(spark, d1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.SparkEntry.queries("q64_exact_users")(spark, d1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    merged.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(est > KmvTestK, s"$k: estimate leg should engage above k")
      assert(math.abs(est.toDouble - e) / e < 0.15, s"$k: est $est vs exact $e")
    }
  }

  private val KmvTestK = 256
}
