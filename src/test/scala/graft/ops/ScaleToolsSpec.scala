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

  test("q63 sketch maintenance: persisted merge equals one-shot, within 5% of exact") {
    val d = "/root/testdata/sf0.001"
    // merge transparency: the persist -> reload -> union path must track the
    // one-shot sketch over all events. NOT exact equality: DataSketches HLL
    // only coincides exactly while sketches stay in coupon/list mode — once
    // a sketch promotes to HLL-array mode, a directly-built sketch reads the
    // HIP estimator while a unioned one reads the composite estimator, so
    // the two can legitimately differ by a small relative margin. A tight 1%
    // band pins merge transparency without baking in the mode coincidence.
    val merged = graft.SparkEntry.queries("q63_sketch_users")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Tables(spark, d, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === oneShot.keySet)
    merged.foreach { case (k, est) =>
      val o = oneShot(k).toDouble
      assert(math.abs(est.toDouble - o) / o < 0.01,
        s"persisted merge diverged from the one-shot sketch on $k: $est vs $o")
    }
    // ε-accuracy against the exact twin (q64): HLL at default lgK is well
    // under 5% on these cardinalities
    val exact = graft.SparkEntry.queries("q64_exact_users")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    merged.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(math.abs(est.toDouble - e) / e < 0.05, s"$k: est $est vs exact $e")
    }
  }
}
