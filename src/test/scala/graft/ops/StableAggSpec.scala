package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The property the oracle gate (and any 1000-executor job) rests on:
  * StableAgg sums are bit-identical regardless of partitioning / addition
  * order, where naive double sums are not. */
class StableAggSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("moneySum is bit-identical across partitionings") {
    val li = Tables(spark, d, "lineitem")
    val sums = Seq(1, 7, 32).map { n =>
      li.repartition(n)
        .agg(StableAgg.moneySum(col("l_extendedprice"))).head().getDouble(0)
    }
    assert(sums.distinct.size === 1, s"moneySum varied with partitioning: $sums")
  }

  test("moneyAvg divides an exact sum — stable and equal to the manual form") {
    val c = Tables(spark, d, "customer")
    val viaHelper = c.agg(StableAgg.moneyAvg(col("c_acctbal"))).head().getDouble(0)
    val manual = {
      val r = c.agg(StableAgg.moneySum(col("c_acctbal")), count(lit(1))).head()
      r.getDouble(0) / r.getLong(1)
    }
    assert(viaHelper === manual)
  }

  test("scaledSum recovers derived-product structure exactly") {
    // sum of price*(1-disc) at DECIMAL(30,6): true values are 4-decimal
    // structured, so the decimal cast is exact and the sum order-free
    val li = Tables(spark, d, "lineitem")
    val expr0 = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val a = li.repartition(3).agg(StableAgg.scaledSum(expr0, 6)).head().getDouble(0)
    val b = li.repartition(17).agg(StableAgg.scaledSum(expr0, 6)).head().getDouble(0)
    assert(a === b)
  }
}
