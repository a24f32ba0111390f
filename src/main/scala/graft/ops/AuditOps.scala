package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality constraint audit (the Deequ/great-expectations shape): a
  * fixed suite of checks evaluated in a handful of full-scan aggregations,
  * emitted as one small (check, metric, passed) table — the gate every
  * production pipeline runs before shipping a snapshot downstream.
  *
  * Scale shape: each check is a partial+final hash aggregation (map-side
  * combined) or an anti-join on the join key; nothing collects until the
  * per-check 1-row results union. At 100 TB the audit costs a bounded
  * number of scans (Spark shares the cached scan across same-source
  * checks) — never a sort, never a cross product.
  */
object AuditOps {

  /** q56: audit the orders table against customer (row volume, null-free
    * keys, primary-key uniqueness, referential integrity, value ranges). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val orders = Tables(s, d, "orders")
    val customer = Tables(s, d, "customer")

    def check(name: String, metric: DataFrame): DataFrame =
      metric.select(lit(name).as("check_name"),
        col("metric").cast("long").as("metric"),
        (col("metric") === 0L).as("passed"))

    val rowcount = orders.agg(count(lit(1)).as("n"))
      .select(lit("orders_nonempty").as("check_name"), col("n").as("metric"),
        (col("n") > 0L).as("passed"))
    val nullKeys = check("o_custkey_nulls",
      orders.agg(count_if(col("o_custkey").isNull).as("metric")))
    val dupPk = check("o_orderkey_dupes",
      orders.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("metric")))
    val orphans = check("orders_orphaned",
      orders.join(customer, orders("o_custkey") === customer("c_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("metric")))
    val negPrice = check("o_totalprice_negative",
      orders.agg(count_if(col("o_totalprice") < 0).as("metric")))
    val badStatus = check("o_orderstatus_domain",
      orders.agg(count_if(!col("o_orderstatus").isin("O", "F", "P")).as("metric")))

    rowcount.unionByName(nullKeys).unionByName(dupPk).unionByName(orphans)
      .unionByName(negPrice).unionByName(badStatus)
      .orderBy("check_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_quality_audit" -> q56 _)

  val oracle: Map[String, String] = Map(
    "q56_quality_audit" ->
      """SELECT * FROM (
        |  SELECT 'orders_nonempty' AS check_name, CAST(count(1) AS BIGINT) AS metric,
        |         count(1) > 0 AS passed FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey_nulls', CAST(count_if(o_custkey IS NULL) AS BIGINT),
        |         count_if(o_custkey IS NULL) = 0 FROM orders
        |  UNION ALL
        |  SELECT 'o_orderkey_dupes',
        |         CAST(count(1) - count(DISTINCT o_orderkey) AS BIGINT),
        |         count(1) - count(DISTINCT o_orderkey) = 0 FROM orders
        |  UNION ALL
        |  SELECT 'orders_orphaned', CAST(count(1) AS BIGINT), count(1) = 0
        |  FROM orders o WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'o_totalprice_negative',
        |         CAST(count_if(o_totalprice < 0) AS BIGINT),
        |         count_if(o_totalprice < 0) = 0 FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus_domain',
        |         CAST(count_if(o_orderstatus NOT IN ('O','F','P')) AS BIGINT),
        |         count_if(o_orderstatus NOT IN ('O','F','P')) = 0 FROM orders
        |) ORDER BY check_name""".stripMargin)
}
