package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md /
  * FIXTURES.md §B). All engine queries take the scale-factor directory as a
  * parameter so the same code runs at sf0.001 (smoke), sf0.01 (oracle) and
  * sf0.1 (bench) — and, unchanged, against a 100 TB lake: the reads are plain
  * `spark.read.parquet`, so partition pruning / column pruning / filter
  * pushdown all apply.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos and truncate to microseconds
      // (TimestampType precision). Oracle SQL only ever compares at
      // millisecond-or-coarser granularity, where ns and µs floors agree.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
