package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // events.ts has shipped under two physical encodings: parquet
      // TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as
      // raw longs via the legacy conf) and plain TIMESTAMP(MICROS) without
      // the UTC-adjusted flag (which Spark reads as TIMESTAMP_NTZ). Branch
      // on the type that actually arrives so the loader survives fixture
      // regeneration — the same discipline a 100 TB lake needs for files
      // written by heterogeneous producers. Downstream always sees
      // `ts: TimestampType` at µs precision; oracle SQL only compares at
      // millisecond-or-coarser granularity, where the encodings agree.
      // NOTE: this conf is session-wide and deliberately not restored —
      // restoring it raced concurrent suites reading events. The effect
      // (any NANOS parquet column reads as raw longs) is documented at the
      // session front door, GraftSession.scala.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => // raw nanos: truncate to TimestampType's µs grain
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: TimestampNTZType => // session TZ is UTC → value-stable cast
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
