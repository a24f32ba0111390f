package graft

import org.apache.spark.sql.SparkSession

/** The library's session front door: one place for the conf the engine is
  * designed to run under, locally and on a cluster.
  *
  *  - AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  *    broadcast conversion) — the mechanism that keeps the declarative
  *    plans here honest at 100 TB;
  *  - shuffle partitions sized to the machine locally (a cluster deployment
  *    overrides with cores×executors, or leaves AQE to coalesce);
  *  - UTC session time (oracle parity + sane event-time semantics);
  *  - graft native functions registered for SQL use.
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.explainMode", "formatted")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(spark)
    spark
  }
}
