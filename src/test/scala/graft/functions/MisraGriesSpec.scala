package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries Aggregator: the survival guarantee (any token with true
  * frequency > n/(k+1) appears in the summary) must hold regardless of
  * partitioning, and the t09 two-pass recount must equal the exact
  * frequency table's heavy tail. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("tokens above n/(k+1) always survive the sketch, any partitioning") {
    // 10k tokens: "hot" 600x (6%), "warm" 200x (2%), the rest spread thin
    val tokens = Seq.fill(600)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 9200).map(i => s"cold${i % 4000}")
    val shuffled = new scala.util.Random(7).shuffle(tokens)
    for (parts <- Seq(1, 7, 32)) {
      val ds = spark.createDataset(shuffled).repartition(parts)
      val cands = ds.select(new MisraGriesAggregator(50).toColumn).head()
      assert(cands.contains("hot"), s"hot lost at $parts partitions")
      assert(cands.contains("warm"), s"warm (2% > n/51) lost at $parts partitions")
      assert(cands.size <= 50, s"summary overflow at $parts partitions")
    }
  }

  test("t09 heavy hitters equal the exact >=1% frequency tail") {
    val d = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("t09_heavy_hitters")(spark, d)
      .as[(String, Long)].collect().toSet
    val toks = graft.Tables(spark, d, "documents")
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .filter(length(col("token")) > 0)
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * 100 >= n)
      .as[(String, Long)].collect().toSet
    assert(got === want)
  }
}
