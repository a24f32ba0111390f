package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs from a single-node engine's — so a raw `sum(double)` (or
  * any `round` of it) can differ from the oracle in the last ulps, and
  * decimal-boundary values make `round` itself disagree between engines.
  * The fixtures' money columns are 2-decimal-structured (verified against
  * the data), so summing them as exact decimals is both bit-stable across
  * engines AND independent of partition/addition order — which is exactly
  * what a distributed engine needs for reproducible results at 100 TB.
  * Derived products (price × (1-disc)) carry deeper but still finite
  * decimal structure; summing at a scale comfortably below the structure
  * and far above double noise keeps exactness.
  */
object StableAgg {

  /** Exact sum of a 2-decimal money column, returned as double. */
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(30,2)")).cast("double")

  /** Exact sum of a derived expression with `scale`-decimal structure. */
  def scaledSum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Order-independent average: exact decimal sum / count, in double.
    * Both engines perform the identical single division — bit-equal. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** Exact integer-sum average. */
  def intAvg(c: Column): Column =
    sum(c).cast("double") / count(lit(1))
}
