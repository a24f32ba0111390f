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

  /** [[scaledSum]] presented at money grain: the exact decimal sum is
    * rounded to 2 digits (an exact integer operation, identical in both
    * engines) BEFORE the double cast. Needed when the sum's magnitude ×
    * its scale exceeds double precision: a 2.8e10 sum with 6-decimal
    * structure needs 17 significant digits, so the raw decimal→double
    * conversion itself diverges by 1 ulp between engines (Spark converts
    * the exact BigDecimal; DuckDB's hugeint/10^s path double-rounds —
    * q01's sum_charge at the sf1 sweep). At money grain the value fits
    * 13-14 digits with exact-representation margin through ~sf100. */
  def moneyGrainSum(c: Column, scale: Int): Column =
    round(sum(c.cast(s"decimal(30,$scale)")), 2).cast("double")

  /** Order-independent average: exact decimal sum / count, in double.
    * Both engines perform the identical single division — bit-equal. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** Exact integer-sum average. */
  def intAvg(c: Column): Column =
    sum(c).cast("double") / count(lit(1))
}
