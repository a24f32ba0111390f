package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual complement to AQE's skew-join
  * splitting (which only kicks in for sort-merge joins past size
  * thresholds).
  *
  * [[saltedJoin]] handles the classic "one key holds 30% of the fact rows"
  * shape: the skewed (large) side gets a deterministic salt in [0, n); the
  * small side is replicated n times with every salt value; the join key
  * becomes (key, salt), spreading each hot key over n shuffle partitions.
  * Replication multiplies the small side by n — use for genuinely small
  * build sides that still can't broadcast, or pass the known-hot keys to
  * salt selectively.
  */
object Skew {

  /** Deterministic salt from the row's whole content (stable across runs —
    * no rand(), which would break retries/speculation). Package-visible so
    * the skew spec can pin the salt distribution itself. */
  private[ops] def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(n))

  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt", saltCol(skewed, saltFactor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic aggregates
    * Spark's partial HashAggregate already does this; the explicit form is
    * for aggregates that need it spelled out (e.g. collect-like ops) or to
    * force a wider first stage under extreme skew. */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", saltCol(df, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
