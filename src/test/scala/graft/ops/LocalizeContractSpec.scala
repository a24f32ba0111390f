package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The localize() size contract is ENFORCED since r15 (it was scaladoc
  * prose — the r13 verdict's watch item): a gate whose localized result
  * scales with the corpus must fail loudly by name, never drift toward
  * silent driver-heap pressure at a bigger SF. */
class LocalizeContractSpec extends SparkSpec {

  test("a result over the ceiling fails loudly with the contract message") {
    val big = spark.range(11).select(col("id"))
    val e = intercept[IllegalStateException] {
      ExportOps.localize(big, maxRows = 10)
    }
    assert(e.getMessage.contains("size contract violated"))
    assert(e.getMessage.contains("11 rows > 10"))
  }

  test("a result at the ceiling localizes intact") {
    val ok = spark.range(10).select(col("id"))
    val local = ExportOps.localize(ok, maxRows = 10)
    assert(local.count() === 10L)
    // and the default ceiling clears the largest real gate landing
    assert(ExportOps.LocalizeMaxRows >= 2000000,
      "the default ceiling must clear q65's full-corpus dedup echo at sf1")
  }
}
