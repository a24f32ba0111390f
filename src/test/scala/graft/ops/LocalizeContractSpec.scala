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
    assert(e.getMessage.contains("> 10 rows"))
  }

  test("the violation aborts before materializing the full result") {
    // the probe collects through limit(maxRows + 1): a 100M-row frame
    // must fail fast without the driver ever holding 100M rows (the
    // failure mode the contract exists to prevent — r14 ADVICE). The
    // wall-clock bound is generous; a full materialization of range(1e8)
    // plus collect would blow it (and likely the heap) first.
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException] {
      ExportOps.localize(spark.range(100000000L).toDF(), maxRows = 10)
    }
    assert(e.getMessage.contains("size contract violated"))
    assert((System.nanoTime() - t0) / 1e9 < 30.0,
      "early abort took suspiciously long — did the probe collect everything?")
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
