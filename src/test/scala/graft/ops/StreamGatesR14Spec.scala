package graft.ops

import graft.SparkSpec

/** Round-14 streaming-gate property spec: q134's right-outer eviction. */
class StreamGatesR14Spec extends SparkSpec {

  test("q134 right-outer: unmatched clicks emit only on watermark close") {
    val d = "/root/testdata/sf0.001"
    // With the sentinel batch the watermark clears the click-side
    // eviction bound (click_ts + 30 min), so the landed frame IS the
    // batch RIGHT JOIN (the oracle gates that). Without it the trailing
    // unmatched clicks must still be buffered when the query drains —
    // and ONLY one-sided null-purchase rows may be held back (matched
    // rows emit on arrival).
    val withS = SessionGates
      .streamOuterJoinGate(spark, d, sentinel = true, joinType = "right_outer")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    val withoutS = SessionGates
      .streamOuterJoinGate(spark, d, sentinel = false, joinType = "right_outer")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    assert(withoutS.subsetOf(withS),
      "the sentinel may only ADD rows (flush buffered outer state)")
    val missing = withS -- withoutS
    assert(missing.nonEmpty,
      "some unmatched clicks must be held back without the watermark advance")
    // columns: purchase_id|uid|purchase_ms|click_id|click_ms
    missing.foreach { row =>
      val p = row.split("\\|")
      assert(p(0) == "null" && p(2) == "null",
        s"right-outer holdback must be null-PURCHASE rows only: $row")
    }
  }
}
