package graft.ops

import graft.SparkSpec

/** Pins the measured bounds of the d37/d38 recall evaluations at two SFs —
  * the values the gates' scaladoc claims (class separation in d37, the
  * band-collision floor and the prefix-filter guarantee in d38) asserted
  * as numbers, so a kernel change that silently degrades a topology's
  * recall fails HERE with the class named, not as an opaque oracle-hash
  * mismatch. */
class RecallEvalSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("d37: blocking topologies separate the planted corruption classes") {
    for (sf <- sfs) {
      val rows = DedupOps.queries("d37_fuzzy_recall_eval")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(4))).toMap
      for (((pipeline, clazz), (nGold, _)) <- rows)
        assert(nGold > 0, s"$sf: empty gold class $pipeline/$clazz")
      def recall(p: String, c: String) = rows((p, c))._2
      // the single prefix/exact-bucket pass: tail edits only
      assert(recall("single_pass", "tail") == 1.0, s"$sf single_pass tail")
      assert(recall("single_pass", "head") == 0.0, s"$sf single_pass head")
      assert(recall("single_pass", "straddle") == 0.0, s"$sf single_pass straddle")
      // the multi-pass closes head (suffix block) and straddle (±1 probe)
      assert(recall("multi_pass", "tail") == 1.0, s"$sf multi_pass tail")
      assert(recall("multi_pass", "head") == 1.0, s"$sf multi_pass head")
      assert(recall("multi_pass", "straddle") == 1.0, s"$sf multi_pass straddle")
      // the documented residual escape, MEASURED at zero for both
      assert(recall("single_pass", "both_ends") == 0.0)
      assert(recall("multi_pass", "both_ends") == 0.0, s"$sf both_ends")
    }
  }

  test("d38: containment recall sits at the band floor; prefix filter closes it") {
    for (sf <- sfs) {
      val rows = DedupOps.queries("d38_containment_recall_eval")(spark, sf)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      val (nGold, bandRecall, avgJ, minCont) = rows("resemblance_bands")
      assert(nGold > 0)
      // the eval regime: true subsets (containment exactly 1.0) whose
      // Jaccard sits far below the 4x2 banding's reliable zone
      assert(minCont == 1.0, s"$sf: planted snippets must be true subsets")
      assert(avgJ < 0.25, s"$sf: gold avg Jaccard $avgJ not below band zone")
      // resemblance bands at J~0.15: collision ~ 1-(1-J^2)^4 ~ 0.09 —
      // bounded loosely so hash-mix changes don't flake the pin, but a
      // recall CLAIM (>=0.5) or a dead generator (0 with 20+ gold pairs)
      // both fail
      assert(bandRecall < 0.3, s"$sf: band recall $bandRecall not at the floor")
      val (_, pfRecall, _, _) = rows("prefix_filter")
      assert(pfRecall == 1.0,
        s"$sf: prefix filter must catch every true subset, got $pfRecall")
    }
  }

  test("v25: banded embedding blocking recall declines with cosine, " +
      "high band complete") {
    // LSH theory at w=4, 4 bands: P(collide) = 1-(1-p^4)^4 with
    // p = 1-acos(c)/pi — ~0.99 at c=0.96, ~0.93 at 0.87, ~0.73 at 0.65,
    // ~0.53 at 0.44. Floors sit under the measured values (sf0.001:
    // 1.0/0.976/0.667/0.595; sf0.01: 1.0/0.905/0.771/0.607) with margin
    // for construction tweaks, but a banding bug (wrong band extraction,
    // dead signature) craters straight through them.
    for (sf <- sfs) {
      val rows = SimilarityOps.queries("v25_blocking_recall_eval")(spark, sf)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(rows.keySet == Set("a_0.95_1.00", "b_0.80_0.95",
        "c_0.60_0.80", "d_0.40_0.60", "e_below_0.40"),
        s"$sf: bands ${rows.keySet}")
      assert(rows.values.map(_._1).sum == 160L,
        s"$sf: planted gold total ${rows.values.map(_._1).sum} != 160")
      rows.foreach { case (band, (nGold, _)) =>
        assert(nGold >= 10, s"$sf: band $band too thin ($nGold) to pin") }
      def recall(b: String) = rows(b)._2
      assert(recall("a_0.95_1.00") == 1.0,
        s"$sf: high band must be complete, got ${recall("a_0.95_1.00")}")
      assert(recall("b_0.80_0.95") >= 0.85, s"$sf b: ${recall("b_0.80_0.95")}")
      assert(recall("c_0.60_0.80") >= 0.60, s"$sf c: ${recall("c_0.60_0.80")}")
      assert(recall("d_0.40_0.60") >= 0.45, s"$sf d: ${recall("d_0.40_0.60")}")
      // the decline itself is the measurement: blocking quality is a
      // function of cosine, and the below-threshold band (out of v03's
      // contract) must not look better than the in-contract bands
      assert(recall("a_0.95_1.00") > recall("d_0.40_0.60"), s"$sf monotone")
      assert(recall("e_below_0.40") < recall("b_0.80_0.95"), s"$sf below")
    }
  }

  test("v25: gold cosines sit clear of rounding midpoints and band edges") {
    // The gold cosine crosses engines through a float dot/norm/sqrt
    // before round-to-4 (r19 ADVICE): a raw value within the engines'
    // float disagreement of a 4-decimal rounding MIDPOINT (x.xxxx5)
    // could round differently per engine, and a raw within that
    // disagreement of a cos_band edge (0.40/0.60/0.80/0.95) could band
    // differently — either flips the gate hash. This is v24's RadiusTau
    // boundary-distance probe applied to v25's value surface.
    //
    // Margin calibration: both engines compute the same 64-term dot,
    // norms and sqrt in IEEE doubles, so their results agree to a few
    // ulps (≲1e-13 relative at cosine magnitude ~1); 1e-9 leaves four
    // orders of safety above that while tolerating the fixture's
    // observed minimum midpoint distance (4.5e-7 at sf0.001 — real, and
    // harmless at double precision).
    val edges = Seq(0.40, 0.60, 0.80, 0.95)
    for (sf <- sfs) {
      val raws = SimilarityOps.v25GoldFrame(spark, sf)
        .select("cos_raw").collect().map(_.getDouble(0))
      assert(raws.length == 160, s"$sf: gold count ${raws.length}")
      for (c <- raws) {
        val scaled = c * 10000.0
        val midDist = math.abs(scaled - math.floor(scaled) - 0.5) / 10000.0
        assert(midDist >= 1e-9,
          f"$sf: gold cosine $c%.12f within $midDist%.2e of a 4-decimal rounding midpoint")
        val edgeDist = edges.map(e => math.abs(c - e)).min
        assert(edgeDist >= 1e-9,
          f"$sf: gold cosine $c%.12f within $edgeDist%.2e of a cos_band edge")
      }
    }
  }
}
