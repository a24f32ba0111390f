package graft.ops

import graft.SparkSpec

/** v20 accuracy pin — what the (fully hash-matched) gate can't say by
  * itself: the 1-bit codes actually FIND the true neighbours. Recall@5
  * against the exact v01 answer, measured 0.94 at sf0.001 with the
  * 128-candidate shortlist; the floor leaves noise margin but fails on
  * any real packing/shortlist regression (a broken sign pack reads as
  * random codes → recall ~0.08). */
class HammingRecallSpec extends SparkSpec {

  test("v20: Hamming shortlist + rerank recalls the exact top-5") {
    val d = "/root/testdata/sf0.001"
    def pairs(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, d)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("v01_knn_brute")
    val approx = pairs("v20_hamming_ann")
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8,
      f"v20 recall@5 = $recall%.3f < 0.8 — the binary codes stopped " +
        "finding the true neighbours (measured 0.94 on this fixture)")
  }
}
