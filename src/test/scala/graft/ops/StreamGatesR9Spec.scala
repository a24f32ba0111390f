package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 gate property specs: TTL state eviction (q84) and the RAG
  * retrieval composite (t24). */
class StreamGatesR9Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q84: TTL evicts idle per-user state where q74 carries it") {
    def lastByUser(name: String): Map[Long, (Long, Long)] =
      graft.SparkEntry.queries(name)(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, rs) =>
          val l = rs.maxBy(_._2); u -> ((l._2, l._3))
        }
    val carried = lastByUser("q74_stream_cumulative")
    val evicted = lastByUser("q84_stream_state_ttl")
    assert(carried.keySet === evicted.keySet,
      "both gates see the same user population")
    // users with events in BOTH halves: the carried gate's final totals
    // cover the lifetime; the TTL gate's cover batch 2 only — strictly
    // smaller. Users confined to one batch agree exactly.
    val mid = graft.Tables(spark, d, "events")
      .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"))
      .head().getLong(0)
    val bothBatches = graft.Tables(spark, d, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(unix_micros(col("ts")) <= mid, 1).otherwise(0)).as("b1"),
        sum(when(unix_micros(col("ts")) > mid, 1).otherwise(0)).as("b2"))
      .filter(col("b1") > 0 && col("b2") > 0)
      .collect().map(_.getLong(0)).toSet
    assert(bothBatches.nonEmpty, "fixture must span the batch split")
    bothBatches.foreach { u =>
      assert(evicted(u)._1 < carried(u)._1,
        s"user $u: TTL totals (${evicted(u)._1} events) must cover fewer " +
          s"events than carried totals (${carried(u)._1}) — state leaked " +
          "across the boundary despite the TTL")
    }
    (carried.keySet -- bothBatches).foreach { u =>
      assert(evicted(u) === carried(u),
        s"single-batch user $u must be TTL-invariant")
    }
  }

  test("t24: ranking is contiguous, sims are valid cosines, chunks real") {
    val rows = graft.SparkEntry.queries("t24_rag_retrieval")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length),
        s"query $q ranks not contiguous: ${rs.map(_._2).sorted.toSeq}")
      assert(rs.map(_._3).distinct.length === rs.length,
        s"query $q returned a document twice — best-chunk dedup failed")
      // ranks must be ordered by non-increasing similarity
      val bySim = rs.sortBy(_._2).map(_._5)
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b },
        s"query $q sims not monotone along ranks: ${bySim.toSeq}")
    }
    rows.foreach { case (q, _, doc, cs, sim) =>
      assert(sim >= -1.0000001 && sim <= 1.0000001,
        s"cosine out of range: $sim (query $q doc $doc)")
      assert(cs % 8 == 0, s"chunk_start $cs must sit on the stride grid")
    }
  }

  test("g16: transitions are consistent with the zoned ping sequence") {
    val rows = graft.SparkEntry.queries("g16_zone_transitions")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3)))
    assert(rows.nonEmpty, "the synth fleet must cross zone borders")
    rows.foreach { case (dev, _, from, to) =>
      assert(from != to, s"$dev: a transition must change zones")
    }
    // per device, consecutive transitions chain: to_zone of one is
    // from_zone of the next (no teleporting through unobserved zones)
    rows.groupBy(_._1).foreach { case (dev, rs) =>
      val ordered = rs.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._4 === b._3,
          s"$dev: transition chain broken at t=${b._2}: " +
            s"arrived in ${a._4} but next leaves ${b._3}")
      }
    }
  }
}
