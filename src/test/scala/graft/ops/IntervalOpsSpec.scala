package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q78/q79 kernel specs: the binned overlap join must agree exactly with
  * the naive theta join it replaces (the whole claim of the grid plan),
  * and the time-weighted daily average must implement hold-until-next /
  * hold-until-midnight semantics with exact weights. */
class IntervalOpsSpec extends SparkSpec {

  private val H = 3600000L // 1 h in ms, the q78 bin width

  test("overlapJoinBinned equals the naive theta join, including multi-bin spans") {
    val s = spark
    import s.implicits._
    // Activity intervals engineered around bin edges: inside one bin,
    // spanning several bins, touching a window edge exactly, and disjoint.
    val acts = Seq(
      (1L, 0L, 0L, H - 1),            // exactly bin 0
      (1L, 1L, H / 2, 5 * H + 10),    // spans bins 0..5
      (2L, 0L, 3 * H, 3 * H),         // single instant at a window start
      (2L, 1L, 2 * H - 1, 2 * H - 1), // instant just before a window
      (3L, 0L, 10 * H, 12 * H - 1)    // far from every window
    ).toDF("user_id", "day", "act_start", "act_end")
    val wins = Seq(
      (0L, 0L, H),           // [0, 1h)
      (2L, 2 * H, 3 * H),    // [2h, 3h)
      (3L, 3 * H, 4 * H),    // [3h, 4h)
      (5L, 5 * H, 6 * H)     // [5h, 6h)
    ).toDF("win_hour", "win_start", "win_end")

    val binned = Relational.overlapJoinBinned(acts, wins, H)
      .orderBy("user_id", "day", "win_hour").collect().toSeq
    val naive = acts.join(wins,
        col("act_start") < col("win_end") && col("act_end") >= col("win_start"))
      .select(col("user_id"), col("day"), col("win_hour"),
        (least(col("act_end") + 1, col("win_end")) -
          greatest(col("act_start"), col("win_start"))).as("overlap_ms"))
      .orderBy("user_id", "day", "win_hour").collect().toSeq
    assert(binned == naive)
    // Sanity on the engineered cases: the multi-bin span overlaps four
    // windows and appears ONCE per window despite sharing six bins.
    val spanRows = binned.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(spanRows.map(_.getLong(2)) == Seq(0L, 2L, 3L, 5L))
    // The instant at a window start overlaps 1 ms; the instant just
    // before a window does not appear.
    assert(binned.count(r => r.getLong(0) == 2L && r.getLong(1) == 0L) == 1)
    assert(binned.filter(r => r.getLong(0) == 2L && r.getLong(1) == 0L)
      .head.getLong(3) == 1L)
    assert(!binned.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))
    assert(!binned.exists(r => r.getLong(0) == 3L))
  }

  test("timeWeightedDaily: hold-until-next, hold-until-midnight, exact weights") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    val readings = Seq(
      // user 1, day 0: 10.0 held 12 h, then 20.0 held to midnight → twa 15
      (1L, 1L, 0L, 10.0),
      (1L, 2L, day / 2, 20.0),
      // user 2, day 0: single reading mid-day, held to midnight → twa = value
      (2L, 3L, day / 4, 7.5),
      // user 2, day 1: same-ms tie broken by event_id (4 before 5):
      // 1.0 holds 0 ms, 3.0 holds the rest of the day → twa 3.0
      (2L, 4L, day + day / 2, 1.0),
      (2L, 5L, day + day / 2, 3.0)
    ).toDF("user_id", "event_id", "ms", "value")
    val out = Relational.timeWeightedDaily(readings)
      .orderBy("user_id", "day").collect()
    assert(out.length == 3)
    val Array(u1d0, u2d0, u2d1) = out
    assert(u1d0.getLong(2) == 2L && u1d0.getLong(3) == day &&
      u1d0.getDouble(4) == 15.0)
    assert(u2d0.getLong(3) == day - day / 4 && u2d0.getDouble(4) == 7.5)
    assert(u2d1.getLong(2) == 2L && u2d1.getLong(3) == day / 2 &&
      u2d1.getDouble(4) == 3.0)
  }
}
