package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q121's operator pins — what the driver's hash gate can't see:
  * the custom node actually plans as [[AsOfJoinExec]] (not a window or
  * nested-loop fallback), the planner inserts exactly the required
  * exchanges and LOCAL sorts, and the merge semantics hold on planted
  * edges (inclusive ties, last-of-duplicates, 3VL nulls, no-match
  * null-extension, misaligned upstream partitioning). */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) = // (id, key, t)
    rows.toDF("id", "key", "t")
  private def right(rows: (Long, Long, Long)*) = // (rid, rkey, rt)
    rows.toDF("rid", "rkey", "rt")

  private def join(l: org.apache.spark.sql.DataFrame,
                   r: org.apache.spark.sql.DataFrame) =
    AsOfJoin(l, r, "key", "rkey", "t", "rt")

  test("plans the custom exec with two clustered exchanges and local sorts only") {
    val df = join(left((1L, 10L, 100L)), right((7L, 10L, 50L)))
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    // the exec node prints without its Exec suffix (TreeNode.nodeName),
    // and AQE hides its final plan from TreeNode traversal — pin the
    // rendered tree
    assert(s.contains("AsOfJoin "), s"custom exec must plan:\n$s")
    assert(!s.contains("Window") && !s.contains("SortMergeJoin") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"no fallback operator may appear:\n$s")
    // EnsureRequirements inserted the shuffles and the sorts, and every
    // sort is in-partition — a global sort prints "], true, 0"
    assert(s.contains("Sort ["), s"expected planner-inserted sorts:\n$s")
    assert(!s.contains("], true, 0"),
      s"as-of sorts must be local, never global:\n$s")
    assert(s.contains("Exchange hashpartitioning"),
      s"both sides must cluster on their keys:\n$s")
  }

  test("merge semantics: latest at-or-before, inclusive ties, last duplicate wins") {
    val l = left((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 300L))
    val r = right((70L, 10L, 100L), // tie with left id=1: inclusive
      (71L, 10L, 150L), (72L, 10L, 150L), // duplicate (key, time): last wins
      (73L, 10L, 400L)) // after everything: never visible
    val got = join(l, r).select($"id", $"rid")
      .collect().map(x => (x.getLong(0), x.get(1))).toMap
    assert(got(1L) === 70L, "equal timestamps must match (inclusive)")
    assert(got(2L) === 72L, "duplicate (key,time) must resolve to the last")
    assert(got(3L) === 72L, "future right rows must stay invisible")
  }

  test("no match and 3VL: unmatched lefts null-extend, null keys and times never match") {
    val l = Seq((1L, Option(10L), Option(100L)),
      (2L, Option(20L), Option(100L)), // key with no right rows
      (3L, Option.empty[Long], Option(100L)), // null key
      (4L, Option(10L), Option.empty[Long])) // null time
      .toDF("id", "key", "t")
    val r = Seq((70L, Option(10L), Option(50L)),
      (71L, Option.empty[Long], Option(60L)), // null right key
      (72L, Option(10L), Option.empty[Long])) // null right time
      .toDF("rid", "rkey", "rt")
    val got = AsOfJoin(l, r, "key", "rkey", "t", "rt")
      .select($"id", $"rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got(1L) === Some(70L))
    assert(got(2L) === None, "keys absent on the right must null-extend")
    assert(got(3L) === None, "a NULL probe key never matches")
    assert(got(4L) === None, "a NULL probe time never matches")
  }

  test("misaligned upstream partitioning is re-clustered, result unchanged") {
    val l = left((1L, 10L, 100L), (2L, 11L, 100L), (3L, 12L, 100L))
      .repartition(5, col("t")) // wrong key on purpose
    val r = right((70L, 10L, 50L), (71L, 12L, 40L))
      .repartition(3, col("rid")) // wrong key, different count
    val got = join(l, r).select($"id", $"rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got === Map(1L -> Some(70L), 2L -> None, 3L -> Some(71L)))
  }

  test("pre-bucketed inputs drop the exchanges: zero shuffles in the as-of plan") {
    val pid = ProcessHandle.current().pid()
    val (lT, rT) = (s"graft_asof_l_$pid", s"graft_asof_r_$pid")
    try {
      graft.ops.ExportOps.writeBucketed(
        left((1L, 10L, 100L), (2L, 11L, 200L), (3L, 10L, 300L)), lT, 4, "key")
      graft.ops.ExportOps.writeBucketed(
        right((70L, 10L, 50L), (71L, 11L, 150L)), rT, 4, "rkey")
      val df = join(spark.table(lT), spark.table(rT))
      df.collect()
      val s0 = df.queryExecution.executedPlan.toString
      assert(!s0.contains("Exchange"),
        s"bucketed co-located as-of must plan no shuffle:\n$s0")
      val got = df.select($"id", $"rid").collect()
        .map(x => (x.getLong(0), Option(x.get(1)))).toMap
      assert(got === Map(1L -> Some(70L), 2L -> Some(71L), 3L -> Some(70L)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $lT")
      spark.sql(s"DROP TABLE IF EXISTS $rT")
    }
  }

  test("matches the q33-style brute-force on the fixture") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables(spark, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu")).collect()
    val purchases = ev.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(0)))
    val expect = ev.filter(_.getString(2) == "click").map { c =>
      val best = purchases
        .filter(p => p._1 == c.getLong(1) && p._2 <= c.getLong(3))
        .sortBy(p => (p._2, p._3)).lastOption
      (c.getLong(0), best.map(_._3).getOrElse(-1L))
    }.toMap
    val got = graft.ops.Relational.queries("q121_asof_native")(spark, d)
      .select(col("click_id"), col("purchase_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expect)
  }
}
