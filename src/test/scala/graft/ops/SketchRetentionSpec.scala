package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q146 value checks beyond the DuckDB hash oracle: the oracle proves the
  * REPLAY matches, these prove the ESTIMATES mean what they claim —
  * exact-regime equality with ground truth at the driver SFs (every
  * two-day union fits inside the k=256 sketch there) and bounded
  * estimator error at the bench SF (~1.5k DAU, squarely in the k-1/h_k
  * regime). Both pins are deterministic: the sketch is a pure function of
  * md5 over fixed fixtures. */
class Q146RetentionSpec extends SparkSpec {

  private def report(d: String) =
    Relational.queries("q146_sketch_retention")(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6),
          r.getLong(7)))
      .toMap // day_a -> (dau_a, dau_b, retained, churned, new)

  private def exact(d: String) = {
    val du = graft.Tables(spark, d, "events")
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
        col("user_id"))
      .distinct()
    val a = du.select(col("day").as("day_a"), col("user_id"))
    val b = du.select((col("day") - 1).as("day_a"), col("user_id"))
    a.join(b, Seq("day_a", "user_id"))
      .groupBy("day_a").agg(countDistinct("user_id").as("ret"))
      .join(du.groupBy(col("day").as("day_a"))
        .agg(countDistinct("user_id").as("dau_a")), "day_a")
      .join(du.groupBy((col("day") - 1).as("day_a"))
        .agg(countDistinct("user_id").as("dau_b")), "day_a")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(1)))
      .toMap // day_a -> (dau_a, dau_b, retained)
  }

  test("q146 invariants: retained+churned=dau_a, retained+new=dau_b, all >= 0") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rep = report(d)
      assert(rep.nonEmpty)
      rep.foreach { case (day, (dauA, dauB, ret, churn, nw)) =>
        assert(ret >= 0 && churn >= 0 && nw >= 0, s"$d day $day negative")
        assert(ret + churn == dauA, s"$d day $day: a-side identity broken")
        assert(ret + nw == dauB, s"$d day $day: b-side identity broken")
      }
    }
  }

  test("q146 exact regime: estimates EQUAL ground truth when unions fit in k") {
    // at sf0.001/sf0.01 every day pair's user union is < 256, so the
    // sketch is the complete set and every estimate must be exact
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rep = report(d)
      val ex = exact(d)
      assert(rep.keySet == ex.keySet, s"$d: day pairs differ")
      rep.foreach { case (day, (dauA, dauB, ret, _, _)) =>
        val (exA, exB, exRet) = ex(day)
        assert((dauA, dauB, ret) == (exA, exB, exRet),
          s"$d day $day: ($dauA,$dauB,$ret) != exact ($exA,$exB,$exRet)")
      }
    }
  }

  test("q146 estimator regime: sf0.1 retention lands within 20% of the union") {
    // ~1.5k DAU >> k=256: the k-1/h_k estimator runs on every leg.
    // KMV rsd ≈ 1/sqrt(k-2) ≈ 6.3%; inclusion-exclusion compounds three
    // estimates, so the pin is against the UNION scale (the quantity the
    // errors actually propagate from), with ~2x margin over the measured
    // fixture error (~9-10% of union).
    val d = "/root/testdata/sf0.1"
    val rep = report(d)
    val ex = exact(d)
    assert(rep.nonEmpty && rep.keySet == ex.keySet)
    rep.foreach { case (day, (_, _, ret, _, _)) =>
      val (exA, exB, exRet) = ex(day)
      val exUnion = exA + exB - exRet
      assert(math.abs(ret - exRet) <= 0.2 * exUnion,
        s"day $day: est_retained $ret vs exact $exRet " +
          s"(union $exUnion) — estimator off by more than 20% of union")
    }
  }
}

/** d35 value checks: metric consistency, and that the planted mid-J
  * variants put the measurement in the band-miss regime (recall strictly
  * below 1 — the gate measures the S-curve, it does not assume it). */
class D35RecallEvalSpec extends SparkSpec {

  private def row(d: String) = {
    val r = DedupOps.queries("d35_lsh_recall_eval")(spark, d).head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
  }

  test("d35 metric consistency at both driver SFs") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (nGold, nCand, tp, prec, rec, f1) = row(d)
      assert(nGold > 0 && nCand > 0, s"$d: degenerate eval corpus")
      assert(tp <= math.min(nGold, nCand), s"$d: tp exceeds a side")
      assert(prec == BigDecimal(tp.toDouble / nCand)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$d: precision")
      assert(rec == BigDecimal(tp.toDouble / nGold)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$d: recall")
      assert(f1 == BigDecimal(2.0 * tp / (nCand + nGold))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$d: f1")
    }
  }

  test("d35 planted mid-J variants expose the band-miss regime") {
    // the natural corpus sits at J >= 0.9 where 4 bands catch everything;
    // the period-10 plants (J ~ 0.51-0.64, miss-all-four ~ (1-J^2)^4 ~ 25%)
    // must pull recall strictly below 1 while leaving it well above the
    // single-band floor — a recall of exactly 1.0 would mean the plants
    // stopped planting
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (_, _, _, prec, rec, _) = row(d)
      assert(rec < 1.0 && rec > 0.5, s"$d: recall $rec outside (0.5, 1)")
      assert(prec > 0.0 && prec <= 1.0, s"$d: precision $prec")
    }
  }
}

/** d36 value checks: the BFS radius is seeded exactly (every flagged doc
  * at hop 0, nothing else), depth-bounded, and the planted chains make
  * hops 2 and 3 genuinely populated — multi-hop reach is measured, not
  * assumed from the component structure. */
class D36RadiusSpec extends SparkSpec {

  test("d36 radius: exact seed set at hop 0, bounded depth, real multi-hop reach") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rep = DedupOps.queries("d36_contamination_radius")(spark, d)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val seeds = graft.Tables(spark, d, "documents")
        .filter(col("doc_id") % 10 === 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val atZero = rep.filter(_._2 == 0L).map(_._1).toSet
      assert(atZero == seeds, s"$d: hop-0 set is not exactly the seeds")
      assert(rep.forall { case (_, h) => h >= 0 && h <= 3 },
        s"$d: hop outside [0, 3]")
      val byHop = rep.groupBy(_._2).view.mapValues(_.length).toMap
      assert(byHop.getOrElse(2L, 0) > 0 && byHop.getOrElse(3L, 0) > 0,
        s"$d: planted chains missing from hops 2/3 ($byHop)")
      // reached docs are unique (min-hop aggregation collapsed re-visits)
      assert(rep.map(_._1).distinct.length == rep.length, s"$d: dup docs")
    }
  }
}

/** t40 value checks: JS bounds (0 ≤ js ≤ ln 2) and a full independent
  * recomputation of one source's divergence in plain Scala from the raw
  * token counts — the decimal-summed closed form must agree with the
  * naive full-vocabulary double sum to the output's rounding grain. */
class T40DivergenceSpec extends SparkSpec {

  test("t40: bounds hold and one source recomputes independently") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rep = TextOps.queries("t40_source_divergence")(spark, d)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(rep.nonEmpty)
      val ln2 = 0.6931471805599453
      rep.foreach { case (src, js) =>
        assert(js >= 0.0 && js <= ln2, s"$d $src: js $js outside [0, ln2]")
      }
      // independent recompute for the lexicographically first source:
      // naive JS over the FULL corpus vocabulary (zero-count tokens
      // included explicitly), no decimal trick, no closed-form tail
      val src0 = rep.keySet.min
      val counts = graft.Tables(spark, d, "documents")
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokenize(
            col("text"), "space")).as("token"))
        .groupBy("source", "token").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val corpus = counts.groupMapReduce(_._1._2)(_._2)(_ + _)
      val n = corpus.values.sum.toDouble
      val ns = counts.collect { case ((s0, _), c) if s0 == src0 => c }.sum
        .toDouble
      val js = corpus.map { case (tok, cc) =>
        val p = counts.getOrElse((src0, tok), 0L) / ns
        val q = cc / n
        val m = (p + q) / 2.0
        (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
          0.5 * q * math.log(q / m)
      }.sum
      assert(math.abs(rep(src0) - js) <= 2e-6,
        s"$d $src0: gate ${rep(src0)} vs naive $js")
    }
  }
}
