package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention instrument's pure parts (no Spark): the
  * proportional-drift flag must fire on a synthetic slow-calibration
  * replay — every sample uniformly elevated, max/min spread quiet —
  * and stay silent on the committed quiet closing pairs
  * (VERDICT r10 #5). */
class BenchInstrumentSpec extends AnyFunSuite {

  // the committed quiet constant (bench/box_constant.json)
  private val box = Some(0.455)

  test("quiet closing pairs stay under the 1.2x drift threshold") {
    // the actual r10 quiet-pair samples (bench_r10_close_a/b)
    val quietA = Seq(0.543, 0.507, 0.506, 0.457, 0.4, 0.405, 0.463,
      0.582, 0.42)
    val quietB = Seq(0.58, 0.488, 0.501, 0.442, 0.454, 0.415, 0.447,
      0.445, 0.407)
    for (q <- Seq(quietA, quietB)) {
      val r = Bench.calVsBox(q, box).get
      assert(r <= 1.2, s"quiet pair flagged: ratio $r")
      // and the spread test stays quiet too — no regression there
      assert(q.max / q.min <= 1.5)
    }
  }

  test("synthetic proportional drift fires the flag even though " +
    "max/min spread stays under 1.5") {
    // every sample uniformly ~25% above the box constant: the exact
    // shape the max/min test cannot see (spread 1.17 < 1.5)
    val drifted = Seq(0.58, 0.55, 0.57, 0.60, 0.56, 0.62, 0.55, 0.59,
      0.58)
    assert(drifted.max / drifted.min < 1.5,
      "replay must be invisible to the spread test to prove the point")
    val r = Bench.calVsBox(drifted, box).get
    assert(r > 1.2, s"drift replay must fire: ratio $r")
  }

  test("median and missing-constant behavior") {
    assert(Bench.calMedian(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.calMedian(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    // no committed constant → no ratio, never a spurious flag
    assert(Bench.calVsBox(Seq(1.0, 2.0), None).isEmpty)
    assert(Bench.calVsBox(Seq(1.0), Some(0.0)).isEmpty)
  }

  test("readBoxConstant parses the committed file and tolerates absence") {
    val repo = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    val got = Bench.readBoxConstant(s"$repo/bench/box_constant.json")
    assert(got.contains(0.455))
    assert(Bench.readBoxConstant("/nonexistent/nope.json").isEmpty)
  }

  test("noisy-row spread trigger (VERDICT r14 #2): fires on the r14 " +
    "pagerank-shaped pair, not on tight pairs, errors, or fast rows") {
    def R(t: Double): Either[String, Double] = Right(t)
    // the literal r14 100x artifact pair that motivated the trigger
    assert(Bench.spreadSuspect(Seq(R(171.6), R(64.1))))
    assert(Bench.passSpread(Seq(R(171.6), R(64.1))).get > 2.5)
    // tight pair: below the ratio — quiet
    assert(!Bench.spreadSuspect(Seq(R(60.0), R(64.1))))
    // exactly at the ratio boundary: > is strict
    assert(!Bench.spreadSuspect(Seq(R(25.0), R(10.0))))
    assert(Bench.spreadSuspect(Seq(R(25.1), R(10.0))))
    // sub-second JIT jitter spans 2.5x routinely — the absolute floor
    // keeps such rows out of the net (SpreadMinSec)
    assert(!Bench.spreadSuspect(Seq(R(0.08), R(0.31))))
    // a lone time (other pass errored) has no spread — the salvage
    // path owns that case, not this trigger
    assert(!Bench.spreadSuspect(Seq(R(64.1), Left("boom"))))
    assert(Bench.passSpread(Seq(R(64.1), Left("boom"))).isEmpty)
    // errors among MORE than two times don't block the trigger
    assert(Bench.spreadSuspect(Seq(R(171.6), Left("boom"), R(64.1))))
  }

  test("spread re-measure selection is capped at the widest spreads " +
    "with deterministic ties (ADVICE r15 #4)") {
    // under the cap: everything selected, order by spread desc
    val few = Seq("a" -> 3.0, "b" -> 5.0)
    assert(Bench.spreadRemeasureSelect(few) == Seq("b", "a"))
    // over the cap: only the widest SpreadRemeasureCap re-run; ties
    // broken by name so reruns are reproducible across invocations
    val many = (1 to 20).map(i => f"q$i%02d" -> (if (i <= 10) 9.0 else 3.0))
    val sel = Bench.spreadRemeasureSelect(many)
    assert(sel.size == Bench.SpreadRemeasureCap)
    assert(sel == (1 to Bench.SpreadRemeasureCap).map(i => f"q$i%02d"))
    assert(Bench.spreadRemeasureSelect(Nil).isEmpty)
  }

  test("a failed instrument re-run does not flip a battery-clean row " +
    "to flaky (ADVICE r15 #1)") {
    def R(t: Double): Either[String, Double] = Right(t)
    // both battery passes succeeded; the isolated re-measure's first
    // extra pass died — the row must NOT count as flaky, but the
    // failed pass must stay visible in the artifact's pass list
    val q = Bench.QueryResult(R(10.0), Seq(R(30.0), R(10.0)),
      extra = Seq(Left("ExecutorLost"), R(9.8)))
    assert(!q.flaky)
    assert(q.allPasses.size == 4 && q.allPasses.count(_.isLeft) == 1)
    // a battery-pass failure (the salvage path) still counts
    val salvaged = Bench.QueryResult(R(10.0),
      Seq(Left("boom"), R(10.0), R(11.0)))
    assert(salvaged.flaky)
  }

  test("bandwidth leg uses the wider threshold (ADVICE r14 #3): a " +
    "quiet run whose median lands at 0.36 must NOT flag") {
    val bwBox = Some(0.30)
    // genuinely quiet run at the top of the observed within-run span
    val quietHigh = Seq(0.34, 0.36, 0.38, 0.37, 0.37)
    val r = Bench.calVsBox(quietHigh, bwBox).get
    assert(r > 1.2, "the case only matters because 1.2 would flag it")
    assert(r <= Bench.BandwidthSuspectRatio,
      s"quiet-high bandwidth median false-flagged: ratio $r")
    // sustained genuine bandwidth starvation still fires
    val starved = Seq(0.55, 0.52, 0.58, 0.54, 0.56)
    assert(Bench.calVsBox(starved, bwBox).get > Bench.BandwidthSuspectRatio)
  }

  test("degradation-normalized record screen (VERDICT r17 missing #2): " +
    "flags a 3x row inside a uniformly 2x-inflated field, stays " +
    "silent on the uniform field itself") {
    // 20 recorded queries, quiet records of assorted sizes
    val records = (1 to 20).map(i => s"q_$i" -> (1.0 + i * 0.1)).toMap

    // uniformly degraded session: every row at 2.0x its record —
    // the absolute 2.5x screen reads empty AND so must this one
    val uniform = records.toSeq.map { case (n, r) => n -> r * 2.0 }
    val (medU, flaggedU) = Bench.normalizedSlow(uniform, records)
    assert(medU.exists(m => math.abs(m - 2.0) < 1e-9), s"median: $medU")
    assert(flaggedU.isEmpty,
      s"uniform 2x field must not flag: $flaggedU")

    // same field with ONE genuine plan regression: q_7 at 3x its
    // record = 1.5x the field median. In r16/r17's real 1.19-1.52x
    // fields the same field-relative regression sits at ~1.8-2.3x
    // absolute — under the absolute screen's 2.5x cut — so only the
    // field-normalized view can see it
    val oneSlow = uniform.map { case (n, v) =>
      if (n == "q_7") n -> records(n) * 3.0 else n -> v }
    val (medS, flaggedS) = Bench.normalizedSlow(oneSlow, records)
    assert(medS.exists(m => math.abs(m - 2.0) < 1e-9))
    assert(flaggedS.map(_._1) == Seq("q_7"),
      s"expected exactly q_7 flagged: $flaggedS")
    assert(math.abs(flaggedS.head._2 - 1.5) < 1e-9,
      s"normalized ratio should be 3.0/2.0 = 1.5: ${flaggedS.head._2}")

    // sub-second rows are excluded from FLAGGING (jitter spans 2-3x)
    // even though they inform the median
    val tiny = Map("q_t" -> 0.2) ++ records
    val tinyRun = (("q_t" -> 0.9) +: uniform) // 4.5x its record, but 0.9s
    val (_, flaggedT) = Bench.normalizedSlow(tinyRun, tiny)
    assert(!flaggedT.exists(_._1 == "q_t"),
      s"sub-second row must not flag: $flaggedT")

    // below NormalizedMinRows recorded rows the screen stays silent
    val few = (1 to 5).map(i => s"q_$i" -> 1.0)
    val (medF, flaggedF) = Bench.normalizedSlow(
      few.map { case (n, _) => n -> 9.0 },
      few.toMap)
    assert(medF.isEmpty && flaggedF.isEmpty,
      "too few recorded rows for a meaningful field median")
  }
}
