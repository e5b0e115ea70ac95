package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rep-accounting invariants for the bench measurement policy (r17 —
  * VERDICT r16 items 1-3): the official artifact must never keep a time
  * its own machinery disproved. Pure-policy tests — no SparkSession, no
  * 234-query suite run.
  *
  * The r16 failure these pin down: four 0.3-0.8 s queries, inflated by a
  * contention window, were (a) demoted "heavy" on absolute seconds alone,
  * (b) thereby exempted from the stall-retry, and (c) three of them were
  * re-measured faster by the superlinear confirmation pass — whose reps
  * were then DISCARDED from `sec`. ~91 s of phantom time in the official
  * 301.6 s total.
  */
class BenchPolicySpec extends AnyFunSuite {

  // --- demotion rule (unchanged r16 semantics) ------------------------

  test("demote requires warmup AND first rep both over the cutoff") {
    assert(BenchPolicy.demote(Some(6.0), 6.5, 5.0))
    assert(!BenchPolicy.demote(Some(6.0), 0.4, 5.0), "fast first rep → not heavy")
    assert(!BenchPolicy.demote(Some(0.4), 6.5, 5.0), "fast warmup → not heavy")
    assert(!BenchPolicy.demote(None, 6.5, 5.0), "no warmup → no demotion evidence")
  }

  // --- intrinsic-weight veto (r16 verdict item 2) ---------------------

  test("veto overturns demotion when sf0.01 time is under cutoff/10") {
    // r16 driver conditions: t25's scale_sec was 0.59 s (close3: 0.27 s
    // query), yet it was demoted at 19.1 s — sub-second on 10× less data
    // is not intrinsically heavy at 5 s+
    assert(BenchPolicy.falseHeavy(Some(0.27), 5.0))
    assert(BenchPolicy.falseHeavy(Some(0.49), 5.0))
  }

  test("veto stands down for genuinely heavy queries (f13/f14 class)") {
    // f13's sf0.01 lifecycle still costs seconds — demotion is correct
    assert(!BenchPolicy.falseHeavy(Some(2.8), 5.0))
    assert(!BenchPolicy.falseHeavy(Some(0.5), 5.0), "boundary: exactly cutoff/10 is not a veto")
  }

  test("no scale signal → no veto (old behavior preserved)") {
    assert(!BenchPolicy.falseHeavy(None, 5.0))
    assert(!BenchPolicy.falseHeavy(Some(0.0), 5.0), "a zero/failed scale rep is not evidence")
    assert(!BenchPolicy.falseHeavy(Some(-1.0), 5.0))
  }

  // --- rep folding (r16 verdict item 1) -------------------------------

  test("sec is the min over ALL passes — confirmation reps fold in") {
    // r16 t26: first-pass reps pinned at ~22 s by contention; the
    // confirmation pass measured 4.4 s and was discarded. Folded, the
    // reported sec must be the confirmation min.
    val first = Seq(22.0, 22.5)
    val confirm = Seq(4.4, 4.6, 4.5)
    assert(BenchPolicy.bestOf(Seq(first, confirm)).contains(4.4))
  }

  test("a stalled retry pass cannot raise sec above the first-pass min") {
    assert(BenchPolicy.bestOf(Seq(Seq(0.5, 0.6), Seq(9.0, 9.1, 9.2))).contains(0.5))
  }

  test("no reps from any pass → no sec (failure sentinel upstream)") {
    assert(BenchPolicy.bestOf(Seq(Seq.empty, Seq.empty)).isEmpty)
  }

  // --- ambient-drift flag (r16 verdict item 3) ------------------------

  test("suspect_ambient flags a >3x-prior reading with >1s absolute gap") {
    // r16 v40: 18.4 s against a prior-round 0.7 s — ratio 26, invisible
    // to the superlinear radar (scale ratio 8.1 < 12)
    assert(BenchPolicy.suspectAmbient(18.4, Some(0.7), superlinear = false))
  }

  test("suspect_ambient ignores sub-second jitter and missing priors") {
    assert(!BenchPolicy.suspectAmbient(0.09, Some(0.02), superlinear = false),
      "4.5x on a 70ms gap is jitter, not drift")
    assert(!BenchPolicy.suspectAmbient(18.4, None, superlinear = false))
    assert(!BenchPolicy.suspectAmbient(2.0, Some(0.8), superlinear = false), "under 3x")
  }

  test("a confirmed-superlinear query is a plan regression, not ambient") {
    assert(!BenchPolicy.suspectAmbient(18.4, Some(0.7), superlinear = true))
  }

  // --- prior-detail parsing -------------------------------------------

  test("parsePrevDetail reads sf and per-query sec from a committed BENCH_DETAIL") {
    val json =
      """{"metric":"total","value":219.0,"unit":"sec","sf":"/root/testdata/sf0.1","cpus":32,""" +
        """"scale_sf":"/root/testdata/sf0.01","superlinear":[],"includes_index_build":["f13_facade_serving"],""" +
        """"queries":{"t25_lang_id":{"reps":[0.270000,0.310000],"retry_reps":[0.280000],""" +
        """"sec":0.270000,"prep_sec":0.001000,"exec_sec":0.269000,"warm_sec":0.400000,""" +
        """"scale_sec":0.120000,"scale_ratio":2.250000},""" +
        """"f13_facade_serving":{"reps":[12.600000,13.100000],"sec":12.600000,""" +
        """"prep_sec":11.830000,"exec_sec":0.770000,"heavy":true}}}"""
    val (sf, secs) = BenchPolicy.parsePrevDetail(json)
    assert(sf.contains("/root/testdata/sf0.1"))
    assert(secs == Map("t25_lang_id" -> 0.27, "f13_facade_serving" -> 12.6))
  }

  test("parsePrevDetail tolerates garbage — drift is advisory, never fatal") {
    assert(BenchPolicy.parsePrevDetail("not json at all")._2.isEmpty)
    assert(BenchPolicy.parsePrevDetail("")._2.isEmpty)
  }
}
