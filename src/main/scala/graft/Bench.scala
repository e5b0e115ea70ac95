package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Measurement POLICY, extracted pure so the rep-accounting invariants are
  * spec-testable without running the 234-query suite (see BenchPolicySpec).
  * The r16 driver artifact carried ~91 s of phantom time (t23/t25/t26/v40 —
  * 0.3–0.8 s queries read at 18–32 s) because policy lived inline in `main`
  * with two holes: (a) the superlinear confirmation pass re-measured
  * suspects but DISCARDED its faster reps instead of folding them into
  * `sec`, and (b) heavy-demotion keyed on absolute seconds only, so
  * sustained host contention could demote an ordinary sub-second query and
  * exempt it from the stall-retry that exists to fix exactly that. Both
  * rules now live here, with the already-measured sf0.01 time as the
  * intrinsic-weight signal. */
object BenchPolicy {
  /** Heavy demotion candidate: warmup AND the first timed rep both over the
    * cutoff (BOTH must agree — one window can't tell intrinsic weight from
    * a landed stall). */
  def demote(warmSec: Option[Double], firstRepSec: Double, cutoff: Double): Boolean =
    warmSec.exists(_ > cutoff) && firstRepSec > cutoff

  /** Intrinsic-weight VETO (r17): a query that runs in under cutoff/10 on
    * ~10× less data is not intrinsically heavy at cutoff+ seconds — its
    * demotion was a contention artifact, and it must get the stall-retry
    * demotion exempted it from. `scale_sec` is already measured by the
    * scaling pass, so the veto costs nothing when the scale dir is absent
    * (no signal → no veto → old behavior). */
  def falseHeavy(scaleSec: Option[Double], cutoff: Double): Boolean =
    scaleSec.exists(s => s > 0 && s < cutoff / 10)

  /** The reported `sec` is the min over EVERY timed rep from EVERY pass —
    * first pass, stall-retry, veto-retry, AND the superlinear-confirmation
    * pass. Confirmation reps are valid warm reps of the same query on the
    * same data; discarding them kept times the bench itself had disproved
    * (r16: t25 19.1 s reported beside a ≤7 s confirmed re-measure). */
  def bestOf(passes: Seq[Seq[Double]]): Option[Double] = {
    val all = passes.flatten
    if (all.isEmpty) None else Some(all.min)
  }

  /** Ambient-drift suspect: current best > 3× the prior committed round's
    * best for the same query at the same sf, with an absolute gap over a
    * second (sub-second jitter is not drift), and NOT already flagged
    * superlinear (a real plan regression should surface as superlinear,
    * not be explained away as ambient). Advisory — the flag feeds the
    * drift adjudication that was previously manual and builder-side only;
    * r16's v40 (26× its prior reading, under the superlinear radar at
    * ratio 8.1) is exactly the class this catches. */
  def suspectAmbient(cur: Double, prev: Option[Double], superlinear: Boolean): Boolean =
    !superlinear && prev.exists(p => p > 0 && cur > 3 * p && cur - p > 1.0)

  /** Parse (sf, per-query best sec) out of a committed BENCH_DETAIL.json
    * without a JSON library: the top-level "sf" is the first such key, and
    * every query object is brace-flat, so a lazy non-brace span between its
    * "reps" array and its "sec" field is unambiguous. Returns an empty map
    * on any malformed input — drift comparison is advisory and must never
    * cost the run. */
  def parsePrevDetail(json: String): (Option[String], Map[String, Double]) =
    try {
      val sf = """"sf":"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
      val q = """"([A-Za-z0-9_]+)":\{"reps":\[[^\]]*\][^{}]*?"sec":([0-9.eE+\-]+)""".r
      (sf, q.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toDouble).toMap)
    } catch { case _: Throwable => (None, Map.empty) }
}

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query gets one untimed-but-recorded warmup run (codegen/JIT/
  * parquet footers) and up to three timed runs, reporting the MINIMUM over
  * ALL passes that touched it (first pass, stall-retry, veto-retry,
  * superlinear-confirmation); each run materializes the full result
  * through a `noop` sink so the measurement is end-to-end compute, not
  * `count()`'s column-pruned shortcut. The host VM has multi-second
  * scheduler noise (observed 5-10× on identical warm queries) —
  * min-of-reps is the only stable estimator here; a single timed rep
  * produced the round-1 phantom outliers (e1 70 s, t2 31 s for sub-second
  * plans). Rep counts are SELF-SIZING (r16, after the r15 driver bench
  * outgrew its window): a query whose warmup AND first rep both exceed the
  * heavy cutoff stops at two warm reps (intrinsically heavy — no
  * stall-retry); a query whose first two reps agree tightly skips the
  * third. r17 adds the intrinsic-weight veto: a demoted query whose sf0.01
  * time is under cutoff/10 was a contention victim, not a lifecycle query
  * — it gets the stall-retry back (see BenchPolicy).
  *
  * Two artifacts per run:
  *   - stdout: the contract line above, with values at 2-3 dp — the full
  *     line must fit the driver's ~2 KiB stdout-tail capture or it is
  *     head-truncated and unparseable (this is what broke BENCH_r02/r03) —
  *     plus an `exec` map surfacing the build/search split for the
  *     `includes_index_build` queries shown in the line (f13's 12 s reads
  *     as the suite's slowest query when its serve is 0.8 s);
  *   - `BENCH_DETAIL.json` (cwd): full-precision PER-REP times for every
  *     query, all passes, so a VM stall is distinguishable from a real
  *     regression after the fact — plus, when a second scale factor is
  *     available, per-query `scale_sec`/`scale_ratio` against ~10× less
  *     data and a `superlinear` flag list (ratio > 12 on a 10× data step
  *     means the plan would not survive a 100× scale-up), a
  *     `prep_sec`/`exec_sec` split of the best rep isolating index
  *     build+write (eager, at construction) from search execution for
  *     the `includes_index_build` queries, and (r17) `prev_sec` /
  *     `suspect_ambient` drift fields against the last committed
  *     BENCH_DETAIL.json at the same sf — automating the previously
  *     manual baseline-comparison protocol of BENCH_DRIFT_r*.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // second scale factor for the scaling check (≈10× less data than sf0.1):
    // per-query time ratio sf0.1/sf0.01 ≈ 10 means linear in data, ≈1 means
    // overhead-dominated; >> 10 flags a super-linear plan — the cheap local
    // proxy for "would this survive a 100× scale-up".
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The suite's three BY-DESIGN bounded unpartitioned windows (v24's
    // ≤C-row rank arms, t16's bucket table) each emit a WindowExec WARN
    // per execution — 250+ stderr lines per bench run that invite
    // misdiagnosis of deliberate plans. Silence exactly that logger; a
    // GENUINELY unpartitioned corpus window would still show up as a
    // scaling flag, which is the signal that matters.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    // Prior committed round's per-query detail, read BEFORE this run
    // overwrites the file: feeds the automated drift comparison. Only
    // comparable when the prior run was at the same sf.
    val sfName = new java.io.File(sfDir).getName
    val (prevSfOpt, prevSecRaw) = {
      val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
      if (java.nio.file.Files.isReadable(p))
        BenchPolicy.parsePrevDetail(java.nio.file.Files.readString(p))
      else (None, Map.empty[String, Double])
    }
    val prevSec: Map[String, Double] =
      if (prevSfOpt.map(s => new java.io.File(s).getName).contains(sfName)) prevSecRaw
      else Map.empty

    /** One rep, split at the construction/execution boundary: the
      * index-building queries (see `includesBuild` below) run their build
      * write EAGERLY while the query function constructs the result
      * DataFrame, and the returned plan reads the built artifact — so
      * `prep` isolates build(+planning) from `exec`, the search execution,
      * with zero operator changes. For non-building queries `prep` is
      * just plan construction (~ms). */
    def runOnce(name: String, dir: String): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    def totalOf(r: (Double, Double)): Double = r._1 + r._2

    // HEAVY demotion (r16, the bench-gate fix): the r15 driver bench
    // TIMED OUT (rc 124) because the new lifecycle queries pay tens of
    // seconds PER REP (f13's cold first pass: 62 s) and then hit the
    // stall-retry (4 more runs) — one query consumed ~4 min of the
    // driver window. A query whose WARMUP and FIRST TIMED REP both
    // exceed the cutoff is a lifecycle/build query, not a stall victim:
    // it stops at TWO warm reps (min-of-2 — one window can't tell
    // intrinsic weight from a landed stall), skips the stall-retry
    // (its slowness is intrinsic, and the retry's median trigger would
    // always fire on it), and its warm-up time is recorded in
    // BENCH_DETAIL (`warm_sec`) so the drift adjudication reads
    // provenance, not a mystery. Cutoff overridable for testing.
    // r17: demotion is PROVISIONAL until the scaling pass — see the
    // intrinsic-weight veto below.
    val heavyCutoff = sys.env.get("SPARK_GRAFT_HEAVY_CUTOFF_SEC")
      .flatMap(_.toDoubleOption).filter(_ > 0).getOrElse(5.0)

    /** 1 untimed-but-recorded warmup + up to `reps` timed runs; empty
      * reps on failure. Two self-sizing rules cut suite wall-clock
      * without cutting fidelity where it matters:
      *   - warmup > heavyCutoff AND the first timed rep > heavyCutoff
      *     TOO (BOTH must agree the query is intrinsically heavy — the
      *     first deployed rule confirmed at cutoff/2 and promptly locked
      *     a contention-inflated 9 s rep in for a steady-state-1.5 s
      *     build query) → stop after a SECOND rep (min-of-2: one rep
      *     can't tell "intrinsically slow" from "stall landed here";
      *     two independent windows make a single stall survivable at a
      *     fraction of the old 3-reps+retry cost);
      *   - the third rep is SKIPPED when the first two already agree
      *     (min < 1 s and spread ≤ 30% of min): two tight sub-second
      *     reps mean no stall landed, and the stall-retry pass still
      *     backstops the case where one hit both. */
    def timedReps(name: String, reps: Int, dir: String = sfDir,
                  warmup: Boolean = true): (Option[Double], Seq[(Double, Double)]) =
      try {
        val w = if (warmup) Some(totalOf(runOnce(name, dir))) else None
        val r1 = runOnce(name, dir)
        val out =
          if (reps <= 1) Seq(r1)
          else {
            val r2 = runOnce(name, dir)
            val demoted = BenchPolicy.demote(w, totalOf(r1), heavyCutoff)
            val ts = Seq(totalOf(r1), totalOf(r2))
            if (demoted || reps <= 2 ||
                (ts.min < 1.0 && ts.max - ts.min <= 0.3 * ts.min))
              Seq(r1, r2)
            else Seq(r1, r2) ++ (3 to reps).map(_ => runOnce(name, dir))
          }
        (w, out)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (None, Seq.empty)
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val firstPass: Seq[(String, (Option[Double], Seq[(Double, Double)]))] =
      names.map(n => n -> timedReps(n, 3))
    val warmSec: Map[String, Option[Double]] = firstPass.map { case (n, (w, _)) => n -> w }.toMap
    // heavy candidates = warmup AND the first timed rep both over the
    // cutoff (the min-of-2 demotion above) — exempt from the stall-retry
    // below, PENDING the scale-pass veto
    val heavyRaw: Set[String] = firstPass.collect {
      case (n, (w, rs)) if BenchPolicy.demote(w, rs.headOption.map(totalOf).getOrElse(0.0), heavyCutoff) &&
          rs.length <= 2 => n
    }.toSet
    val baseReps: Map[String, Seq[(Double, Double)]] =
      firstPass.map { case (n, (_, rs)) => n -> rs }.toMap

    // A host-VM stall lasting a few seconds swallows all timed reps of
    // whatever query it lands on (observed: a 0.3 s query reported at
    // 19 s). Second chance: anything >3× the median gets re-measured
    // later, when the stall has passed — WITHOUT a fresh warmup (the
    // query is warm; the r15 retry's extra warmup run bought nothing)
    // — keeping the min of both passes. Heavy candidates are exempt
    // here; the ones the scale pass vetoes get their retry back below.
    val mins = baseReps.values.collect { case rs if rs.nonEmpty => rs.map(totalOf).min }.toSeq.sorted
    val median = if (mins.isEmpty) 0.0 else mins(mins.length / 2)
    val retryPass: Map[String, Seq[(Double, Double)]] = names.collect {
      case n if baseReps(n).nonEmpty && median > 0 && !heavyRaw(n) &&
          baseReps(n).map(totalOf).min > 3 * median =>
        n -> timedReps(n, 3, warmup = false)._2
    }.toMap

    def d2(v: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(v))
    // 2 dp with trailing zeros stripped ("0.50"→"0.5", "1.00"→"1") — the
    // contract line must fit the driver's 2000-char stdout-tail window
    // minus sbt's fixed "[success] ..." trailer, and query names dominate;
    // this claws back ~1 B per query of headroom for suite growth.
    def d2t(v: Double): String = {
      val s = d2(v)
      if (!s.contains('.')) s
      else {
        val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
        if (t.isEmpty || t == "-") "0" else t
      }
    }
    def d3(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
    def dFull(v: Double): String = String.format(Locale.ROOT, "%.6f", Double.box(v))

    // Scaling pass: same queries at the smaller sf, 1 timed rep — this
    // pass wants the RATIO'S order of magnitude, not a tight estimate,
    // and it rides inside the driver's bench timeout budget. A VM stall
    // here only INFLATES the small-sf time, which lowers the ratio — it
    // can never false-flag a query as super-linear. A query whose time
    // ratio far exceeds the 10× data ratio has a super-linear plan;
    // overhead-dominated sub-second queries sit near 1.
    val doScaling = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(scaleDir)) &&
      scaleDir != sfDir
    // no warmup on the scale pass (the code paths are hot from the main
    // pass; only the small SF's parquet footers are cold): halves the
    // pass's run count as the suite grows, and a footer-cold small-sf
    // time only LOWERS the ratio — it can never false-flag, and a real
    // super-linear plan still reproduces in the confirmation pass
    val scalePass: Map[String, Double] =
      if (!doScaling) Map.empty
      else names.flatMap(n =>
        timedReps(n, 1, scaleDir, warmup = false)._2.map(totalOf).minOption.map(n -> _)).toMap

    // Intrinsic-weight VETO (r17, the phantom-time fix): a demoted query
    // whose sf0.01 time is under cutoff/10 was a contention victim, not a
    // lifecycle query (r16 driver run: four 0.3-0.8 s queries demoted at
    // 18-32 s, ~91 s of phantom time in the official total). It gets the
    // stall-retry demotion exempted it from — 3 fresh warm reps, minutes
    // after the contention window, folded into `sec`. Without a scale dir
    // there is no intrinsic signal and the demotion stands (old behavior).
    val vetoed: Set[String] =
      heavyRaw.filter(n => BenchPolicy.falseHeavy(scalePass.get(n), heavyCutoff))
    val vetoRetry: Map[String, Seq[(Double, Double)]] = vetoed.toSeq.sorted.map { n =>
      System.err.println(s"[bench] heavy-demotion VETOED for $n " +
        s"(scale_sec ${scalePass.get(n).map(d2).getOrElse("?")} < ${d2(heavyCutoff / 10)}) — retrying")
      n -> timedReps(n, 3, warmup = false)._2
    }.toMap
    val heavy = heavyRaw -- vetoed

    // Preliminary best (pre-confirmation): everything measured so far.
    def prelimReps(n: String): Seq[(Double, Double)] =
      baseReps(n) ++ retryPass.getOrElse(n, Nil) ++ vetoRetry.getOrElse(n, Nil)
    val prelimBest: Map[String, Double] = names.map(n =>
      n -> prelimReps(n).map(totalOf).minOption.getOrElse(-1.0)).toMap

    // A flag must survive a CONFIRMATION re-measurement before it is
    // raised: the large-sf side is a min over 3-6 reps, but a sustained
    // host-VM contention stretch (observed: a 0.5 s map-only query
    // pinned at 2.9 s through all 6 reps, then back to 0.5 s minutes
    // later — the round-6 t1/t3/t5/t9 false flags) defeats min-of-reps.
    // Re-measuring ONLY the suspects, minutes later in the run, costs a
    // few seconds and kills the transient; a real super-linear plan
    // (the thing this check exists to catch) reproduces on every pass.
    // Threshold overridable (SPARK_GRAFT_SCALE_FLAG_RATIO, default 12 on
    // the ~10× data step) so the flag→confirm path can be exercised on
    // purpose at small scale.
    // Malformed/garbage values fall back LOUDLY instead of throwing after
    // all timing work but before any artifact is written (NaN or ≤0 would
    // silently disable/garble the flag; a non-number used to lose the run).
    val flagRatio = sys.env.get("SPARK_GRAFT_SCALE_FLAG_RATIO") match {
      case None => 12.0
      case Some(raw) => raw.toDoubleOption.filter(r => r > 0 && !r.isNaN).getOrElse {
        System.err.println(
          s"[bench] SPARK_GRAFT_SCALE_FLAG_RATIO='$raw' is not a positive number — using 12.0")
        12.0
      }
    }
    val suspectRatio = names.filter(n =>
      prelimBest(n) > 0 && scalePass.get(n).exists(s => s > 0 && prelimBest(n) / s > flagRatio))
    if (suspectRatio.nonEmpty)
      System.err.println(s"[bench] scaling suspects (pre-confirmation): ${suspectRatio.sorted.mkString(", ")}")
    // Confirmation reps are valid warm reps of the same query on the same
    // data — they FOLD INTO `reps`/`sec` below (r17; the r16 artifact kept
    // a 19 s reading its own ≤7 s confirmation re-measure had disproved).
    val confirmPass: Map[String, Seq[(Double, Double)]] = suspectRatio.map { n =>
      // warm already, no fresh warmup; a genuinely super-linear plan
      // (heavy or not) deserves the full 3-rep confirmation
      n -> timedReps(n, 3, warmup = false)._2
    }.toMap

    // FINAL accounting: sec == min over every timed rep from every pass.
    val allReps: Map[String, Seq[(Double, Double)]] = names.map(n =>
      n -> (prelimReps(n) ++ confirmPass.getOrElse(n, Nil))).toMap
    val bestRep: Map[String, (Double, Double)] = allReps.map { case (n, rs) =>
      n -> (if (rs.isEmpty) (-1.0, 0.0) else rs.minBy(totalOf))
    }
    val results: Seq[(String, Double)] = names.map { n =>
      val b = bestRep(n)
      n -> (if (b._1 < 0) -1.0 else totalOf(b))
    }
    val resultMap = results.toMap
    val total = results.map(_._2).filter(_ >= 0).sum

    val confirmed: Map[String, Double] = suspectRatio.flatMap { n =>
      val best = resultMap(n)
      scalePass.get(n).collect { case s if s > 0 && best / s > flagRatio => n -> best / s }
    }.toMap
    val superLinear = confirmed.keys.toSeq.sorted
    superLinear.foreach(n => System.err.println(
      s"[bench] SCALING FLAG: $n ratio ${d2(confirmed(n))} > $flagRatio confirmed on re-measure (data ratio ~10)"))

    // Automated drift comparison (r17): prior committed round's sec per
    // query, plus a suspect_ambient flag when this run reads >3× the prior
    // (and >1 s absolute) without a superlinear confirmation — the class
    // of reading (r16's v40, 26× prior, scale ratio 8.1) that is invisible
    // to both the median stall-retry and the superlinear radar.
    val ambient: Set[String] = names.filter(n =>
      BenchPolicy.suspectAmbient(resultMap(n), prevSec.get(n), confirmed.contains(n))).toSet
    if (ambient.nonEmpty)
      System.err.println(s"[bench] ambient-drift suspects vs prior round: ${ambient.toSeq.sorted.mkString(", ")}")

    // Full-precision per-rep detail — survives even though stdout is
    // tail-truncated by the driver's capture. `prep_sec`/`exec_sec` split
    // the best rep at the construction/execution boundary: for the
    // `includes_index_build` queries prep IS the index build+write, so
    // exec_sec is the true query latency the contract number obscures.
    val detail = names.map { n =>
      // `reps` holds EVERY timed rep that fed this query's reported `sec`
      // (first pass ++ stall-retry ++ veto-retry ++ confirmation), so
      // sec == min(reps) always — the spread-rule drift audit reads
      // `reps` alone, and a later pass that produced the min must not
      // leave `reps` showing only the stalled pass (the r14 d20 anomaly:
      // reps 6.99/17.15/43.19 beside sec 2.43). `retry_reps` /
      // `veto_reps` / `confirm_reps` still mark WHICH reps came from
      // which pass. `warm_sec` records the untimed warmup; `heavy:true`
      // marks a query demoted to TWO warm timed reps (drift adjudication
      // must read its reps as warm min-of-2, not min-of-3-plus-retry);
      // `heavy_vetoed:true` marks a demotion the scale pass overturned
      // (its reps include the restored retry).
      def passJson(key: String, m: Map[String, Seq[(Double, Double)]]): String =
        m.get(n).filter(_.nonEmpty)
          .map(r => s""","$key":[${r.map(totalOf).map(dFull).mkString(",")}]""").getOrElse("")
      val reps = allReps(n)
      val best = resultMap(n)
      val (prep, exec) = bestRep(n)
      val scale = scalePass.get(n).map(s =>
        s""","scale_sec":${dFull(s)},"scale_ratio":${dFull(if (s > 0) best / s else -1.0)}""").getOrElse("")
      val warm = warmSec.getOrElse(n, None)
        .map(w => s""","warm_sec":${dFull(w)}""").getOrElse("")
      val heavyTag =
        if (heavy(n)) ""","heavy":true"""
        else if (vetoed(n)) ""","heavy_vetoed":true"""
        else ""
      val prev = prevSec.get(n).map(p => s""","prev_sec":${dFull(p)}""").getOrElse("")
      val amb = if (ambient(n)) ""","suspect_ambient":true""" else ""
      s""""$n":{"reps":[${reps.map(totalOf).map(dFull).mkString(",")}]""" +
        passJson("retry_reps", retryPass) + passJson("veto_reps", vetoRetry) +
        passJson("confirm_reps", confirmPass) +
        s""","sec":${dFull(best)},""" +
        s""""prep_sec":${dFull(math.max(prep, 0.0))},"exec_sec":${dFull(exec)}$warm$heavyTag$prev$amb$scale}"""
    }.mkString("{", ",", "}")
    val superJson = superLinear.map("\"" + _ + "\"").mkString("[", ",", "]")
    val ambientJson = ambient.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // These queries rebuild + write their index artifact INSIDE the timed
    // region (build is part of their contract: the round-trip must be
    // reproducible from nothing), so their numbers are build+search, not
    // query latency — recorded so the artifact reader doesn't misread
    // them as slow searches.
    val includesBuildAll = Seq("v17_sq8_search", "v28_ivf_sq8", "v14b_ivf_trained_persist",
      "v14c_sampled_ivf_persist", "f13_facade_serving", "f14_facade_lsh_serving",
      "f15_bundle_roundtrip", "t33_jsonl_ingest",
      "v16b_filtered_ivf", "v16d_metadata_filter", "v16e_metadata_ivf",
      "v19c_ivfpq_persist",
      "d8_dedup_incremental", "f7_shard_manifest",
      "p1_lsh_persist_search", "p2_minhash_persist_pairs",
      "p3_ivf_persist_search", "p4_lsh_incremental", "p5_labels_persist")
      .filter(resultMap.contains)
    val includesBuild = includesBuildAll.map("\"" + _ + "\"").mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${dFull(total)},"unit":"sec","sf":"$sfDir","cpus":$cpus,""" +
        s""""scale_sf":${if (doScaling) "\"" + scaleDir + "\"" else "null"},"superlinear":$superJson,""" +
        s""""suspect_ambient":$ambientJson,""" +
        s""""includes_index_build":$includesBuild,"queries":$detail}""")

    // Contract line LAST, compact (2 dp per query — full precision is in
    // BENCH_DETAIL.json) so the driver's stdout-tail window holds the
    // ENTIRE line even with sbt's trailing status output. Keys are SHORT
    // names BY DESIGN — each query's unique leading token
    // ("v14b_ivf_trained_persist" → "v14b"; the full-name mapping is
    // recoverable from BENCH_DETAIL.json, whose keys share the tokens):
    // the 90+-query suite outgrew full names in round 6, and emitting a
    // tier that is known not to fit just to "degrade" from it printed
    // scary warnings on every healthy run. Short names hold ~150 queries
    // at 2 dp and ~185 at 1 dp; past that (round 11) the top-K tiers
    // keep the slowest queries individually and summarize the fast tail
    // (see topKLine). Only if every tier overflows does the run fail
    // loudly — a hard require would trade a coarser artifact for NO
    // artifact.
    // sf as basename ("sf0.1") — the full dir is in BENCH_DETAIL.json and
    // the driver records the sf itself; 16 fewer bytes of path buys one
    // more query at 2 dp
    val shortKeys: Map[String, String] = {
      val m = results.map { case (k, _) => k -> k.takeWhile(_ != '_') }.toMap
      require(m.values.toSeq.distinct.size == m.size,
        "query-name leading tokens collide — short-key contract tier would be ambiguous")
      m
    }
    // `exec` map (r17): the serve-side latency for the build-inclusive
    // queries whose headline number is build+search by contract — only
    // for queries individually present in the line's `queries` map, so
    // the tier budget self-sizes over it like everything else. Extra
    // top-level keys are additive for the driver's parser (the top-K
    // tier's fast_n/note fields already parse fine).
    def execJson(shown: Seq[String], fmt: Double => String): String = {
      val es = includesBuildAll.filter(shown.contains).flatMap { n =>
        val e = bestRep(n)._2
        if (resultMap(n) >= 0) Some("\"" + shortKeys(n) + "\":" + fmt(e)) else None
      }
      if (es.isEmpty) "" else es.mkString(""","exec":{""", ",", "}")
    }
    def contractLine(fmt: Double => String, key: String => String): String = {
      val qs = results.map { case (k, v) => "\"" + key(k) + "\":" + fmt(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs""" +
        execJson(results.map(_._1), fmt) + s""","sf":"$sfName"}"""
    }
    def d1t(v: Double): String = {
      val s = String.format(Locale.ROOT, "%.1f", Double.box(v))
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    // driver window is 2000 chars; sbt's trailing "[success] ..." line
    // consumes ~77 — 1920 leaves a few bytes of slack
    val budget = 1920
    // Tier 3: the full flat map structurally outgrew the driver's 2000-char
    // stdout window at ~190 queries (199 × ~10 B of entry > the ~1845 B the
    // fixed fields leave), so the last tier keeps the SLOWEST K queries —
    // where per-query fidelity matters — individually, force-includes any
    // failure sentinel (-1 must never be summarized away), and collapses
    // the fast tail into self-describing aggregate fields (`fast_n`
    // queries, each ≤ `fast_max` s, summing to `fast_total` s). No silent
    // cap: the note names the companion artifact, and BENCH_DETAIL.json
    // (committed) carries full-precision reps for EVERY query regardless
    // of tier.
    def topKLine(k: Int): String = {
      val (fails, ok) = results.partition(_._2 < 0)
      val (slow, fast) = ok.sortBy(-_._2).splitAt(math.max(k - fails.length, 0))
      val inc = (fails ++ slow).sortBy(_._1)
      val qs = inc.map { case (n, v) => "\"" + shortKeys(n) + "\":" + d1t(v) }
        .mkString("{", ",", "}")
      val fastTotal = fast.map(_._2).sum
      val fastMax = fast.headOption.map(_._2).getOrElse(0.0)
      s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs""" +
        execJson(inc.map(_._1), d1t) + "," +
        s""""fast_n":${fast.length},"fast_total":${d2t(fastTotal)},"fast_max":${d2t(fastMax)},""" +
        s""""note":"slowest ${inc.length} shown; ${fast.length} fastest summarized, full detail in BENCH_DETAIL.json",""" +
        s""""sf":"$sfName"}"""
    }
    // Tier selection is SELF-SIZING on bytes, not query count: the flat
    // all-queries tiers are tried first (full fidelity while the suite is
    // small enough), and past that the top-K tier binary-searches the
    // LARGEST K whose line fits the budget — fidelity degrades by exactly
    // one query per suite addition instead of in fixed 40-query cliffs,
    // and a structurally-outgrown flat tier is expected, not a warning
    // (the round-11 runs printed two scary "degrading" lines per healthy
    // bench; the only loud path left is the impossible-fit failure).
    val flat = Seq(contractLine(d2t, shortKeys), contractLine(d1t, shortKeys))
      .find(_.length < budget)
    val line = flat.getOrElse {
      // topKLine length is monotone in k — max k with a fitting line
      var lo = 0
      var hi = results.size
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (topKLine(mid).length < budget) lo = mid else hi = mid - 1
      }
      require(topKLine(lo).length < budget,
        "bench contract line over the driver-capture budget even with an empty " +
          "query map; shorten query names")
      System.err.println(s"[bench] contract tier: top-$lo + fast-tail summary " +
        s"(${topKLine(lo).length} B / $budget B)")
      topKLine(lo)
    }
    println(line)
    spark.stop()
  }
}
