package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query gets one untimed warmup run (codegen/JIT/parquet footers) and
  * three timed runs, reporting the MINIMUM; each run materializes the full
  * result through a `noop` sink so the measurement is end-to-end compute,
  * not `count()`'s column-pruned shortcut. The host VM has multi-second
  * scheduler noise (observed 5-10× on identical warm queries) — min-of-reps
  * is the only stable estimator here; a single timed rep produced the
  * round-1 phantom outliers (e1 70 s, t2 31 s for sub-second plans).
  *
  * Two artifacts per run:
  *   - stdout: the contract line above, with values at 3 dp — the full
  *     line must fit the driver's ~2 KiB stdout-tail capture or it is
  *     head-truncated and unparseable (this is what broke BENCH_r02/r03);
  *   - `BENCH_DETAIL.json` (cwd): full-precision PER-REP times for every
  *     query, both passes, so a VM stall is distinguishable from a real
  *     regression after the fact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    /** 1 untimed warmup + `reps` timed runs; empty on failure. */
    def timedReps(name: String, reps: Int): Seq[Double] =
      try {
        runOnce(name)
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          runOnce(name)
          (System.nanoTime() - t0) / 1e9
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Seq.empty
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val firstPass: Seq[(String, Seq[Double])] = names.map(n => n -> timedReps(n, 3))

    // A host-VM stall lasting a few seconds swallows all 3 reps of whatever
    // query it lands on (observed: a 0.3 s query reported at 19 s). Second
    // chance: anything >3× the median gets re-measured later, when the
    // stall has passed; keep the min of both passes.
    val mins = firstPass.collect { case (_, rs) if rs.nonEmpty => rs.min }.sorted
    val median = if (mins.isEmpty) 0.0 else mins(mins.length / 2)
    val retryPass: Map[String, Seq[Double]] = firstPass.collect {
      case (n, rs) if rs.nonEmpty && median > 0 && rs.min > 3 * median => n -> timedReps(n, 3)
    }.toMap

    val results: Seq[(String, Double)] = firstPass.map { case (n, rs) =>
      val all = rs ++ retryPass.getOrElse(n, Seq.empty)
      n -> (if (all.isEmpty) -1.0 else all.min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum

    def d2(v: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(v))
    def d3(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
    def dFull(v: Double): String = String.format(Locale.ROOT, "%.6f", Double.box(v))

    // Full-precision per-rep detail — survives even though stdout is
    // tail-truncated by the driver's capture.
    val detail = firstPass.map { case (n, rs) =>
      val retry = retryPass.get(n)
        .map(r => s""","retry_reps":[${r.map(dFull).mkString(",")}]""").getOrElse("")
      val best = results.find(_._1 == n).get._2
      s""""$n":{"reps":[${rs.map(dFull).mkString(",")}]$retry,"sec":${dFull(best)}}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${dFull(total)},"unit":"sec","sf":"$sfDir","cpus":$cpus,"queries":$detail}""")

    // Contract line LAST, compact (2 dp per query — full precision is in
    // BENCH_DETAIL.json) so the driver's ~2 KiB stdout-tail window holds
    // the ENTIRE line even with sbt's trailing status output: 71 queries
    // × ~26 B ≈ 1.8 KiB.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + d2(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
