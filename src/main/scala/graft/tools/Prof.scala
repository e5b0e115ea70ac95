package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc profiling: run selected queries repeatedly, print warm/cold times. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_PROF_SINK=noop materializes through the noop writer —
    // the exact measurement Bench takes (count() lets Catalyst prune the
    // compute the writer would force, so the two can differ a lot).
    val noop = sys.env.get("SPARK_GRAFT_PROF_SINK").contains("noop")
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = if (noop) { df.write.format("noop").mode("overwrite").save(); -1L } else df.count()
      println(f"[prof] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
