package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock profile of one query end to end — where a query is a
  * LIFECYCLE (the facade queries run dozens of tiny driver-issued jobs:
  * appends, folds, training iterations, artifact writes), the stage view
  * hides the constant per-job overhead that dominates; this prints every
  * job with its duration and description so the job COUNT itself becomes
  * a measurable optimization target. Usage:
  * `sbt "runMain graft.tools.JobProf f13_facade_serving"` */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse {
            // broadcast-exchange jobs run via withThreadLocalCaptured and
            // carry no description — attribute them by the first graft
            // frame found in ANY of the job's stages
            val site = j.stageInfos.iterator.flatMap(_.details.linesIterator)
              .find(l => l.contains("graft") && !l.contains("tools.JobProf"))
            j.stageInfos.lastOption.map(si =>
              si.name.take(40) + " | " + site.getOrElse("").trim.take(90))
          }
          .getOrElse("?")
        starts.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[job] id=${j.jobId}%4d wall=${j.time - t0}%6dms  $desc")
        }
      }
    })
    val reps = sys.env.get("SPARK_GRAFT_JOBPROF_REPS").flatMap(_.toIntOption).getOrElse(2)
    for (name <- args.toSeq; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[total] $name rep$rep prep=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
