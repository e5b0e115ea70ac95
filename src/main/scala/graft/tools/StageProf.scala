package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        if (dur > 1000)
          println(s"[stage] id=${si.stageId} name=${si.name.take(60)} tasks=${si.numTasks} " +
            s"wall=${dur}ms cpu=${si.taskMetrics.executorCpuTime/1000000}ms " +
            s"run=${si.taskMetrics.executorRunTime}ms records=${si.taskMetrics.inputMetrics.recordsRead}")
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(args(0))(spark, sfDir).count()
    println(f"[total] ${args(0)} ${(System.nanoTime()-t0)/1e9}%.1fs ($n rows)")
    spark.stop()
  }
}
