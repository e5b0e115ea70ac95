package graft.tools
import org.apache.spark.sql.SparkSession
object Reuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val codegenStages = "\\*\\(\\d+\\)".r.findAllIn(p).toSeq.distinct.length
      println(s"[reuse] $name codegenStages=$codegenStages reused=${"ReusedExchange".r.findAllIn(p).length}")
      // show the line evaluating the custom expression, with its codegen marker
      p.split("\n").filter(l => l.contains("graft_") || l.contains("VecCosine") || l.contains("SimhashKeys"))
        .take(3).foreach(l => println("[line] " + l.trim.take(160)))
    }
    spark.stop()
  }
}
