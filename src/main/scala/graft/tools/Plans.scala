package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for every query → target/plans/<name>.txt,
  * plus a one-line audit: #exchanges, broadcast?, pushed filters, codegen.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("target", "plans")
    Files.createDirectories(outDir)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // execute first: AQE only reveals the real (final) physical plan —
        // codegen spans, reused exchanges, coalesced partitions — afterwards
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"$name.txt"), plan)
        val nExchange = "Exchange".r.findAllIn(plan).length -
          "ReusedExchange".r.findAllIn(plan).length
        val nReused = "ReusedExchange".r.findAllIn(plan).length
        val nBroadcast = "BroadcastExchange".r.findAllIn(plan).length
        val nCodegen = "WholeStageCodegen".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(plan)
          .exists(!_.contains("[]"))
        val sortAgg = "SortAggregate".r.findAllIn(plan).length
        println(s"[plan] $name exchanges=$nExchange reused=$nReused broadcast=$nBroadcast " +
          s"codegenSpans=$nCodegen pushedFilters=$pushed sortAgg=$sortAgg")
      } catch { case e: Throwable => println(s"[plan] $name ERROR ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
