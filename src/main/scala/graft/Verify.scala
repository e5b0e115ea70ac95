package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query names — run only those
    // (local iteration; the driver always runs the full set). Blank names
    // are dropped ("".split(",") == Array("")) and an all-blank arg means
    // "run all" — otherwise `Verify sf out ""` silently runs NOTHING and
    // writes an empty oracle_sql.json.
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Scale-factor stamp (r17): CORRECTNESS_r*.json never recorded which
    // sf the pass ran at, so "green at three SFs" was a builder claim the
    // driver couldn't audit. A SEPARATE file (oracle_sql.json's schema is
    // name→SQL — an extra key there would read as a query) records the
    // input dir + query count beside the dumps; multi-SF runs use
    // distinct outDirs, so each carries its own stamp.
    val ranNames = SparkEntry.queries.keys.filter(wanted).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"sf_dir":${q(sfDir)},"sf":${q(new java.io.File(sfDir).getName)},""" +
        s""""query_count":${ranNames.length}}""")
    spark.stop()
  }
}
