package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the function surface via spark.sql.extensions
  * — pure-SQL users get the codegen'd expressions with no Graft.init call. */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val newSession = spark.newSession()
      val v = newSession
        .sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally {
      // leave the shared TestSession JVM usable for other suites
    }
  }
}
