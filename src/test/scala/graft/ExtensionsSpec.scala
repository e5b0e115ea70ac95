package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the function surface via spark.sql.extensions
  * — pure-SQL users get the codegen'd expressions with no Graft.init call. */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    val prior = TestSession.spark // ensure the shared context exists
    // getOrCreate returns the existing default session (ignoring new
    // configs), so detach it first to force a fresh extension-built session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is static (read at SparkContext creation); in
      // this shared-context JVM the programmatic path exercises the same
      // GraftExtensions class the conf would load in a fresh spark-submit
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = ext
        .sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
