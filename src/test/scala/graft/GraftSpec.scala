package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + helpers for all specs (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.init(s)
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = TestSession.sf
  def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)
}

/** Every declared query runs and returns rows; oracle coverage is complete. */
class ContractSpec extends GraftSuite {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
  test("oracle SQL strings are DuckDB-style, non-empty") {
    SparkEntry.oracleSql.values.foreach(sql => assert(sql.trim.nonEmpty))
  }
}
