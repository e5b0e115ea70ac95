package graft

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

/** Source/sink layouts: partition pruning, bucket-join co-location,
  * CSV/JSON round-trips. */
class SinksSpec extends GraftSuite {

  test("partitioned write → read prunes partitions on filter") {
    val out = "target/test-sinks/docs_by_lang"
    Sinks.writePartitioned(Tables.documents(spark, sf), out, "lang")
    val df = spark.read.parquet(out).filter(col("lang") === "de")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(500))
    assert(df.count() > 0)
  }

  test("co-bucketed tables join with zero shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      for (t <- Seq("orders_b", "li_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"target/spark-warehouse/$t")
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      Sinks.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 8)
      Sinks.writeBucketed(
        Tables.lineitem(spark, sf).groupBy("l_orderkey").agg(sum("l_quantity").as("qty")),
        "li_b", "l_orderkey", 8)
      val joined = spark.table("orders_b")
        .join(spark.table("li_b"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("JSONL document ingest (explicit schema, FAILFAST) matches the parquet source") {
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json("target/test-sinks/docs_ingest")
    val fromJson = Tables.documentsFromJson(spark, "target/test-sinks/docs_ingest")
    assert(fromJson.columns.toSeq === docs.columns.toSeq)
    assert(fromJson.collect().map(_.toSeq).toSet === docs.collect().map(_.toSeq).toSet,
      "JSON-ingested documents diverged from the parquet source")

    // a malformed line is a LOUD failure, not a silent null row that would
    // surface later as an opaque oracle hash mismatch
    val bad = java.nio.file.Paths.get("target", "test-sinks", "docs_bad")
    java.nio.file.Files.createDirectories(bad)
    java.nio.file.Files.write(bad.resolve("part-0.json"),
      "{\"doc_id\": \"not-a-number\", \"text\":".getBytes("UTF-8"))
    intercept[Exception] {
      Tables.documentsFromJson(spark, bad.toString).collect()
    }
  }

  test("CSV, JSON and ORC round-trips preserve row counts") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "source", "n_chars")
    Sinks.writeCsv(docs, "target/test-sinks/docs_csv")
    Sinks.writeJson(docs, "target/test-sinks/docs_json")
    Sinks.writeOrc(docs, "target/test-sinks/docs_orc")
    assert(Sinks.readCsv(spark, "target/test-sinks/docs_csv").count() === docs.count())
    assert(Sinks.readJson(spark, "target/test-sinks/docs_json").count() === docs.count())
    assert(Sinks.readOrc(spark, "target/test-sinks/docs_orc").count() === docs.count())
  }

  test("salted partitioned write splits a hot value across files; rows unchanged") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "source")
    val salted = "target/test-sinks/docs_by_lang_salted"
    val plain = "target/test-sinks/docs_by_lang_plain"
    Sinks.writePartitioned(docs, salted, "lang", saltBuckets = 4)
    Sinks.writePartitioned(docs, plain, "lang")
    // the hottest value no longer serializes into a single task/file
    val hot = docs.groupBy("lang").count().orderBy(col("count").desc, col("lang"))
      .head().getString(0)
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$plain/lang=$hot") === 1, "unsalted contract: one file per value")
    assert(parquetFiles(s"$salted/lang=$hot") > 1,
      "salted contract: a hot value spans multiple tasks/files")
    // identical rows in identical directories — readers are unaffected
    val a = spark.read.parquet(salted).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(plain).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
