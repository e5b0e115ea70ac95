package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Structured-Streaming variants of the event-time operators: the same
  * logical plans as [[graft.operators.Events]], declared over `readStream`
  * so the identical code runs incrementally with watermark-bounded state.
  */
object Streams {

  /** Streaming tumbling 1-hour window counts over the events table
    * (file-source; watermark bounds state for continuous ingestion).
    * File stream sources watch a *directory*, so the single-file test
    * table is staged into one (exactly how a landing zone looks in prod). */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.events(spark, dir).schema // ts arrives as BIGINT ns
    val watched = java.nio.file.Paths.get("target", "stream-src",
      dir.replaceAll("[^A-Za-z0-9.]", "_"))
    java.nio.file.Files.createDirectories(watched)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "events.parquet"),
      watched.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.readStream
      .schema(schema)
      .parquet(watched.toString)
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_us", "2 hours")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        floor(unix_millis(col("window.start")) / 3600000L).as("hour_bucket"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Run the streaming query to completion against the static dir (memory
    * sink) and return the materialized result — used by specs to prove
    * stream/batch equivalence. */
  def runToMemory(spark: SparkSession, dir: String, name: String = "graft_stream_out"): DataFrame = {
    // complete mode: with a static file source the watermark never advances
    // past the single micro-batch, so append would emit nothing
    val q = tumblingCounts(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
