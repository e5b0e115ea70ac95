package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked parquet loaders for the driver-generated test tables.
  *
  * At 100 TB these reads stay scan-friendly: callers `.select(...)` before
  * any action so Catalyst prunes columns at the parquet footer level, and
  * every filter the operators apply is a pushable predicate (verified via
  * `.explain("formatted")` — see PLANS.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    graft.Graft.init(spark) // every query flows through here → tuned session
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts is nanosecond-precision parquet, which Spark's reader
    * rejects; [[graft.Graft.init]] (run by [[load]]) sets the session to
    * read it as raw BIGINT nanoseconds. All downstream event-time math is
    * exact integer division (`div`), which also keeps Spark and the DuckDB
    * oracle floor-consistent. */
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Documents from JSON Lines — the reference's ingest wire format (its
    * REST body is a JSON document payload). Schema is EXPLICIT: schema
    * inference would buy a full extra pass over the input before the real
    * scan, which at 100 TB doubles ingest IO; `mode=FAILFAST` makes a
    * malformed line a loud error instead of a silent null row that would
    * surface later as an oracle hash mismatch. Columns land in the same
    * shape as [[documents]], so every downstream operator (chunk → embed →
    * index → dedup) runs unchanged on JSON-ingested corpora. */
  def documentsFromJson(spark: SparkSession, path: String): DataFrame = {
    graft.Graft.init(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
  }
}
