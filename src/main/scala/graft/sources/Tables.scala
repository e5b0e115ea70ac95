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
  /** The events table with `ts` CANONICALIZED to BIGINT epoch-nanoseconds,
    * whatever precision the parquet physically carries. The generator has
    * shipped the column as both nanosecond INT64 (which Spark reads as raw
    * BIGINT under `nanosAsLong`, set by [[graft.Graft.init]]) and as
    * microsecond TIMESTAMP (which Spark reads natively) — every downstream
    * operator does exact integer math (`ts div 1000000` → epoch-ms), so the
    * one reader normalizes instead of eleven call sites branching on type.
    * `unix_micros * 1000` is exact int64 arithmetic (no float, no overflow
    * until year 2262), and keeps Spark and the DuckDB oracle (`epoch_ms`)
    * floor-consistent for positive timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(eventsRaw(spark, dir))

  /** The events table in its native schema — for callers that need the
    * physical `ts` type (streaming readers must declare the FILE's schema;
    * pushable time-travel predicates must compare in the stored type). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")

  /** Normalize an events frame's `ts` to BIGINT ns (see [[events]]). Works
    * on batch and streaming frames alike. Tz-naive parquet timestamps
    * (pandas-written, `isAdjustedToUTC=false` → Spark TIMESTAMP_NTZ) mean
    * UTC wall-clock in this dataset; [[graft.Graft.init]] pins the session
    * timezone to UTC so the NTZ→instant cast is the identity the DuckDB
    * oracle also applies (`epoch_ms` on a naive TIMESTAMP). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df // already raw ns
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected BIGINT ns or TIMESTAMP)")
    }
  }

  /** Events at-or-before a millisecond-inclusive cutoff, the time-travel
    * scan: the predicate is applied in the column's NATIVE type so it
    * reaches the parquet reader as a pushed filter (row groups whose
    * ts-min exceeds the cutoff are never read — at 100 TB a snapshot costs
    * what the past costs, not the whole log). Sub-ms remainders are
    * included on the boundary in both physical encodings, matching the
    * oracle's `epoch_ns(ts) <= cutoff·10⁶ + 999999`. Returns the
    * normalized (BIGINT-ns) frame. */
  /** The exact complement of [[eventsUpToMs]] — events strictly AFTER the
    * millisecond-inclusive cutoff, with the same native-type pushdown so a
    * delta scan reads only new row groups. upTo(c) ∪ after(c) partitions
    * the log with no overlap at any sub-ms residue. */
  def eventsAfterMs(spark: SparkSession, dir: String, cutoffMs: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsRaw(spark, dir)
    val cutoffUs = timestamp_micros(lit(cutoffMs * 1000L + 999L))
    val filtered = raw.schema("ts").dataType match {
      case LongType => raw.filter(col("ts") > cutoffMs * 1000000L + 999999L)
      case TimestampType => raw.filter(col("ts") > cutoffUs)
      case TimestampNTZType => raw.filter(col("ts") > cutoffUs.cast(TimestampNTZType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected BIGINT ns or TIMESTAMP)")
    }
    normalizeEventTs(filtered)
  }

  def eventsUpToMs(spark: SparkSession, dir: String, cutoffMs: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsRaw(spark, dir)
    val cutoffUs = timestamp_micros(lit(cutoffMs * 1000L + 999L))
    val filtered = raw.schema("ts").dataType match {
      case LongType => raw.filter(col("ts") <= cutoffMs * 1000000L + 999999L)
      case TimestampType => raw.filter(col("ts") <= cutoffUs)
      case TimestampNTZType => raw.filter(col("ts") <= cutoffUs.cast(TimestampNTZType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected BIGINT ns or TIMESTAMP)")
    }
    normalizeEventTs(filtered)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Fan a poorly-parallelized frame out to the session's full parallelism
    * before compute-heavy per-row work. The test corpora arrive as ONE
    * parquet row group per table, so every scan is a single task and all
    * per-row compute (per-token md5, 64-element embed expansion, stopword
    * intersections) serializes on one core of 32 — the optimization
    * guide's unsplittable-input case (§2.5: "repartition immediately
    * after the read"). NO-OP whenever the frame already carries >=
    * defaultParallelism partitions — any real multi-file corpus at scale —
    * so the shuffle exists only where the input layout starves the CPUs,
    * and its bytes are bounded by that small input. Hash-partitioning on
    * the caller's key keeps row placement deterministic under task retry
    * (§2.5 warns off rand-derived keys). Only sound where downstream
    * results are partitioning-independent: per-row maps, exact integer
    * arithmetic, order-independent aggregates (min/max/count/bit-ops) —
    * callers whose result could depend on float accumulation ORDER must
    * not route through this. SCAN INPUTS ONLY (r18, the r17 advisory):
    * the partition-count guard materializes `df.rdd`, which is free for a
    * raw scan but compiles (and under AQE can partially execute) the plan
    * of an exchange-bearing frame — pass the table read, not a derived
    * query. */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores, key)
  }

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
