package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.sources.Tables

/** The events reader's timestamp canonicalization ([[Tables.events]]):
  * the generator has shipped `ts` as nanosecond INT64, and as tz-naive
  * microsecond TIMESTAMP (the round-7 regeneration, which broke every
  * event-time query at analysis until the reader normalized) — all
  * encodings must land as the SAME BIGINT epoch-ns column, and the
  * time-travel cutoff must keep reaching the parquet scan as a pushed
  * predicate in the file's native type. */
class SourcesSpec extends GraftSuite {
  import spark.implicits._

  // 2024-01-16T00:00:00.000123 UTC
  private val wallUs = 1705363200000123L

  test("normalizeEventTs: BIGINT ns passes through unchanged") {
    val df = Seq((1L, wallUs * 1000L)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.select("ts").as[Long].head() === wallUs * 1000L)
  }

  test("normalizeEventTs: µs TIMESTAMP → exact epoch-ns") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(wallUs)))
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.select("ts").as[Long].head() === wallUs * 1000L)
  }

  test("normalizeEventTs: tz-naive TIMESTAMP_NTZ → epoch-ns as UTC wall-clock") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", to_timestamp_ntz(lit("2024-01-16 00:00:00.000123")))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeEventTs(df)
    assert(out.select("ts").as[Long].head() === wallUs * 1000L)
  }

  test("events reader yields BIGINT ns in a plausible epoch range") {
    val ts = Tables.events(spark, sf).select("ts").as[Long].head()
    assert(Tables.events(spark, sf).schema("ts").dataType === LongType)
    // test corpus is generated in 2024 — a unit slip (µs read as ns, or
    // a double conversion) lands orders of magnitude outside this band
    assert(ts > 1.6e18.toLong && ts < 1.8e18.toLong, s"ts=$ts not ns-scale")
  }

  test("testdata schema contract: a regeneration that changes types fails HERE first") {
    // The round-7 regeneration silently flipped events.ts from ns INT64 to
    // µs TIMESTAMP and broke nine queries at analysis; this pins every
    // column type the operators rely on so the NEXT drift is one loud,
    // named failure instead of nine obscure ones.
    import org.apache.spark.sql.types._
    def t(table: String, colName: String): DataType =
      Tables.load(spark, sf, table).schema(colName).dataType
    val timestampish: Set[DataType] = Set(TimestampType, TimestampNTZType)
    val exact: Seq[(String, String, DataType)] = Seq(
      ("region", "r_regionkey", IntegerType), ("region", "r_name", StringType),
      ("nation", "n_nationkey", IntegerType), ("nation", "n_name", StringType),
      ("nation", "n_regionkey", IntegerType),
      ("customer", "c_custkey", LongType), ("customer", "c_nationkey", IntegerType),
      ("customer", "c_acctbal", DoubleType), ("customer", "c_mktsegment", StringType),
      ("supplier", "s_suppkey", LongType), ("supplier", "s_nationkey", IntegerType),
      ("part", "p_partkey", LongType), ("part", "p_size", IntegerType),
      ("part", "p_retailprice", DoubleType),
      ("orders", "o_orderkey", LongType), ("orders", "o_custkey", LongType),
      ("orders", "o_orderstatus", StringType), ("orders", "o_totalprice", DoubleType),
      ("lineitem", "l_orderkey", LongType), ("lineitem", "l_partkey", LongType),
      ("lineitem", "l_suppkey", LongType), ("lineitem", "l_linenumber", IntegerType),
      ("lineitem", "l_quantity", DoubleType), ("lineitem", "l_extendedprice", DoubleType),
      ("lineitem", "l_discount", DoubleType), ("lineitem", "l_tax", DoubleType),
      ("lineitem", "l_returnflag", StringType), ("lineitem", "l_linestatus", StringType),
      ("events", "event_id", LongType), ("events", "user_id", LongType),
      ("events", "event_type", StringType), ("events", "value", DoubleType),
      ("events", "props", StringType),
      ("documents", "doc_id", LongType), ("documents", "text", StringType),
      ("documents", "lang", StringType), ("documents", "source", StringType),
      ("documents", "n_chars", LongType),
      ("embeddings", "vec_id", LongType), ("embeddings", "label", IntegerType))
    for ((table, colName, want) <- exact)
      assert(t(table, colName) === want, s"$table.$colName drifted")
    // the encodings the engine explicitly handles:
    assert((timestampish + LongType).contains(t("events", "ts")),
      s"events.ts ${t("events", "ts")} — extend Tables.normalizeEventTs for this encoding")
    assert(timestampish.contains(t("orders", "o_orderdate")), "o_orderdate drifted")
    assert(timestampish.contains(t("lineitem", "l_shipdate")), "l_shipdate drifted")
    assert(t("embeddings", "embedding") match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"embeddings.embedding drifted: ${t("embeddings", "embedding")}")
  }

  test("eventsUpToMs ≡ post-hoc ms filter, and the cutoff reaches the scan pushed") {
    val cutoffMs = 1705363200000L
    val pruned = Tables.eventsUpToMs(spark, sf, cutoffMs)
    val reference = Tables.events(spark, sf)
      .filter(expr("ts div 1000000") <= cutoffMs)
    assert(pruned.count() === reference.count())
    assert(pruned.select("event_id").except(reference.select("event_id")).isEmpty)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      """PushedFilters: \[[^\]]*ts[^\]]*\]""".r.findFirstIn(plan).isDefined,
      s"cutoff not pushed to the events scan:\n$plan")
  }
}
