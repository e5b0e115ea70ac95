package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink round-trips beyond plain parquet reads: partitioned and
  * bucketed writes (the cluster-scale storage layouts) plus CSV/JSON
  * interchange.
  *
  * Bucketing is the 100 TB co-location story: two tables bucketed on the
  * same key join with **zero shuffle** (verified by SinksSpec — the join
  * plan has no Exchange). On a real cluster this turns every repeated
  * fact-fact join on the bucket key into a local zip of pre-sorted files.
  */
object Sinks {

  /** Hive-partitioned parquet write (partition pruning on read),
    * HASH-CLUSTERED on the partition column before the write (r17) — the
    * guide §6 / Iceberg `write.distribution-mode=hash` shape: every
    * partition value is owned by exactly one task, so the layout is one
    * file per value instead of (tasks × values) small files at scale, and
    * a poorly-split input (the one-row-group test corpus: ONE task
    * serially writing every directory — q30's measured 1.9 s write job)
    * fans out to all cores. The partition count is pinned (not
    * AQE-coalesced) so the write keeps its parallelism even when the
    * shuffle is byte-small.
    *
    * CONTRACT (r18, the r17 advisory): with `saltBuckets = 1` (default)
    * each partition value lands as ONE file whose row order is
    * shuffle-dependent — readers must aggregate or re-sort (every in-repo
    * reader does), and a HOT value serializes its write on one core
    * (guide §2.5's skew cliff). A caller whose profile shows a skewed
    * value passes `saltBuckets > 1`: each value then spreads over up to
    * that many tasks/files, salted by a DETERMINISTIC content hash (a
    * rand() salt would duplicate/lose rows under task retry — §2.5), so
    * the write parallelizes and the trade is file count, never rows.
    * Directories, values and reader results are identical either way. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       saltBuckets: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}
    val n = df.sparkSession.sparkContext.defaultParallelism
    val clustered =
      if (saltBuckets <= 1) df.repartition(n, col(partitionCol))
      else df.repartition(math.max(n, saltBuckets), col(partitionCol),
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltBuckets)))
    clustered.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
  }

  /** Bucketed + sorted table write (requires a catalog table). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
