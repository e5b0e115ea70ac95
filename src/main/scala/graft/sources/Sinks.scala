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
    * shuffle is byte-small; rows land in the same directories with the
    * same values, so every reader — all of them aggregate or re-sort —
    * is unchanged. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
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
