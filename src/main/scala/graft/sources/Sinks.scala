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

  /** Hive-partitioned parquet write (partition pruning on read). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

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
