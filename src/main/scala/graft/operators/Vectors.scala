package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Tables

/** Per-vector statistics: the reference's normalize-if-needed contract
  * (reference: app/core/indexing.py:16-22 — cosine requires unit norm;
  * zero vectors pass through unnormalized). */
object Vectors {

  /** v5: (vec_id, norm, is_unit) — one codegen'd pass, no shuffle at all. */
  def norms(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), round(Graft.norm(col("embedding")), 4).as("norm"))
      .withColumn("is_unit", col("norm") >= 0.999 && col("norm") <= 1.001)
      .orderBy("vec_id")
  }

  val normsOracle: String =
    """SELECT vec_id,
      |       round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS norm,
      |       (round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) >= 0.999
      |        AND round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) <= 1.001) AS is_unit
      |FROM embeddings ORDER BY vec_id""".stripMargin
}
