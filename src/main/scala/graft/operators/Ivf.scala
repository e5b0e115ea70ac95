package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Graft
import graft.sources.Tables

/** IVF (inverted-file) index — Spark re-expression of the reference's
  * FAISS-style IVF (reference: app/core/indexes/ivf.py:8-262).
  *
  * The inverted lists become a `cluster_id` column: "probing" a cluster is
  * an equi-join on that column, which at scale is a partition-pruned read
  * (or a shuffle-free broadcast join of the probed ids at test scale).
  * Training (Lloyd's) is the classic Spark k-means shape: broadcast the
  * k×d centroid matrix, assign with one codegen'd pass, update centroids
  * with a `graft_vecsum` partial aggregate — per iteration one scan + a
  * shuffle of exactly k×d doubles per partition, never the data.
  *
  * Determinism vs the reference: init = first k vectors by id (not RNG),
  * empty clusters keep their previous centroid (not random reseed), so the
  * same result is produced by any engine / partitioning.
  */
object Ivf {
  val K = 16
  val Probes = 4

  private def centroidsFixed(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** v6: assign every vector to its nearest (cosine) fixed centroid. */
  def assign(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    assignTo(emb, centroidsFixed(spark, dir))
      .select(col("vec_id"), col("cluster_id"), round(col("sim"), 4).as("sim"))
      .orderBy("vec_id")
  }

  /** (vec_id, cluster_id, sim) — nearest centroid per vector via TopK(1). */
  private def assignTo(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("s", Graft.cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(Graft.topk(col("s"), col("cid"), lit(1), lit(false)).as("top"))
      .select(col("vec_id"),
        col("top").getItem(0).getField("id").as("cluster_id"),
        col("top").getItem(0).getField("score").as("sim"))

  val assignOracle: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |      FROM embeddings e CROSS JOIN c),
       |r AS (SELECT vec_id, cid, sim,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s)
       |SELECT vec_id, cid AS cluster_id, round(sim, 4) AS sim FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** v7: probe the `Probes` nearest centroids per query, re-rank candidates
    * by exact cosine (reference: app/core/indexes/ivf.py:96-129). */
  def search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val centroids = centroidsFixed(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("s", Graft.cosine(col("qvec"), col("cvec")))
      .groupBy(col("qid"))
      .agg(Graft.topk(col("s"), col("cid"), lit(Probes), lit(false)).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cluster_id"))

    val assigned = assignTo(emb, centroids).select(col("vec_id"), col("cluster_id"))

    val candidates = assigned.join(broadcast(probes), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))

    val scored = candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  def searchOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= $Probes),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |             FROM embeddings e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v8: distributed Lloyd's k-means (reference: app/core/indexes/
    * ivf.py:214-262), 5 iterations, cosine objective. Driver state is only
    * the k×d centroid matrix; each iteration = one assign scan (broadcast
    * centroids) + one `graft_vecsum` partial aggregate. Rows-only oracle
    * (iterative training is not ANSI-SQL-expressible).
    */
  def kmeans(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      assignTo(emb, trainCentroidDf(spark, emb, iters))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n"), round(avg(col("sim")), 4).as("avg_sim"))
        .orderBy("cluster_id")
    } finally emb.unpersist()
  }

  /** Lloyd's training loop; returns the final (cid, cvec) centroid frame.
    * Driver state is only the k×d matrix; each iteration = one broadcast
    * assignment scan + one `graft_vecsum` partial aggregate. */
  private def trainCentroidDf(spark: SparkSession, emb: DataFrame, iters: Int): DataFrame = {
    var centroids: Array[(Long, Array[Double])] =
      emb.filter(col("vec_id") < K).orderBy("vec_id").collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
      }

    def centroidDf: DataFrame = {
      val schema = StructType(Seq(
        StructField("cid", LongType, nullable = false),
        StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(centroids.toSeq.map { case (id, v) => Row(id, v.toSeq) }, 1),
        schema)
    }

    // like assignTo, but carries the vector through (constant per group)
    def assignWithVec(cdf: DataFrame): DataFrame =
      emb.crossJoin(broadcast(cdf))
        .withColumn("s", Graft.cosine(col("embedding"), col("cvec")))
        .groupBy(col("vec_id"))
        .agg(
          Graft.topk(col("s"), col("cid"), lit(1), lit(false)).as("top"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("top").getItem(0).getField("id").as("cluster_id"),
          col("embedding"))

    for (_ <- 1 to iters) {
      val sums = assignWithVec(centroidDf)
        .groupBy(col("cluster_id"))
        .agg(Graft.vecsum(col("embedding")).as("vsum"), count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        val cid = r.getLong(0)
        val vsum = r.getSeq[Double](1).toArray
        val norm = math.sqrt(vsum.map(x => x * x).sum)
        (cid, if (norm > 0) vsum.map(_ / norm) else vsum)
      }.toMap
      // empty clusters keep their previous centroid (deterministic variant
      // of the reference's random reseed, ivf.py:249-251)
      centroids = centroids.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    centroidDf
  }

  /** v14: the reference's full usage flow — train the IVF index, then
    * probe-and-rerank search with the *trained* centroids
    * (reference: train_index → search, app/core/vector_db.py:294,249).
    * Rows-only check (training is iterative, not SQL-expressible);
    * quality gated by RecallSpec-style invariants in IvfTrainedSpec. */
  def searchTrained(spark: SparkSession, dir: String, k: Int = 10,
                    nQueries: Int = 8, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      val centroids = trainCentroidDf(spark, emb, iters)
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

      val probes = queries.crossJoin(broadcast(centroids))
        .withColumn("s", Graft.cosine(col("qvec"), col("cvec")))
        .groupBy(col("qid"))
        .agg(Graft.topk(col("s"), col("cid"), lit(Probes), lit(false)).as("top"))
        .select(col("qid"), explode(col("top.id")).as("cluster_id"))

      val assigned = assignTo(emb, centroids).select(col("vec_id"), col("cluster_id"))

      val scored = assigned.join(broadcast(probes), Seq("cluster_id"))
        .select(col("qid"), col("vec_id"))
        .join(emb, Seq("vec_id"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
        .select(col("qid"), col("vec_id"), col("score"))

      Knn.topkPerQuery(scored, "cosine", k)
    } finally emb.unpersist()
  }
}
