package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Graft
import graft.sources.{Sinks, Tables}

/** IVF (inverted-file) index — Spark re-expression of the reference's
  * FAISS-style IVF (reference: app/core/indexes/ivf.py:8-193).
  *
  * The inverted lists become a `cluster_id` column: "probing" a cluster is
  * an equi-join on that column, which at scale is a partition-pruned read
  * (see [[Persist.ivfPersistSearch]] for the materialized form, or a
  * broadcast join of the probed ids at test scale). Assignment is a
  * MAP-ONLY codegen'd argmax over the broadcast k×d centroid matrix
  * ([[graft.functions.NearestCentroid]]) — one fused loop per row, no join,
  * no shuffle. Training (Lloyd's) is therefore shuffle-free per iteration:
  * one assignment scan + one `graft_vecsum` partial aggregate that ships
  * exactly k×d doubles per partition, never the data. (The round-1
  * formulation paid a crossJoin+groupBy+TopK(1) O(n)-row shuffle per
  * iteration for the same answer.)
  *
  * Determinism vs the reference: init = first k vectors by id (not RNG),
  * empty clusters keep their previous centroid (not random reseed,
  * ivf.py:177-179), so the same result is produced by any engine /
  * partitioning. Vectors are unit-normalized before centroid accumulation
  * exactly like the reference (ivf.py:162 `Xn`) — without the `+1e-12`
  * epsilon, since a zero vector passes through `graft_vec_normalize`
  * unchanged and contributes its raw zeros either way.
  */
object Ivf {
  val K = 16
  val Probes = 4

  private def centroidsFixed(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** The fixed (first-K) centroid matrix — v6's coarse quantizer, shared
    * with [[Dedup.semDedup]]'s cluster stage. */
  private[operators] def fixedMat(spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    collectCentroids(centroidsFixed(spark, dir))

  /** Collect a small (cid, cvec) frame to the driver-side k×d matrix,
    * sorted by cid — the canonical k-means driver state (k×d doubles). */
  private[operators] def collectCentroids(centroids: DataFrame): Array[(Long, Array[Double])] =
    centroids.orderBy("cid").collect().map { r =>
      val vec = r.get(1) match {
        case s: scala.collection.Seq[_] => s.map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
      }
      (r.getLong(0), vec)
    }

  /** (key, code, cv) broadcast-dim form of a driver-side per-group codebook
    * map — shared by the PQ/IVF-PQ reconstruction joins. `code` is the
    * centroid's position inside its group's matrix. */
  private[operators] def codebookDf(spark: SparkSession,
                                    cb: Map[Long, Array[Array[Double]]],
                                    keyCol: String = "m", codeCol: String = "code",
                                    vecCol: String = "cv"): DataFrame = {
    val schema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField(codeCol, IntegerType, nullable = false),
      StructField(vecCol, ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(cb.toSeq.flatMap { case (key, cs) =>
        cs.zipWithIndex.map { case (v, i) => Row(key, i, v.toSeq) }
      }, 1), schema)
  }

  /** Map-only nearest-centroid assignment: projects
    * (vec_id, cluster_id, sim, embedding [, keep...]) with zero
    * joins/shuffles. `keep` carries metadata columns (e.g. `label`)
    * through the assignment so they land in the persisted lists. */
  private[graft] def assignToMat(emb: DataFrame, mat: Array[(Long, Array[Double])],
                                     keep: Seq[String] = Nil): DataFrame = {
    val cvecs: Column = typedLit(mat.map(_._2.toSeq).toSeq)
    val cids: Column = typedLit(mat.map(_._1).toSeq)
    emb
      .withColumn("nc", Graft.nearestCentroid(col("embedding"), cvecs))
      .select(
        col("vec_id") +:
          element_at(cids, col("nc.idx") + 1).as("cluster_id") +:
          col("nc.sim").as("sim") +:
          col("embedding") +:
          keep.map(col): _*)
  }

  /** v6: assign every vector to its nearest (cosine) fixed centroid. */
  def assign(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    assignToMat(emb, collectCentroids(centroidsFixed(spark, dir)))
      .select(col("vec_id"), col("cluster_id"), round(col("sim"), 4).as("sim"))
      .orderBy("vec_id")
  }

  val assignOracle: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |      FROM embeddings e CROSS JOIN c),
       |r AS (SELECT vec_id, cid, sim,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s)
       |SELECT vec_id, cid AS cluster_id, round(sim, 4) AS sim FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Top-`Probes` nearest centroids per query (tiny: Q×k rows). */
  private[operators] def probesFor(queries: DataFrame, mat: Array[(Long, Array[Double])],
                                   spark: SparkSession, nProbes: Int = Probes): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val cdf = spark.createDataFrame(
      spark.sparkContext.parallelize(mat.toSeq.map { case (id, v) => Row(id, v.toSeq) }, 1),
      schema)
    queries.crossJoin(broadcast(cdf))
      .withColumn("s", Graft.cosine(col("qvec"), col("cvec")))
      .groupBy(col("qid"))
      .agg(Graft.topk(col("s"), col("cid"), lit(nProbes), lit(false)).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cluster_id"))
  }

  /** v7: probe the `Probes` nearest centroids per query, re-rank candidates
    * by exact cosine (reference: app/core/indexes/ivf.py:96-129). */
  def search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = collectCentroids(centroidsFixed(spark, dir))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))

    val candidates = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
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

  /** v21: IVF range search — every candidate within radius (cosine ≥ τ)
    * instead of top-k, the standard vector-store companion to v7 (result
    * size is data-driven, not capped). Identical probe machinery and scan
    * shape as [[search]]; only the tail differs: a scalar filter replaces
    * the TopK partial aggregate, so the one shuffle v7 pays to rank
    * disappears entirely — candidates stream from the probed lists through
    * the codegen'd cosine straight into the output. Same approximation
    * contract as v7: vectors outside the probed clusters are not seen. */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double = 0.2,
                  nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = collectCentroids(centroidsFixed(spark, dir))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
    val candidates = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))

    candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .filter(col("score") >= tau)
      .select(col("qid"), col("vec_id"), round(col("score"), 4).as("score"))
      .orderBy("qid", "vec_id")
  }

  /** v27: IVF probe search for the external query WORKLOAD table
    * ([[Knn.queryTable]]) — the same probe-and-rerank plan as [[search]],
    * with the query side coming from its own artifact instead of a
    * corpus prefix: the workload scans as a tiny broadcast table, its
    * probes are computed against the broadcast centroids, and the
    * candidate path is unchanged. Together with v26 this retires the
    * `vec_id < Q` prefix as the only modeled query source. */
  def workloadSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = collectCentroids(centroidsFixed(spark, dir))
    val queries = Knn.queryTable(spark, dir)

    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
    val candidates = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))

    val scored = candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  def workloadSearchOracle(k: Int = 10): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |q AS (${Knn.queryTableSql()}),
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

  def rangeSearchOracle(tau: Double = 0.2, nQueries: Int = 8): String =
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
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid)
       |SELECT qid, vec_id, round(score, 4) AS score FROM scored
       |WHERE score >= $tau ORDER BY qid, vec_id""".stripMargin

  /** v8: distributed Lloyd's k-means (reference: app/core/indexes/
    * ivf.py:153-193), 5 iterations, cosine objective. Driver state is only
    * the k×d centroid matrix; each iteration = one MAP-ONLY assignment scan
    * (codegen'd argmax over the broadcast matrix) + one `graft_vecsum`
    * partial aggregate over the unit-normalized vectors (ivf.py:162,175) —
    * the only exchange per iteration carries k pre-aggregated double[64]s.
    * Oracle-gated by [[kmeansOracle]]: grid-quantized accumulation makes
    * the iterations exactly replayable as unrolled SQL CTEs. */
  /** Session-scoped trained-index registry: the trained centroid matrix
    * per (session, dir, iters). In production an index is trained ONCE and
    * every search serves against the registered artifact (reference:
    * train_index persists, vector_db.py:294; searches reuse it) — this
    * memo is the single-JVM analog, the same pattern as [[Dedup
    * .corpusShingles]]. The SEARCH queries (v14, v14b, and IvfPq's v19b/c
    * via their own registry) read it; [[kmeans]] (v8 — the train operation
    * itself) deliberately does NOT, so the bench always prices a full
    * training run under the query that IS training. Driver state per entry
    * is K×d doubles; entries die with the session. */
  private val trainedCache =
    new BoundedMemo[(SparkSession, String, Int), Array[(Long, Array[Double])]](8)(_ => ())

  private[graft] def trainedCentroidsFor(spark: SparkSession, dir: String,
                                             iters: Int): Array[(Long, Array[Double])] =
    trainedCache.getOrElseUpdate((spark, dir, iters)) {
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
      try trainCentroids(spark, emb, iters) finally emb.unpersist()
    }

  def kmeans(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      assignToMat(emb, trainCentroids(spark, emb, iters))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n"), round(avg(col("sim")), 4).as("avg_sim"))
        .orderBy("cluster_id")
    } finally emb.unpersist()
  }

  /** Lloyd's training loop; returns the final driver-side centroid matrix.
    * Per iteration: one shuffle-free assignment projection + one k-group
    * partial aggregate (sum of unit-normalized vectors + count), then the
    * k sums are renormalized on the driver (reference ivf.py:173-182).
    *
    * Empty clusters are RESEEDED from the corpus points worst served by the
    * surviving centroids — the deterministic analog of the reference's
    * random reseed (ivf.py:183-186 draws rng.choice rows of Xn; here: the
    * E lowest-max-cosine points, ties to lowest vec_id, unit-normalized
    * like Xn, each empty cell paired with one distinct point). Costs one
    * extra assignment scan ONLY in an iteration that actually emptied a
    * cluster (rare); the reseed pick is an orderBy+limit = distributed
    * TopK, so driver state stays E×d. Without reseeding, a degenerate init
    * (duplicate vectors among the first K) pins dead centroids forever and
    * the trained index silently loses cluster granularity — GraftSpec
    * exercises exactly that dataset. (PQ subspace codebook training keeps
    * the keep-old rule: the reference has no PQ to be faithful to, and a
    * reseed there would have to re-pick per (m, cell) pair.) */
  /** Count of [[trainCentroids]] invocations this JVM — observability for
    * the lazy-retrain contract ([[graft.api.GraftDb.buildIndex]]'s keep
    * path must run ZERO training; the spec reads this counter across a
    * refresh instead of guessing from timings). Monotonic, test-read
    * only — never branched on. */
  private[graft] val trainInvocations = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def trainCentroids(spark: SparkSession, emb: DataFrame, iters: Int,
                                    init: Option[Array[(Long, Array[Double])]] = None
                                   ): Array[(Long, Array[Double])] = {
    trainInvocations.incrementAndGet()
    var centroids: Array[(Long, Array[Double])] =
      init.getOrElse(emb.filter(col("vec_id") < K).orderBy("vec_id").collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
      })

    for (_ <- 1 to iters) {
      // vecQuantize snaps the normalized vectors to the 2^-21 dyadic grid
      // BEFORE the partial aggregate, making the per-cluster sum exact and
      // therefore independent of shuffle-merge order: two training runs —
      // or Spark and the DuckDB oracle — produce bit-identical centroids.
      val sums = assignToMat(emb, centroids)
        .groupBy(col("cluster_id"))
        .agg(Graft.vecsum(Graft.vecQuantize(Graft.vecNormalize(col("embedding")))).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        val cid = r.getLong(0)
        val vsum = r.getSeq[Double](1).toArray
        val norm = math.sqrt(vsum.map(x => x * x).sum)
        (cid, if (norm > 0) vsum.map(_ / norm) else vsum)
      }.toMap
      val emptyCids = centroids.map(_._1).filterNot(updated.contains).sorted
      val reseeded: Map[Long, Array[Double]] =
        if (emptyCids.isEmpty) Map.empty
        else {
          val live = updated.toArray.sortBy(_._1)
          val far = assignToMat(emb, live)
            .select(col("sim"), col("vec_id"), col("embedding"))
            .orderBy(col("sim").asc, col("vec_id").asc)
            .limit(emptyCids.length)
            .collect()
            .map { r =>
              val v = r.get(2) match {
                case s: scala.collection.Seq[_] => s.map {
                  case f: Float => f.toDouble
                  case d: Double => d
                }.toArray
              }
              val n = math.sqrt(v.map(x => x * x).sum)
              if (n > 0) v.map(_ / n) else v
            }
          emptyCids.zip(far).toMap // zip truncates if corpus < #empties: rest keep old
        }
      centroids = centroids.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, reseeded.getOrElse(cid, old)))
      }
    }
    centroids
  }

  /** v14: the reference's full usage flow — train the IVF index, then
    * probe-and-rerank search with the *trained* centroids
    * (reference: train_index → search, app/core/vector_db.py:294,249).
    * Rows-only check (training is iterative, not SQL-expressible);
    * quality gated by RecallSpec invariants. */
  def searchTrained(spark: SparkSession, dir: String, k: Int = 10,
                    nQueries: Int = 8, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    // NO corpus-wide cache here: training caches its own scan inside
    // trainedCentroidsFor (where each Lloyd's iteration re-reads it), but
    // the returned SEARCH plan executes after this function returns — a
    // cache scoped to this body would be unpersisted before the first
    // query byte is read, and at 100 TB a corpus-wide cache is eviction
    // churn at best. The assignment/rerank arms read the columnar scan.
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = trainedCentroidsFor(spark, dir, iters)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))

    val scored = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  /** DuckDB replay of [[searchTrained]] (and [[Persist.trainedIvfPersistSearch]],
    * whose output is identical by construction): the `iters` Lloyd's
    * iterations are UNROLLED into one CTE chain per iteration — assignment
    * (argmax cosine, ties to lowest cid), exact per-cluster sums of the
    * quantized unit-normalized vectors, renormalization, and the
    * deterministic empty-cluster reseed (worst-served points vs the live
    * means, zipped to dead cids in id order) — followed by the same
    * probe-and-rerank tail as [[searchOracle]] against the trained matrix.
    *
    * This is SQL-expressible ONLY because the trainer's accumulation is
    * order-independent ([[Graft.vecQuantize]]): per-cluster sums of 2^-21
    * dyadic grid values are exact, so Spark's shuffle-merge order and
    * DuckDB's aggregation order produce bit-identical centroids. Each
    * engine-specific float op is mirrored exactly: normalize multiplies by
    * the reciprocal (`y * (1.0/nrm)`, matching `graft_vec_normalize`), the
    * driver renormalize and the reseed divide (`y / nrm`, matching
    * [[trainCentroids]]). */
  def trainedSearchOracle(k: Int = 10, nQueries: Int = 8, iters: Int = 5,
                          sampled: Boolean = false, queryPred: String = "",
                          nProbes: Int = Probes): String = {
    val pred = if (queryPred.nonEmpty) queryPred else s"vec_id < $nQueries"
    s"""${trainCtes(iters, sampled)}
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE $pred),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |            FROM q CROSS JOIN c$iters c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= $nProbes),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.v, q.qvec) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** v41: IVF OCCUPANCY observability — the per-cluster list lengths of
    * the trained index plus each list's corpus share, the health signal
    * an IVF deployment actually monitors: a skewed list is a hot probe
    * (tail latency; at 100 TB, a straggler scan), an empty one a wasted
    * centroid, and drift in the shares is the retrain trigger. Costs one
    * map-only assignment against the memoized trained matrix + one
    * partial agg; output is bounded by K rows, so the report is free at
    * any corpus size. Shares are fixed-point q4 (exact-integer gate);
    * min/max vec_id per list expose id-correlated assignment drift. */
  def listStats(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val assigned = assignToMat(emb, trainedCentroidsFor(spark, dir, iters))
      .select(col("vec_id"), col("cluster_id"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
      .crossJoin(broadcast(total))
      .select(col("cluster_id"), col("n_vecs"),
        floor(col("n_vecs").cast("double") / col("n_total").cast("double") * 10000d + 0.5d)
          .cast("long").as("share_q4"),
        col("min_vec"), col("max_vec"))
      .orderBy("cluster_id")
  }

  def listStatsOracle(iters: Int = 5): String =
    s"""${trainCtes(iters)}
       |g AS (SELECT cluster_id, count(*)::BIGINT AS n_vecs,
       |             min(vec_id) AS min_vec, max(vec_id) AS max_vec
       |      FROM assigned GROUP BY 1),
       |t AS (SELECT count(*)::BIGINT AS n_total FROM assigned)
       |SELECT cluster_id, n_vecs,
       |       floor(n_vecs::DOUBLE / t.n_total::DOUBLE * 10000 + 0.5)::BIGINT AS share_q4,
       |       min_vec, max_vec
       |FROM g, t ORDER BY cluster_id""".stripMargin

  /** v47: CENTROID DRIFT — the assignment MIGRATION MATRIX between two
    * index generations (the model as trained, iters=3, vs the refreshed
    * model, iters=5), the retrain-DECISION report that closes v41's loop:
    * v41 says the shares drifted, this says what a retrain would actually
    * move — (from, to, n) cells, so an operator reads both the volume
    * (off-diagonal mass = rows to re-shard at 100 TB, each a physical
    * partition move of the inverted lists) and the structure (one cell
    * splitting vs mass reshuffling everywhere). ONE corpus scan: both
    * nearest-centroid assignments ride the same projection against two
    * broadcast K×d literal matrices (map-only, no join between the two
    * generations' assignments — the row never leaves its partition), then
    * one partial agg bounded by K² cells at any corpus size. The two
    * models come from the session's trained registry; deterministic
    * Lloyd's makes iteration 3 an exact prefix of the 5-iteration chain,
    * so the oracle replays ONE training chain and reads its c3 AND c5
    * states. min_vec per cell is the drill-in exemplar. */
  def centroidDrift(spark: SparkSession, dir: String,
                    oldIters: Int = 3, newIters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val oldMat = trainedCentroidsFor(spark, dir, oldIters)
    val newMat = trainedCentroidsFor(spark, dir, newIters)
    def cvecs(m: Array[(Long, Array[Double])]): Column = typedLit(m.map(_._2.toSeq).toSeq)
    def cids(m: Array[(Long, Array[Double])]): Column = typedLit(m.map(_._1).toSeq)
    emb
      .withColumn("nco", Graft.nearestCentroid(col("embedding"), cvecs(oldMat)))
      .withColumn("ncn", Graft.nearestCentroid(col("embedding"), cvecs(newMat)))
      .select(col("vec_id"),
        element_at(cids(oldMat), col("nco.idx") + 1).as("from_cid"),
        element_at(cids(newMat), col("ncn.idx") + 1).as("to_cid"))
      .groupBy(col("from_cid"), col("to_cid"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy("from_cid", "to_cid")
  }

  def centroidDriftOracle(oldIters: Int = 3, newIters: Int = 5): String =
    s"""${trainCtes(newIters)}
       |ao AS (SELECT vec_id, cid AS from_cid FROM (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cid) AS rn
       |  FROM e CROSS JOIN c$oldIters c) WHERE rn = 1)
       |SELECT ao.from_cid, a.cluster_id AS to_cid,
       |       count(*)::BIGINT AS n_vecs, min(ao.vec_id) AS min_vec
       |FROM ao JOIN assigned a USING (vec_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** v48: EMBEDDING OOD SCREEN — the bottom-p% of the corpus by
    * similarity to its own nearest trained centroid, the embedding-QA
    * review queue every ingestion pipeline runs (zeroed vectors, junk
    * payloads, embeddings from the WRONG MODEL all land far from every
    * centroid of the right model's space). Budget-based, not absolute:
    * an absolute cosine threshold is corpus- and model-dependent, so the
    * screen flags a FIXED SHARE (the human-review budget) via the exact
    * quantile machinery — sim quantizes Q4, its ≤20001-value histogram
    * folds any corpus into one bounded aggregate, and the driver walk
    * reproduces DuckDB's quantile_cont bit-for-bit (the t22/q9 formula).
    * One map-only assignment scan against the memoized trained matrix +
    * two bounded aggregates; output K rows. Per-cluster flag counts also
    * localize the damage (one cluster absorbing all flags = a junk
    * SOURCE, uniform flags = a noise floor). */
  def embeddingOod(spark: SparkSession, dir: String, iters: Int = 5,
                   p: Double = 0.05): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val assigned = assignToMat(emb, trainedCentroidsFor(spark, dir, iters))
      .select(col("vec_id"), col("cluster_id"),
        expr("cast(floor(sim * 10000 + 0.5) as bigint)").as("sim_q4"))
      .localCheckpoint() // histogram pass + final agg share one assignment
    val hist: Array[(Long, Long)] = assigned.groupBy(col("sim_q4"))
      .agg(count(lit(1)).as("n")).orderBy("sim_q4")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    def valueAt(pos: Long): Long = {
      var c = 0L
      hist.collectFirst { case (v, cnt) if { c += cnt; c > pos } => v }.get
    }
    val h = (n - 1).toDouble * p
    val (lo, hi) = (math.floor(h).toLong, math.ceil(h).toLong)
    val tau =
      if (lo == hi) valueAt(lo).toDouble
      else valueAt(lo).toDouble * (1.0 - (h - lo)) + valueAt(hi).toDouble * (h - lo)
    assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("sim_q4").cast("double") < tau, 1L).otherwise(0L)).as("n_flagged"),
        min(col("sim_q4")).as("min_sim_q4"))
      .withColumn("tau_q4", round(lit(tau), 4))
      .orderBy("cluster_id")
  }

  def embeddingOodOracle(iters: Int = 5, p: Double = 0.05): String =
    s"""${trainCtes(iters)}
       |aq AS (SELECT vec_id, cluster_id, floor(sim * 10000 + 0.5)::BIGINT AS sim_q4
       |       FROM assigned),
       |t AS (SELECT quantile_cont(sim_q4, $p) AS tau FROM aq)
       |SELECT cluster_id, count(*)::BIGINT AS n_vecs,
       |       sum(CASE WHEN sim_q4::DOUBLE < t.tau THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
       |       min(sim_q4) AS min_sim_q4, round(t.tau, 4) AS tau_q4
       |FROM aq, t GROUP BY cluster_id, t.tau ORDER BY cluster_id""".stripMargin

  /** v34: the nprobe TUNING SWEEP — the recall-vs-cost curve an operator
    * actually reads before fixing an IVF deployment's probe count, as one
    * gated query: recall@k of the trained index at nprobe ∈ {1,2,4,8}
    * against the exact flat top-k. Train once (memoized), assign once
    * (the checkpointed table feeds all four arms), then each arm is a
    * probe-join + rerank + hit-count — the sweep costs four candidate
    * joins, never four trainings or four corpus assignments. Recall is a
    * fixed-point division of exact integers, so the curve itself
    * hash-gates; monotonicity in nprobe is spec-asserted (more probes can
    * never lose a hit — candidate sets are nested). */
  def probeSweep(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                 probesList: Seq[Int] = Seq(1, 2, 4, 8), iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = trainedCentroidsFor(spark, dir, iters)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
      .localCheckpoint()
    val exact = Knn.flatSearch(spark, dir, "cosine", k, nQueries)
      .select(col("qid"), col("vec_id"))
    val denom = (nQueries * k).toLong
    probesList.sorted.map { p =>
      val scored = assigned.join(broadcast(probesFor(queries, mat, spark, p)), Seq("cluster_id"))
        .select(col("qid"), col("vec_id"))
        .join(emb, Seq("vec_id"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
        .select(col("qid"), col("vec_id"), col("score"))
      val approx = Knn.topkPerQuery(scored, "cosine", k)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "vec_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(lit(p.toLong).as("nprobe"), col("hits"),
          lit(denom).as("n_considered"),
          floor(col("hits").cast("double") / lit(denom.toDouble) * 10000d + 0.5d)
            .cast("long").as("recall_q4"))
    }.reduce(_ unionByName _).orderBy("nprobe")
  }

  def probeSweepOracle(k: Int = 10, nQueries: Int = 8,
                       probesList: Seq[Int] = Seq(1, 2, 4, 8), iters: Int = 5): String =
    probesList.sorted.map { p =>
      s"""SELECT $p::BIGINT AS nprobe, sum(hit)::BIGINT AS hits,
         |       ${nQueries * k}::BIGINT AS n_considered,
         |       floor(sum(hit)::DOUBLE / ${(nQueries * k).toDouble} * 10000 + 0.5)::BIGINT AS recall_q4
         |FROM (
         |  SELECT x.qid, x.vec_id, CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM (${Knn.oracleFlat("cosine", k, nQueries)}) x
         |  LEFT JOIN (${trainedSearchOracle(k, nQueries, iters, nProbes = p)}) a
         |    ON x.qid = a.qid AND x.vec_id = a.vec_id) h""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY nprobe")

  /** v32: the trained-IVF production flow served for the EXTERNAL query
    * workload table ([[Knn.queryTable]]) — the convention's final cell:
    * train (memoized), assign once, probe-and-rerank, with the probe set
    * computed for workload rows instead of a corpus prefix. Everything
    * downstream of the query source is [[searchTrained]] unchanged. */
  def workloadSearchTrained(spark: SparkSession, dir: String, k: Int = 10,
                            iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = trainedCentroidsFor(spark, dir, iters)
    val queries = Knn.queryTable(spark, dir)
    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
    val scored = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k)
  }

  def workloadSearchTrainedOracle(k: Int = 10, iters: Int = 5): String =
    trainedSearchOracle(k, 0, iters, sampled = false, queryPred = Knn.workloadPredSql())

  /** v16f: metadata filter on the TRAINED-IVF path — completes the
    * filter × index-family matrix (flat v16, untrained IVF v16b, LSH
    * v16c, free-form v16d/e) on the production trained quantizer. The
    * lists are built over the FULL corpus (reference semantics: filters
    * restrict search candidates, not index membership — models.py:48);
    * the label predicate lands on the candidate-side embeddings scan as
    * a PUSHED filter, so the probe reads probed-cluster rows ∩ matching
    * row-groups and unmatching vectors are never scored. */
  def searchTrainedFiltered(spark: SparkSession, dir: String, labels: Seq[Int] = Seq(2, 5),
                            k: Int = 10, nQueries: Int = 8, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    // query/assignment side — uncached (see searchTrained: a body-scoped
    // corpus cache would die before the returned plan runs, and the 100×
    // intent is that ONLY the candidate scan below touches the corpus
    // with its pushed label predicate)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = trainedCentroidsFor(spark, dir, iters)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val assigned = assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
    // fresh scan with the label predicate so it pushes to parquet
    val candidates = Tables.embeddings(spark, dir)
      .filter(col("label").isin(labels: _*))
      .select(col("vec_id"), col("embedding"))
    val scored = assigned.join(broadcast(probesFor(queries, mat, spark)), Seq("cluster_id"))
      .select(col("qid"), col("vec_id"))
      .join(candidates, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k)
  }

  def searchTrainedFilteredOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10,
                                  nQueries: Int = 8, iters: Int = 5): String =
    s"""${trainCtes(iters)}
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |            FROM q CROSS JOIN c$iters c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= $Probes),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.v, q.qvec) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id
       |                     JOIN embeddings emb ON cand.vec_id = emb.vec_id
       |                     JOIN q ON cand.qid = q.qid
       |           WHERE emb.label IN (${labels.mkString(", ")})),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v25: the recall@k evaluation harness — the measurement loop every
    * production ANN deployment runs continuously: the trained-IVF
    * approximate results (v14) joined against the exact flat ground truth
    * (v1), per-query hit counts out. Approximation quality becomes a
    * QUERY over two existing query plans; at 100 TB the ground-truth arm
    * runs over a fixed query sample (here: the same Q=8 convention both
    * arms already use) — the corpus-side cost is the two searches
    * themselves, the join touches Q·k rows. `hits` is an exact integer
    * and `recall` the same IEEE division of the same small ints in both
    * engines, so the metric itself hash-gates (the reference eyeballs
    * this comparison in its index tests; here it is a gated artifact). */
  def recallEval(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    val approx = searchTrained(spark, dir, k, nQueries)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
    Knn.flatSearch(spark, dir, "cosine", k, nQueries)
      .select(col("qid"), col("vec_id"))
      .join(approx, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("qid"), col("hits"), lit(k.toLong).as("k"),
        (col("hits").cast("double") / lit(k.toDouble)).as("recall"))
      .orderBy("qid")
  }

  def recallEvalOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH a AS (SELECT qid, vec_id FROM (${trainedSearchOracle(k, nQueries)})),
       |x AS (SELECT qid, vec_id FROM (${Knn.oracleFlat("cosine", k, nQueries)})),
       |h AS (SELECT x.qid, CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END AS hit
       |      FROM x LEFT JOIN a ON x.qid = a.qid AND x.vec_id = a.vec_id)
       |SELECT qid, sum(hit)::BIGINT AS hits, $k::BIGINT AS k,
       |       sum(hit)::DOUBLE / $k AS recall
       |FROM h GROUP BY qid ORDER BY qid""".stripMargin

  /** Rank discounts 1/log₂(r+1) for r = 1..k, quantized to 8-dp
    * fixed-point — computed ONCE driver-side and injected as literals
    * into BOTH engines' queries, so NDCG needs no cross-engine libm-log
    * parity at all: the per-rank terms are identical integers by
    * construction and the per-query DCG is an exact long sum
    * (order-independent, like every other gated sketch sum). */
  private def ndcgDiscQ8(k: Int): Array[Long] =
    (1 to k).map(r => math.floor(1e8 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong).toArray

  /** v31: NDCG@k of the trained-IVF search against the exact flat top-k
    * (binary relevance: a returned id is relevant iff the exact search
    * returns it) — the position-sensitive eval metric that complements
    * v25's recall: losing the top hit to rank k now costs score. IDCG is
    * the all-hits-first prefix sum of the same discount table, indexed by
    * the hit count; the one float op is the final dcg/idcg divide, which
    * runs on bit-identical long inputs in both engines and is fixed-point
    * quantized like v20. Plan shape = v25's: two searches, one broadcast
    * hash join on (qid, vec_id), one partial agg — eval cost scales with
    * Q·k, never the corpus. */
  def ndcgEval(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    val disc = ndcgDiscQ8(k)
    val cum = disc.scanLeft(0L)(_ + _).tail
    val discArr = array(disc.map(lit): _*)
    val cumArr = array(cum.map(lit): _*)
    val exact = Knn.flatSearch(spark, dir, "cosine", k, nQueries)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
    searchTrained(spark, dir, k, nQueries)
      .select(col("qid"), col("vec_id"), col("rank"))
      .join(exact, Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(coalesce(col("hit"), lit(0L))).as("hits"),
        sum(when(col("hit") === 1L,
          element_at(discArr, col("rank").cast("int"))).otherwise(0L)).as("dcg_q8"))
      .select(col("qid"), col("hits"), col("dcg_q8"),
        when(col("hits") === 0L, lit(0L)).otherwise(
          floor(col("dcg_q8").cast("double") /
            element_at(cumArr, col("hits").cast("int")).cast("double") * 10000d + 0.5d)
            .cast("long")).as("ndcg_q4"))
      .orderBy("qid")
  }

  def ndcgEvalOracle(k: Int = 10, nQueries: Int = 8): String = {
    val disc = ndcgDiscQ8(k)
    val cum = disc.scanLeft(0L)(_ + _).tail
    s"""WITH a AS (SELECT qid, vec_id, rank FROM (${trainedSearchOracle(k, nQueries)})),
       |x AS (SELECT qid, vec_id FROM (${Knn.oracleFlat("cosine", k, nQueries)})),
       |h AS (SELECT a.qid, a.rank, CASE WHEN x.vec_id IS NULL THEN 0 ELSE 1 END AS hit
       |      FROM a LEFT JOIN x ON a.qid = x.qid AND a.vec_id = x.vec_id),
       |g AS (SELECT qid, sum(hit)::BIGINT AS hits,
       |             sum(CASE WHEN hit = 1
       |                      THEN list_extract([${disc.mkString(", ")}], rank::INT)
       |                      ELSE 0 END)::BIGINT AS dcg_q8
       |      FROM h GROUP BY qid)
       |SELECT qid, hits, dcg_q8,
       |       CASE WHEN hits = 0 THEN 0
       |            ELSE floor(dcg_q8::DOUBLE /
       |                       list_extract([${cum.mkString(", ")}], hits::INT)::DOUBLE
       |                       * 10000 + 0.5)::BIGINT END AS ndcg_q4
       |FROM g ORDER BY qid""".stripMargin
  }

  /** DuckDB replay of [[kmeans]] (v8): the same training CTEs, reduced to
    * the per-cluster (count, avg sim) training trace. The avg is the one
    * aggregation-order-dependent float in the output — rounded to 4 dp on
    * both engines like every other gated mean. */
  def kmeansOracle(iters: Int = 5): String =
    s"""${trainCtes(iters)}
       |g AS (SELECT cluster_id, count(*) AS n, round(avg(sim), 4) AS avg_sim
       |      FROM assigned GROUP BY cluster_id)
       |SELECT cluster_id, n, avg_sim FROM g ORDER BY cluster_id""".stripMargin

  /** v8b sample fraction: keep `vec_id` ⟺ h60("kms:"+vec_id) mod 10 < 4
    * (~40%). The t8/t18 rule — sampling is a pure content hash, so the
    * training set is identical under any partitioning and in any engine. */
  val SampleMod = 10L
  val SampleKeep = 4L

  private def samplePredCol = (Dedup.h60(concat(lit("kms:"),
    col("vec_id").cast("string"))) % SampleMod) < SampleKeep

  private[operators] def samplePredSql: String =
    s"(CAST('0x' || substr(md5('kms:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT))" +
      s" % $SampleMod < $SampleKeep"

  /** v8b: k-means trained on a bounded SAMPLE — the production trainer
    * shape (FAISS convention) v8 deliberately overstates: v8 scans the
    * full corpus 5× because the reference does (ivf.py:214), but at
    * 100 TB nobody Lloyd's-iterates the corpus — you train on a sample
    * whose size is set by k·d statistics, then assign the full corpus
    * ONCE against the trained matrix. Here the sample is the
    * deterministic ~40% hash slice above (at scale the same predicate
    * with a smaller keep rate — cost is `keep/mod` of a v8 iteration,
    * DECOUPLED from corpus growth by turning the knob), init is the
    * first K sample members by id, and the reported training trace is
    * the same per-cluster (n, avg_sim) summary as v8 over the FULL
    * corpus assignment. Oracle-gated by replaying the identical sampled
    * iterations as unrolled CTEs — grid-quantized accumulation makes the
    * sampled training exactly as replayable as the full one. */
  /** The sampled training run itself (no memo — the callers are build
    * operations that should price training; it costs `keep/mod` of a v8
    * run): cache the SLICE (re-read per iteration), init from its first
    * K members by id. */
  private[graft] def sampledCentroids(spark: SparkSession, emb: DataFrame,
                                      iters: Int): Array[(Long, Array[Double])] = {
    // the training slice is re-read every iteration — cache IT (not the
    // corpus; full-corpus passes stream the parquet scan)
    val train = emb.filter(samplePredCol).cache()
    try {
      val init = train.orderBy("vec_id").limit(K).collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
      }
      trainCentroids(spark, train, iters, Some(init))
    } finally train.unpersist()
  }

  def kmeansSampled(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    assignToMat(emb, sampledCentroids(spark, emb, iters))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), round(avg(col("sim")), 4).as("avg_sim"))
      .orderBy("cluster_id")
  }

  def kmeansSampledOracle(iters: Int = 5): String =
    s"""${trainCtes(iters, sampled = true)}
       |g AS (SELECT cluster_id, count(*) AS n, round(avg(sim), 4) AS avg_sim
       |      FROM assigned GROUP BY cluster_id)
       |SELECT cluster_id, n, avg_sim FROM g ORDER BY cluster_id""".stripMargin

  /** The shared training replay: `WITH` chain ending in the trained matrix
    * `c<iters>(cid, cvec)` and the full-corpus `assigned(vec_id,
    * cluster_id, sim)` against it (trailing comma — callers append their
    * tail CTEs). Shared with [[IvfPq.searchTrainedOracle]], which appends
    * residual + PQ-training CTEs after it. */
  /** The unrolled Lloyd's-iteration CTE chain alone (c0 → c`iters`),
    * reading the corpus from CTEs named `te`/`ten` — extracted from
    * [[trainCtes]] so oracles over a DERIVED corpus (e.g. the facade
    * fold in [[FacadeServe]]) can replay the identical training with
    * their own `e`/`en` definitions. Emits a trailing comma. */
  private[operators] def kmeansIterCtes(iters: Int, te: String = "e",
                                        ten: String = "en"): String = {
    val Q = Graft.QuantScale
    val d = 64
    (1 to iters).map { t =>
      val p = s"c${t - 1}"
      // AS MATERIALIZED on every state CTE: each is referenced 2-4 times by
      // the following iteration — inlined, the 5-deep chain re-expands
      // multiplicatively and DuckDB never finishes.
      s"""a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, p.cid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |                            ORDER BY list_cosine_similarity(e.v, p.cvec) DESC, p.cid) AS rn
         |  FROM $te e CROSS JOIN $p p) WHERE rn = 1),
         |x$t AS (SELECT a.cid,
         |               unnest([floor((CASE WHEN n.nrm > 0 THEN y * (1.0 / n.nrm) ELSE y END) * $Q + 0.5) / $Q
         |                       for y in n.v]) AS xq,
         |               unnest([i for i in generate_series(1, $d)]) AS i
         |        FROM a$t a JOIN $ten n USING (vec_id)),
         |g$t AS (SELECT cid, list(s ORDER BY i) AS vsum FROM (
         |          SELECT cid, i, sum(xq) AS s FROM x$t GROUP BY cid, i) GROUP BY cid),
         |u$t AS MATERIALIZED (SELECT cid, CASE WHEN n2 > 0 THEN [y / n2 for y in vsum] ELSE vsum END AS cvec
         |        FROM (SELECT cid, vsum, sqrt(list_inner_product(vsum, vsum)) AS n2 FROM g$t)),
         |me$t AS (SELECT cid, row_number() OVER (ORDER BY cid) AS rn
         |         FROM $p WHERE cid NOT IN (SELECT cid FROM u$t)),
         |fs$t AS (SELECT n.vec_id, n.v, n.nrm, max(list_cosine_similarity(n.v, u.cvec)) AS ms
         |         FROM $ten n CROSS JOIN u$t u GROUP BY n.vec_id, n.v, n.nrm),
         |fv$t AS (SELECT row_number() OVER (ORDER BY ms ASC, vec_id ASC) AS rn,
         |                CASE WHEN nrm > 0 THEN [y / nrm for y in v] ELSE v END AS cvec
         |         FROM fs$t),
         |c$t AS MATERIALIZED (SELECT p.cid, COALESCE(u.cvec, f.cvec, p.cvec) AS cvec
         |        FROM $p p
         |        LEFT JOIN u$t u USING (cid)
         |        LEFT JOIN me$t me USING (cid)
         |        LEFT JOIN fv$t f ON me.rn = f.rn),""".stripMargin
    }.mkString("\n")
  }

  private[operators] def trainCtes(iters: Int, sampled: Boolean = false): String = {
    // training reads the (possibly sampled) slice; the final full-corpus
    // assignment below always reads `e`/`en`
    val te = if (sampled) "es" else "e"
    val ten = if (sampled) "ens" else "en"
    val iterCtes = kmeansIterCtes(iters, te, ten)
    // sampled init: first K SAMPLE members by id (the full-corpus c0 keeps
    // its vec_id < K form so existing oracles stay byte-stable)
    val sampleCtes =
      if (!sampled) ""
      else s"""es AS MATERIALIZED (SELECT * FROM e WHERE $samplePredSql),
              |ens AS MATERIALIZED (SELECT * FROM en WHERE $samplePredSql),
              |""".stripMargin
    val c0 =
      if (sampled) s"c0 AS (SELECT vec_id AS cid, v AS cvec FROM es ORDER BY vec_id LIMIT $K)"
      else s"c0 AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $K)"
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |en AS MATERIALIZED (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
       |$sampleCtes$c0,
       |$iterCtes
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim
       |             FROM e CROSS JOIN c$iters c),
       |assigned AS MATERIALIZED (SELECT vec_id, cid AS cluster_id, sim FROM (
       |  SELECT vec_id, cid, sim, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |  FROM assign_s) WHERE rn = 1),""".stripMargin
  }

  /** The v53 size sidecar — the persisted K-row (cluster_id, csize)
    * table written BESIDE the inverted lists by the build (one partial
    * agg over the just-written artifact, so sidecar ≡ lists by
    * construction). This is the index metadata the adaptive probe budget
    * reads at query time; the streaming ingest path maintains the same
    * metadata incrementally ([[graft.streaming.Streams.ivfIngestStream]]
    * writes per-batch increment directories whose SUM-fold equals this
    * table). */
  private[graft] def v53SizeSidecar(spark: SparkSession): DataFrame =
    spark.read.parquet(Persist.tablePath(spark, "graft_idx_ivf_adaptive_sizes"))

  /** v53: ADAPTIVE PROBE BUDGET — per-query nprobe chosen by CANDIDATE
    * MASS instead of a fixed count (the production IVF tuning answer to
    * skewed inverted lists: a fixed nprobe=4 reads 4 tiny lists for one
    * query and 4 huge ones for another — recall and cost both swing).
    * Each query probes the SMALLEST prefix of its similarity-ranked
    * centroids whose cumulative LIST SIZE reaches the budget (corpus/5,
    * derived exactly as Σcsize/5 from the sidecar), so every query scans
    * a comparable candidate volume and n_probed varies per query with
    * the lists it happens to rank first. The decision runs ENTIRELY on
    * persisted INDEX METADATA — the K-row size sidecar the build wrote
    * beside the lists ([[v53SizeSidecar]]; spec-asserted: the decision's
    * only file scan is the sidecar, never the corpus or the lists) —
    * and the serving tail is the standard probe-pruned scan of the
    * PERSISTED lists (partition directories, file-listing-time pruning).
    * The emitted `n_probed` column puts the per-query decision inside
    * the hash gate. (Reference anchor: the fixed `nprobe` constant in
    * app/core/indexes/ivf.py — this is its workload-robust replacement.) */
  def adaptiveProbeSearch(spark: SparkSession, dir: String, k: Int = 10,
                          nQueries: Int = 8, budgetDen: Long = 5L): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = collectCentroids(centroidsFixed(spark, dir))
    // BUILD: persisted inverted lists + the size sidecar (one partial agg
    // over the written artifact — the only corpus scans in this operator;
    // at 100 TB this phase is the nightly index job, not the query path)
    val listsPath = Persist.tablePath(spark, "graft_idx_ivf_adaptive")
    Sinks.writePartitioned(
      assignToMat(emb, mat).select(col("vec_id"), col("embedding"), col("cluster_id")),
      listsPath, "cluster_id")
    spark.read.parquet(listsPath)
      .groupBy(col("cluster_id").cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("csize"))
      .coalesce(1).write.mode("overwrite")
      .parquet(Persist.tablePath(spark, "graft_idx_ivf_adaptive_sizes"))

    // DECISION: index metadata only — K sidecar rows of driver state;
    // corpus size is their sum (every vector lives in exactly one list)
    val sizeMap: Map[Long, Long] = v53SizeSidecar(spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budget = sizeMap.values.sum / budgetDen // one long of driver state

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // the same centroid frame + cosine probesFor uses — bit-identical sims
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val centDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mat.toSeq.map { case (id, v) => Row(id, v.toSeq) }, 1),
      schema)
    val bySim = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cluster_id"))
    val probePairs = queries.crossJoin(broadcast(centDf))
      .withColumn("sim", Graft.cosine(col("qvec"), col("cvec")))
      .select(col("qid"), col("cid").as("cluster_id"), col("sim"))
      .withColumn("csize", element_at(typedLit(sizeMap), col("cluster_id")))
      .withColumn("cum", sum(col("csize")).over(
        bySim.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("cum") - col("csize") < budget) // minimal covering prefix
      .select(col("qid"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))) // Q×nprobe: bounded
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")
    val nProbes = spark.createDataFrame(
      probePairs.groupBy(_._1).map { case (q, ps) => (q, ps.length.toLong) }.toSeq)
      .toDF("qid", "n_probed")

    // SERVE: probe-pruned scan of the persisted lists — the static IN
    // prunes list DIRECTORIES at file-listing time (v44's serving shape)
    val scored = spark.read.parquet(listsPath)
      .filter(col("cluster_id").isin(probedClusters: _*))
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k)
      .join(broadcast(nProbes), Seq("qid"))
      .select(col("qid"), col("rank"), col("vec_id"), col("score"), col("n_probed"))
      .orderBy("qid", "rank")
  }

  def adaptiveProbeSearchOracle(k: Int = 10, nQueries: Int = 8,
                                budgetDen: Long = 5L): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |b AS (SELECT (count(*) // $budgetDen)::BIGINT AS budget FROM embeddings),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |             FROM embeddings e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |  FROM assign_s) WHERE rn = 1),
       |sz AS (SELECT cluster_id, count(*)::BIGINT AS csize FROM assigned GROUP BY 1),
       |r AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS sim FROM q CROSS JOIN c),
       |pr AS (SELECT r.qid, r.cid, sz.csize,
       |              sum(sz.csize) OVER (PARTITION BY r.qid ORDER BY r.sim DESC, r.cid
       |                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
       |       FROM r JOIN sz ON r.cid = sz.cluster_id),
       |probes AS (SELECT qid, cid FROM pr, b WHERE cum - csize < b.budget),
       |np AS (SELECT qid, count(*)::BIGINT AS n_probed FROM probes GROUP BY 1),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |rk AS (SELECT qid, vec_id, score,
       |              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |       FROM scored)
       |SELECT rk.qid, rk.rank, rk.vec_id, round(rk.score, 4) AS score, np.n_probed
       |FROM rk JOIN np ON rk.qid = np.qid WHERE rk.rank <= $k ORDER BY rk.qid, rk.rank""".stripMargin

  /** The v55 decision inputs — off-diagonal drift mass, the old index's
    * largest inverted list, total vectors (three longs) — computed
    * ENTIRELY from the persisted retrain report (the K²-bounded
    * migration matrix [[retrainDecisionSearch]] writes): the subtree's
    * only file scan is `graft_retrain_report` (spec-asserted), never
    * the corpus. Row marginals of the migration matrix ARE the old
    * index's occupancy (v41's signal), so one artifact feeds both
    * criteria. */
  private[graft] def v55DecisionInputs(spark: SparkSession): DataFrame = {
    val marg = spark.read.parquet(Persist.tablePath(spark, "graft_retrain_report"))
      .groupBy(col("from_cid"))
      .agg(sum(col("n_vecs")).as("list_sz"),
        sum(when(col("from_cid") =!= col("to_cid"), col("n_vecs"))
          .otherwise(0L)).as("off"))
    marg.agg(
      coalesce(sum(col("off")), lit(0L)).as("off_diag"),
      coalesce(max(col("list_sz")), lit(0L)).as("max_list"),
      coalesce(sum(col("list_sz")), lit(0L)).as("n_total"))
  }

  /** v55: RETRAIN-OR-KEEP — the index-maintenance decision loop every
    * production ANN deployment runs, composing the two health signals
    * this engine already monitors (v47's centroid-drift migration
    * matrix, v41's occupancy skew) into a GATED rebuild trigger. The
    * monitoring job — ONE map-only corpus scan carrying both
    * generations' assignments against two broadcast K×d literals, one
    * K²-bounded partial agg — PERSISTS the retrain report; the DECISION
    * then reads three longs from that artifact (never the corpus: the
    * v51/v53 artifact discipline applied to index maintenance,
    * spec-asserted) and retrains iff
    *   off_diag·driftDen ≥ n_total  (assignment churn ≥ 1/driftDen), or
    *   max_list·occDen ≥ n_total   (one list holds ≥ 1/occDen of all) —
    * EXACT arbitrary-precision integer compares, so both engines take
    * the same branch at every SF. On RETRAIN the v44 shard-parallel
    * rebuild runs with the refreshed matrix (independent per-shard
    * map-only jobs under one parent root — at 100 TB the rebuild is the
    * decision's whole COST, which is why it must be gated) and serving
    * is the probe-pruned scan of the new lists, ≡ a fresh monolithic
    * train by construction — the oracle replays exactly that; on KEEP
    * serving stays on the old model. The decision AND its three inputs
    * ride every output row, inside the hash gate. (Reference anchor:
    * the unconditional rebuild-on-startup walk, vector_db.py:272-292 —
    * this is its measured, gated replacement.) */
  def retrainDecisionSearch(spark: SparkSession, dir: String, k: Int = 10,
                            nQueries: Int = 8, oldIters: Int = 3,
                            newIters: Int = 5, driftDen: Long = 60L,
                            occDen: Long = 4L, nShards: Int = 2): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val oldMat = trainedCentroidsFor(spark, dir, oldIters)
    val newMat = trainedCentroidsFor(spark, dir, newIters)
    // MONITORING: persist the drift report (v47's matrix; row marginals
    // are the old index's occupancy) — the nightly job, not the query path
    def cvecs(m: Array[(Long, Array[Double])]): Column = typedLit(m.map(_._2.toSeq).toSeq)
    def cids(m: Array[(Long, Array[Double])]): Column = typedLit(m.map(_._1).toSeq)
    emb
      .withColumn("nco", Graft.nearestCentroid(col("embedding"), cvecs(oldMat)))
      .withColumn("ncn", Graft.nearestCentroid(col("embedding"), cvecs(newMat)))
      .select(
        element_at(cids(oldMat), col("nco.idx") + 1).as("from_cid"),
        element_at(cids(newMat), col("ncn.idx") + 1).as("to_cid"))
      .groupBy(col("from_cid"), col("to_cid"))
      .agg(count(lit(1)).as("n_vecs"))
      .coalesce(1).write.mode("overwrite")
      .parquet(Persist.tablePath(spark, "graft_retrain_report"))
    // DECISION: three longs of driver state from the artifact
    val r = v55DecisionInputs(spark).head()
    val (offDiag, maxList, total) =
      (r.getAs[Long]("off_diag"), r.getAs[Long]("max_list"), r.getAs[Long]("n_total"))
    val retrain =
      BigInt(offDiag) * BigInt(driftDen) >= BigInt(total) ||
        BigInt(maxList) * BigInt(occDen) >= BigInt(total)
    val hits =
      if (retrain) {
        // v44 sharded rebuild with the refreshed matrix, probe-pruned serve
        val parent = Persist.tablePath(spark, "graft_idx_ivf_retrained")
        Persist.dropIndexTable(spark, "graft_idx_ivf_retrained")
        (0 until nShards).foreach { s =>
          graft.sources.Sinks.writePartitioned(
            assignToMat(emb.filter(col("vec_id") % nShards === s), newMat)
              .select(col("vec_id"), col("embedding"), col("cluster_id")),
            s"$parent/shard=$s", "cluster_id")
        }
        Persist.probedListsSearch(spark, emb, parent, newMat, k, nQueries)
      } else {
        // keep: serve the standing old-model index (v14's plan shape)
        val queries = emb.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val scored = assignToMat(emb, oldMat).select(col("vec_id"), col("cluster_id"))
          .join(broadcast(probesFor(queries, oldMat, spark)), Seq("cluster_id"))
          .select(col("qid"), col("vec_id"))
          .join(emb, Seq("vec_id"))
          .join(broadcast(queries), Seq("qid"))
          .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
          .select(col("qid"), col("vec_id"), col("score"))
        Knn.topkPerQuery(scored, "cosine", k)
      }
    hits
      .withColumn("decision", lit(if (retrain) "retrain" else "keep"))
      .withColumn("off_diag", lit(offDiag))
      .withColumn("max_list", lit(maxList))
      .withColumn("n_total", lit(total))
  }

  def retrainDecisionSearchOracle(k: Int = 10, nQueries: Int = 8,
                                  oldIters: Int = 3, newIters: Int = 5,
                                  driftDen: Long = 60L, occDen: Long = 4L): String =
    s"""${trainCtes(newIters)}
       |ao AS (SELECT vec_id, cid AS from_cid FROM (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cid) AS rn
       |  FROM e CROSS JOIN c$oldIters c) WHERE rn = 1),
       |mig AS (SELECT ao.from_cid, a.cluster_id AS to_cid, count(*)::BIGINT AS n_vecs
       |        FROM ao JOIN assigned a USING (vec_id) GROUP BY 1, 2),
       |marg AS (SELECT from_cid, sum(n_vecs)::BIGINT AS list_sz,
       |                sum(CASE WHEN from_cid <> to_cid THEN n_vecs ELSE 0 END)::BIGINT AS off
       |         FROM mig GROUP BY 1),
       |dec AS (SELECT sum(off)::BIGINT AS off_diag, max(list_sz)::BIGINT AS max_list,
       |               sum(list_sz)::BIGINT AS n_total FROM marg),
       |flag AS (SELECT (off_diag * $driftDen >= n_total OR max_list * $occDen >= n_total) AS retrain
       |         FROM dec),
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |rp_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |         FROM q CROSS JOIN c$newIters c WHERE (SELECT retrain FROM flag)),
       |rp AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM rp_s)
       |  WHERE rn <= $Probes),
       |rs AS (SELECT p.qid, a.vec_id, list_cosine_similarity(e.v, q.qvec) AS score
       |       FROM assigned a JOIN rp p ON a.cluster_id = p.cid
       |            JOIN e ON a.vec_id = e.vec_id JOIN q ON p.qid = q.qid),
       |rr AS (SELECT qid, vec_id, score,
       |              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM rs),
       |kp_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |         FROM q CROSS JOIN c$oldIters c WHERE NOT (SELECT retrain FROM flag)),
       |kp AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM kp_s)
       |  WHERE rn <= $Probes),
       |ks AS (SELECT p.qid, ao.vec_id, list_cosine_similarity(e.v, q.qvec) AS score
       |       FROM ao JOIN kp p ON ao.from_cid = p.cid
       |            JOIN e ON ao.vec_id = e.vec_id JOIN q ON p.qid = q.qid),
       |kr AS (SELECT qid, vec_id, score,
       |              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM ks),
       |u AS (SELECT * FROM rr UNION ALL SELECT * FROM kr)
       |SELECT u.qid, u.rank, u.vec_id, round(u.score, 4) AS score,
       |       CASE WHEN (SELECT retrain FROM flag) THEN 'retrain' ELSE 'keep' END AS decision,
       |       dec.off_diag, dec.max_list, dec.n_total
       |FROM u, dec WHERE u.rank <= $k ORDER BY u.qid, u.rank""".stripMargin

  /** v56: BASE+DELTA SERVING over a standing persisted index — the exact
    * reconciliation discipline [[graft.api.GraftDb.searchAll]] runs at
    * the facade, gated at the registry level with a full SQL oracle. The
    * nightly build indexed only the BASE slice (vec_id % 10 ≠ 3); since
    * then a DELETE tombstone set landed (base ids with vec_id % 17 = 2 —
    * the input table standing in for the delta-sized tombstone log) and
    * NEW vectors arrived (vec_id % 10 = 3) that no rebuild has folded in
    * yet. ONE serving plan reconciles all three: the probe-pruned scan
    * of the persisted lists (partition directories only, file-listing-
    * time pruning), MINUS the tombstoned ids (anti-join), PLUS the delta
    * assigned on the fly with the SAME matrix and restricted to the same
    * probed clusters — so the result is bit-identical to a fresh full
    * build over the merged live corpus (the oracle replays exactly
    * that), while the engine never rewrites a sealed list file between
    * rebuilds. At 100 TB this is how every segment-based ANN store
    * serves writes (sealed segments + a mutable tail + a tombstone
    * mask, reconciled at query time); the reference's add/delete on a
    * standing index (vector_db.py:118-168) is the single-node special
    * case. */
  def baseDeltaListsSearch(spark: SparkSession, dir: String, k: Int = 10,
                           nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = collectCentroids(centroidsFixed(spark, dir))
    // nightly build: sealed lists over the BASE slice only
    val listsPath = Persist.tablePath(spark, "graft_idx_ivf_basedelta")
    Sinks.writePartitioned(
      assignToMat(emb.filter(pmod(col("vec_id"), lit(10)) =!= 3), mat)
        .select(col("vec_id"), col("embedding"), col("cluster_id")),
      listsPath, "cluster_id")

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probePairs = probesFor(queries, mat, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // Q×Probes: bounded
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    // the tombstone mask (delta-sized in production) and the unfolded tail
    val deleted = emb.filter(pmod(col("vec_id"), lit(10)) =!= 3 &&
      pmod(col("vec_id"), lit(17)) === 2).select(col("vec_id"))
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 3)

    val base = spark.read.parquet(listsPath)
      .filter(col("cluster_id").isin(probedClusters: _*)) // partition pruning
      .join(deleted, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
    val deltaAssigned = assignToMat(delta, mat)
      .filter(col("cluster_id").isin(probedClusters: _*))
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
    val scored = base.unionByName(deltaAssigned)
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k).orderBy("qid", "rank")
  }

  def baseDeltaListsSearchOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < $K),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |live AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |         WHERE (vec_id % 10 = 3) OR (vec_id % 17 <> 2)),
       |assign_s AS (SELECT l.vec_id, c.cid, list_cosine_similarity(l.v, c.cvec) AS sim
       |             FROM live l CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |  FROM assign_s) WHERE rn = 1),
       |ps AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM ps)
       |  WHERE rn <= $Probes),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
}
