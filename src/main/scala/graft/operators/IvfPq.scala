package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Tables

/** v19: IVF-PQ (IVFADC, Jégou et al. TPAMI 2011 §IV) — THE canonical
  * billion-scale ANN architecture, composed from this engine's existing
  * pieces: the IVF coarse quantizer bounds the search to probed inverted
  * lists (partition pruning at scale, see p3), PQ codes the RESIDUAL
  * `x − centroid(x)` in M×4 bits (the 64× footprint cut, see v18), ADC
  * scores candidates against the reconstruction `centroid + codebook[code]`
  * without ever touching the raw vectors, and an exact re-rank of the ADC
  * top-`refine` closes the quantization noise (FAISS IndexRefineFlat).
  *
  * At 100 TB the scan cost is: probed partitions only × 4 B/vector codes,
  * plus a Q×refine point-lookup — neither term touches the full float
  * corpus. Every step here is map-only or a broadcast equi-join; the one
  * corpus-sized shuffle is the final per-query TopK partial aggregate.
  *
  * Deterministic conventions (so the WHOLE pipeline — assignment,
  * residuals, codes, ADC, refine — is replayed exactly by the DuckDB
  * oracle): coarse centroids = first `Ivf.K` vectors (v6), residual
  * codebooks = residual subvectors of vectors `[K, 2K)` (nonzero by
  * construction — the first K vectors' own residuals are identically 0),
  * ties always to the lowest id. A trained variant would drop in v8's
  * k-means + v18b's per-subspace training unchanged.
  */
object IvfPq {

  /** Residual table (vec_id, cluster_id, r) — ONE map-only pass: assign,
    * look the centroid up from the broadcast literal, subtract. */
  private def residuals(emb: DataFrame, mat: Array[(Long, Array[Double])]): DataFrame = {
    val cvecs = typedLit(mat.map(_._2.toSeq).toSeq) // position = cid (contiguous 0..K-1)
    Ivf.assignToMat(emb, mat)
      .withColumn("cvec", element_at(cvecs, col("cluster_id").cast("int") + 1))
      .withColumn("r",
        expr("zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), cvec, (x, c) -> x - c)"))
      .select(col("vec_id"), col("cluster_id"), col("r"))
  }

  /** Residual subvectors (vec_id, cluster_id, m, sv). */
  private def residualSub(resid: DataFrame): DataFrame =
    resid
      .select(col("vec_id"), col("cluster_id"),
        explode(sequence(lit(0), lit(Pq.M - 1))).as("m"), col("r"))
      .select(col("vec_id"), col("cluster_id"), col("m"),
        slice(col("r"), col("m") * Pq.Sub + 1, lit(Pq.Sub)).as("sv"))

  def search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
             refine: Int = 32): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))

    val resid = residuals(emb, mat)
    // materialize ONCE: the codebook collect job below and the final
    // encode+ADC plan both read rsub — without this the assign + residual +
    // explode subtree runs twice (same reason Pq.searchTrained checkpoints
    // its subvector table).
    val rsub = residualSub(resid).localCheckpoint()

    // residual codebooks: subvectors of vectors [K, 2K), collected to the
    // driver (M × K × Sub doubles) → map-only grouped-argmin encode
    val cbRows = rsub.filter(col("vec_id") >= Ivf.K && col("vec_id") < 2 * Ivf.K)
      .select(col("vec_id"), col("m"), col("sv")).collect()
      .map(r => (r.getInt(1).toLong, r.getLong(0), r.getSeq[Double](2).toArray))
    val cb: Map[Long, Array[Array[Double]]] =
      cbRows.groupBy(_._1).map { case (m, rows) => m -> rows.sortBy(_._2).map(_._3) }
    adcSearch(spark, emb, mat, cb, rsub, k, nQueries, refine)
  }

  /** v33: IVFADC for the external query workload table ([[Knn.queryTable]])
    * — the last workload × index-family cell (flat v26, IVF v27, LSH v29,
    * PQ v30, trained IVF v32): probes and ADC query subvectors come from
    * the workload scan; codes, codebooks and the refine tail are
    * [[search]] unchanged. */
  def workloadSearch(spark: SparkSession, dir: String, k: Int = 10,
                     refine: Int = 32): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))
    val rsub = residualSub(residuals(emb, mat)).localCheckpoint()
    val cbRows = rsub.filter(col("vec_id") >= Ivf.K && col("vec_id") < 2 * Ivf.K)
      .select(col("vec_id"), col("m"), col("sv")).collect()
      .map(r => (r.getInt(1).toLong, r.getLong(0), r.getSeq[Double](2).toArray))
    val cb: Map[Long, Array[Array[Double]]] =
      cbRows.groupBy(_._1).map { case (m, rows) => m -> rows.sortBy(_._2).map(_._3) }
    val queries = Knn.queryTable(spark, dir)
    adcFromCodes(spark, emb, mat, cb, encodeCodes(rsub, cb),
      Ivf.probesFor(queries, mat, spark), k, queries, refine)
  }

  def workloadSearchOracle(k: Int = 10, refine: Int = 32): String =
    searchOracle(k, 0, refine, queryPred = Knn.workloadPredSql())

  /** v19b: IVFADC with a TRAINED coarse quantizer (v8's order-independent
    * k-means, [[Ivf.trainCentroids]]) AND TRAINED residual codebooks
    * (v18b's per-subspace Lloyd's, [[Pq.trainCodebooks]], run on the
    * residual subvectors) — the production FAISS `IVFx,PQy` shape
    * end-to-end. Identical ADC + exact-refine tail as [[search]]; only
    * where the two quantizers come from changes. Hash-gated: both
    * trainers accumulate grid-quantized values ([[Graft.vecQuantize]]),
    * so [[searchTrainedOracle]] replays coarse training, residuals,
    * codebook training, encode, ADC and refine bit-for-bit in DuckDB. */
  def searchTrained(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                    iters: Int = 5, refine: Int = 32): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val (mat, rsub, cb) = trainedQuantizers(spark, dir, iters)
    adcSearch(spark, emb, mat, cb, rsub, k, nQueries, refine)
  }

  /** Session-scoped trained-quantizer registry (coarse matrix, residual
    * subvector table, residual codebooks) per (session, dir, iters) —
    * the IVFADC half of [[Ivf.trainedCentroidsFor]]'s train-once
    * registry; v19b fills it, v19c serves its persisted artifact from the
    * same training. rsub is localCheckpointed (the codebook trainer's
    * iterations, the encode pass, and both callers re-read it); driver
    * state per entry is K×d + M×K×Sub doubles. */
  private val trainedCache = new BoundedMemo[
    (SparkSession, String, Int),
    (Array[(Long, Array[Double])], DataFrame, Map[Long, Array[Array[Double]]])](8)(
    v => BoundedMemo.unpersistDf(v._2))

  private def trainedQuantizers(spark: SparkSession, dir: String, iters: Int)
      : (Array[(Long, Array[Double])], DataFrame, Map[Long, Array[Array[Double]]]) =
    trainedCache.getOrElseUpdate((spark, dir, iters)) {
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
      try {
        val mat = Ivf.trainedCentroidsFor(spark, dir, iters)
        val rsub = residualSub(residuals(emb, mat)).localCheckpoint()
        val cb = Pq.trainCodebooks(rsub.select(col("vec_id"), col("m"), col("sv")), iters)
        (mat, rsub, cb)
      } finally emb.unpersist()
    }

  /** The IVFADC tail shared by the fixed-quantizer ([[search]]) and
    * trained ([[searchTrained]]) paths: map-only grouped-argmin encode,
    * probe pruning, broadcast-dim ADC, exact refine. `mat` must have
    * contiguous cids 0..K-1 (both [[Ivf.collectCentroids]] on the first-K
    * convention and [[Ivf.trainCentroids]] guarantee this). */
  private def adcSearch(spark: SparkSession, emb: DataFrame,
                        mat: Array[(Long, Array[Double])],
                        cb: Map[Long, Array[Array[Double]]], rsub: DataFrame,
                        k: Int, nQueries: Int, refine: Int): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    adcFromCodes(spark, emb, mat, cb, encodeCodes(rsub, cb),
      Ivf.probesFor(queries, mat, spark), k, queries, refine)
  }

  /** Map-only grouped-argmin encode: (vec_id, cluster_id, m, code). */
  private def encodeCodes(rsub: DataFrame,
                          cb: Map[Long, Array[Array[Double]]]): DataFrame = {
    val cbLit = typedLit(cb.map { case (m, cs) => m -> cs.map(_.toSeq).toSeq })
    rsub
      .withColumn("nc", Graft.nearestCentroidGroupedL2(col("sv"), col("m").cast("long"), cbLit))
      .select(col("vec_id"), col("cluster_id"), col("m").cast("long").as("m"), col("nc.idx").as("code"))
  }

  /** ADC + exact refine over an already-encoded code table and a
    * (qid, cluster_id) probe set — the serving tail shared by the
    * in-flight paths and the persisted-artifact path
    * ([[trainedPersistSearch]], which feeds partition-pruned reloaded
    * codes in). `mat` must have contiguous cids 0..K-1. */
  private[operators] def adcFromCodes(spark: SparkSession, emb: DataFrame,
                                      mat: Array[(Long, Array[Double])],
                                      cb: Map[Long, Array[Array[Double]]],
                                      codes: DataFrame, probes: DataFrame,
                                      k: Int, queries: DataFrame, refine: Int): DataFrame = {
    val cvecs = typedLit(mat.map(_._2.toSeq).toSeq) // position = cid

    // codebook + query subvectors as broadcast dims for ADC
    val cbDf = Ivf.codebookDf(spark, cb)
    val qsub = queries
      .select(col("qid"), expr("transform(qvec, x -> CAST(x AS DOUBLE))").as("qv"))
      .select(col("qid"), explode(sequence(lit(0), lit(Pq.M - 1))).as("m"), col("qv"))
      .select(col("qid"), col("m").cast("long").as("m"),
        slice(col("qv"), col("m") * Pq.Sub + 1, lit(Pq.Sub)).as("qm"))

    // ADC: candidates = codes of probed clusters; score = q·centroid +
    // Σ_m q_m · codebook[m][code]
    val parts = codes.join(broadcast(probes), Seq("cluster_id"))
      .join(broadcast(cbDf), Seq("m", "code"))
      .join(broadcast(qsub), Seq("qid", "m"))
      .select(col("qid"), col("vec_id"), col("cluster_id"), Graft.dot(col("cv"), col("qm")).as("p"))

    val adc = parts.groupBy(col("qid"), col("vec_id"), col("cluster_id"))
      .agg(sum(col("p")).as("rsum"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("base",
        Graft.dot(expr("transform(qvec, x -> CAST(x AS DOUBLE))"),
          element_at(cvecs, col("cluster_id").cast("int") + 1)))
      .select(col("qid"), col("vec_id"), (col("base") + col("rsum")).as("score"))

    // exact refine of the ADC top-`refine`
    Knn.exactRefine(adc, emb, queries, "dot", refine, k)
  }

  /** v19c: the trained IVFADC index as a PERSISTED ARTIFACT — what a
    * 100 TB deployment actually ships. Train both quantizers (v19b), then
    * write the three on-disk pieces FAISS serializes into an index file,
    * as tables sized for their roles:
    *   - codes: ONE row per vector `(vec_id, codes[M])`, hive-partitioned
    *     by the trained coarse cell — at scale this is M bytes/vector
    *     laid out so a probe reads ONLY the probed directories;
    *   - centroids (K rows) and codebooks (M×K rows): driver-sized dims.
    * Then RELOAD all three from parquet and serve: probes come from the
    * reloaded centroids, the code scan is partition-pruned to the probed
    * cells before the per-subspace explode (prune-then-explode, so the
    * unpacking work is bounded by the probe set, not the corpus), ADC +
    * exact refine as v19b. Doubles round-trip parquet bit-exactly, so the
    * served artifact must equal the in-flight v19b result bit-for-bit —
    * the driver hash-gates it against [[searchTrainedOracle]], and
    * PersistSpec asserts ≡-v19b plus the PartitionFilters prune.
    * (Reference analog: save/load of the trained index,
    * app/core/vector_db.py:272-292 rebuild-on-startup.) */
  def trainedPersistSearch(spark: SparkSession, dir: String, k: Int = 10,
                           nQueries: Int = 8, iters: Int = 5,
                           refine: Int = 32): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      // ---- build: trained quantizers from the session registry (train
      // once, serve many — v19b's training or this call's), then encode
      // and persist the artifact ----
      val (mat, rsub, cb) = trainedQuantizers(spark, dir, iters)

      val codesWide = encodeCodes(rsub, cb)
        .groupBy(col("vec_id"), col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"))
        .select(col("vec_id"), col("cluster_id"),
          expr("transform(mc, x -> x.code)").as("codes"))
      val codesPath = Persist.tablePath(spark, "graft_idx_ivfpq_codes")
      graft.sources.Sinks.writePartitioned(codesWide, codesPath, "cluster_id")

      import spark.implicits._
      val centPath = Persist.tablePath(spark, "graft_idx_ivfpq_centroids")
      // coalesce(1): K-row / M·K-row driver literals otherwise fan out to
      // min(rows, cores) one-row files (r17; same rationale as GraftDb's
      // changelog appends — fewer write tasks AND fewer footers to read back)
      mat.toSeq.map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(centPath)
      val cbPath = Persist.tablePath(spark, "graft_idx_ivfpq_codebooks")
      cb.toSeq.flatMap { case (m, cells) =>
        cells.zipWithIndex.map { case (cv, cell) => (m, cell, cv.toSeq) }
      }.toDF("m", "cell", "cv")
        .coalesce(1).write.mode("overwrite").parquet(cbPath)

      // ---- serve: reload every piece from storage ----
      val mat2: Array[(Long, Array[Double])] =
        spark.read.parquet(centPath).orderBy("cid").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val cb2: Map[Long, Array[Array[Double]]] =
        spark.read.parquet(cbPath).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
          .groupBy(_._1).map { case (m, rows) => m -> rows.sortBy(_._2).map(_._3) }

      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val probePairs = Ivf.probesFor(queries, mat2, spark).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val probedCells = probePairs.map(_._2).distinct.sorted.toIndexedSeq
      val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

      val codes = spark.read.parquet(codesPath)
        .filter(col("cluster_id").isin(probedCells: _*)) // partition pruning
        .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"),
          posexplode(col("codes")))
        .select(col("vec_id"), col("cluster_id"), col("pos").cast("long").as("m"),
          col("col").as("code"))

      adcFromCodes(spark, emb, mat2, cb2, codes, probeDf, k, queries, refine)
    } finally emb.unpersist()
  }

  /** v50: SHARD-PARALLEL coded construction — v44/v45's recipe applied to
    * the PQ family, completing coordination-free build across every
    * persisted index family (hash lists, sign words, and now codes).
    * Quantizers train ONCE on a sample-stable pass (the only global
    * step; reference anchor: the train/add split in
    * app/core/indexes/ivf.py:125-153 vs the per-vector rebuild walk in
    * app/core/vector_db.py:272-292) — then per-vector encoding is pure
    * map work (coarse assignment and per-subspace argmin read only the
    * row and the broadcast codebooks), so it COMMUTES with sharding:
    * each shard job encodes ITS vectors and writes packed code rows
    * under one parent root with `shard` as the leading free partition
    * column (`shard=N/cluster_id=M/`). At 100 TB that is 1000
    * executor-local encode jobs with no shuffle and no coordination,
    * restartable per shard, appendable for new feeds — while serving
    * stays a SINGLE scan of the parent whose cluster_id predicate prunes
    * directories inside every shard independently, feeding the identical
    * prune-then-explode ADC + exact-refine tail as monolithic v19c.
    * Result ≡ v19c BY CONSTRUCTION (train-once + map-only encode), and
    * that equivalence is the gate: the oracle is v19c's trained replay,
    * unchanged. IvfPqSpec additionally proves the shards partition the
    * corpus and the merged scan prunes to probed cells. */
  def shardedCodedBuildSearch(spark: SparkSession, dir: String, k: Int = 10,
                              nQueries: Int = 8, iters: Int = 5,
                              refine: Int = 32, nShards: Int = 2): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      // ---- global step: train once (session registry, shared with v19b/c)
      val (mat, rsub, cb) = trainedQuantizers(spark, dir, iters)

      // ---- per-shard map-only encode under one parent root ----
      val codesWide = encodeCodes(rsub, cb)
        .groupBy(col("vec_id"), col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"))
        .select(col("vec_id"), col("cluster_id"),
          expr("transform(mc, x -> x.code)").as("codes"))
      val parent = Persist.tablePath(spark, "graft_idx_ivfpq_codes_sharded")
      Persist.dropIndexTable(spark, "graft_idx_ivfpq_codes_sharded")
      (0 until nShards).foreach { s =>
        graft.sources.Sinks.writePartitioned(
          codesWide.filter(col("vec_id") % nShards === s),
          s"$parent/shard=$s", "cluster_id")
      }

      // ---- serve: ONE scan of the merged parent, probed cells only ----
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val probePairs = Ivf.probesFor(queries, mat, spark).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val probedCells = probePairs.map(_._2).distinct.sorted.toIndexedSeq
      val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

      val codes = spark.read.parquet(parent)
        .filter(col("cluster_id").isin(probedCells: _*)) // prunes inside every shard
        .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"),
          posexplode(col("codes")))
        .select(col("vec_id"), col("cluster_id"), col("pos").cast("long").as("m"),
          col("col").as("code"))

      adcFromCodes(spark, emb, mat, cb, codes, probeDf, k, queries, refine)
    } finally emb.unpersist()
  }

  def searchOracle(k: Int = 10, nQueries: Int = 8, refine: Int = 32,
                   queryPred: String = ""): String = {
    val K = Ivf.K; val M = Pq.M; val S = Pq.Sub; val P = Ivf.Probes
    val pred = if (queryPred.nonEmpty) queryPred else s"vec_id < $nQueries"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < $K),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim
       |             FROM e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |  FROM assign_s) WHERE rn = 1),
       |resid AS (SELECT e.vec_id, a.cluster_id,
       |                 [e.v[i] - c.cvec[i] for i in generate_series(1, ${M * S})] AS r
       |          FROM e JOIN assigned a USING (vec_id) JOIN c ON a.cluster_id = c.cid),
       |rsub AS (SELECT vec_id, cluster_id, m, r[($S*m+1):($S*m+$S)] AS sv FROM (
       |  SELECT vec_id, cluster_id, r, unnest([i for i in generate_series(0, ${M - 1})]) AS m
       |  FROM resid)),
       |cb AS (SELECT (vec_id - $K)::INT AS code, m, sv AS cv FROM rsub
       |       WHERE vec_id >= $K AND vec_id < ${2 * K}),
       |code_s AS (SELECT r.vec_id, r.cluster_id, r.m, cb.code, list_distance(r.sv, cb.cv) AS d
       |           FROM rsub r JOIN cb USING (m)),
       |codes AS (SELECT vec_id, cluster_id, m, code FROM (
       |  SELECT vec_id, cluster_id, m, code,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
       |  FROM code_s) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE $pred),
       |qsub AS (SELECT qid, m, qvec[($S*m+1):($S*m+$S)] AS qm FROM (
       |  SELECT qid, qvec, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM q)),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |            FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid AS cluster_id FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
       |  FROM probe_s) WHERE rn <= $P),
       |parts AS (SELECT p.qid, k.vec_id, k.cluster_id, list_inner_product(cb.cv, qs.qm) AS pp
       |          FROM codes k
       |          JOIN probes p ON k.cluster_id = p.cluster_id
       |          JOIN cb ON k.m = cb.m AND k.code = cb.code
       |          JOIN qsub qs ON p.qid = qs.qid AND k.m = qs.m),
       |adc AS (SELECT pt.qid, pt.vec_id,
       |               list_inner_product(q.qvec, c.cvec) + sum(pt.pp) AS score
       |        FROM parts pt JOIN q ON pt.qid = q.qid JOIN c ON pt.cluster_id = c.cid
       |        GROUP BY pt.qid, pt.vec_id, q.qvec, c.cvec),
       |adcr AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |  FROM adc) WHERE rn <= $refine),
       |exact AS (SELECT a.qid, a.vec_id, list_inner_product(e.v, q.qvec) AS score
       |          FROM adcr a JOIN e ON a.vec_id = e.vec_id JOIN q ON a.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM exact)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replay of [[searchTrained]], composed from the two existing
    * training replays: [[Ivf.trainCtes]] (coarse k-means → `c<iters>` +
    * full-corpus `assigned`) feeds the residual CTEs, which feed
    * [[Pq.trainCtes]] (per-subspace Lloyd's on any `src(vec_id, m, sv)` →
    * `cb<iters>`), then the same encode → ADC → exact-refine tail as
    * [[searchOracle]] against BOTH trained quantizers. Expressible because
    * every upstream float is bit-identical across engines: the trained
    * coarse matrix (v14's gate), the residual subtraction (same IEEE
    * double ops on the same inputs), and the trained codebooks (v18b's
    * gate, via the grid-quantized order-independent sums). Encode argmin
    * uses [[Pq.ddSql]] — the sequential Σ(a−b)² matching
    * `graft_nearest_centroid_grouped_l2` — with ties to the lowest cell. */
  def searchTrainedOracle(k: Int = 10, nQueries: Int = 8, iters: Int = 5,
                          refine: Int = 32): String = {
    val M = Pq.M; val S = Pq.Sub; val P = Ivf.Probes
    s"""${Ivf.trainCtes(iters)}
       |resid AS (SELECT e.vec_id, a.cluster_id,
       |                 [e.v[i] - c.cvec[i] for i in generate_series(1, ${M * S})] AS r
       |          FROM e JOIN assigned a USING (vec_id) JOIN c$iters c ON a.cluster_id = c.cid),
       |rsub AS MATERIALIZED (SELECT vec_id, cluster_id, m, r[($S*m+1):($S*m+$S)] AS sv FROM (
       |  SELECT vec_id, cluster_id, r, unnest([i for i in generate_series(0, ${M - 1})]) AS m
       |  FROM resid)),
       |${Pq.trainCtes("rsub", iters)}
       |code_s AS (SELECT r.vec_id, r.cluster_id, r.m, t.cell AS code,
       |                  ${Pq.ddSql("r.sv", "t.cv")} AS d
       |           FROM rsub r JOIN cb$iters t USING (m)),
       |codes AS (SELECT vec_id, cluster_id, m, code FROM (
       |  SELECT vec_id, cluster_id, m, code,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
       |  FROM code_s) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |qsub AS (SELECT qid, m, qvec[($S*m+1):($S*m+$S)] AS qm FROM (
       |  SELECT qid, qvec, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM q)),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |            FROM q CROSS JOIN c$iters c),
       |probes AS (SELECT qid, cid AS cluster_id FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
       |  FROM probe_s) WHERE rn <= $P),
       |parts AS (SELECT p.qid, kk.vec_id, kk.cluster_id, list_inner_product(t.cv, qs.qm) AS pp
       |          FROM codes kk
       |          JOIN probes p ON kk.cluster_id = p.cluster_id
       |          JOIN cb$iters t ON kk.m = t.m AND kk.code = t.cell
       |          JOIN qsub qs ON p.qid = qs.qid AND kk.m = qs.m),
       |adc AS (SELECT pt.qid, pt.vec_id,
       |               list_inner_product(q.qvec, c.cvec) + sum(pt.pp) AS score
       |        FROM parts pt JOIN q ON pt.qid = q.qid JOIN c$iters c ON pt.cluster_id = c.cid
       |        GROUP BY pt.qid, pt.vec_id, q.qvec, c.cvec),
       |adcr AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |  FROM adc) WHERE rn <= $refine),
       |exact AS (SELECT a.qid, a.vec_id, list_inner_product(e.v, q.qvec) AS score
       |          FROM adcr a JOIN e ON a.vec_id = e.vec_id JOIN q ON a.qid = q.qid),
       |rr AS (SELECT qid, vec_id, score,
       |              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |       FROM exact)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM rr WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }
}
