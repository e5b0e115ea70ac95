package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Tables

/** v18: Product Quantization (PQ) — the classic vector-compression sketch
  * (Jégou et al., "Product quantization for nearest neighbor search",
  * TPAMI 2011): split the 64-dim vector into M=8 subspaces of 8 dims,
  * quantize each subvector to its nearest of K=16 per-subspace centroids,
  * store M 4-bit codes (= 4 bytes/vector vs 256 — a 64× compression), and
  * score queries against the RECONSTRUCTION (asymmetric distance: the
  * query stays exact, only the corpus is coded).
  *
  * Codebooks are deterministic here (subvectors of the first K corpus
  * vectors — the same fixed-seed convention as v6's IVF centroids; a
  * trained variant would run v8's k-means per subspace).
  *
  * Everything is relational, so the plan scales like the rest of the
  * engine: centroids are a 128-row broadcast; encode = explode(M) ×
  * broadcast-join × struct-min argmin (partial agg, shuffle carries one
  * row per (vector, subspace)); scoring = broadcast the Q×M query
  * subvectors, partial-sum the M per-subspace dot products per
  * (query, vector). No all-pairs product, no driver loop.
  */
object Pq {
  val M = 8  // subspaces
  val Sub = 8 // dims per subspace
  val K = 16 // centroids per subspace

  /** (c, m, cv): centroid c's subvector in subspace m — 128 rows. */
  private def centroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("c"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col("c"), explode(sequence(lit(0), lit(M - 1))).as("m"), col("v"))
      .select(col("c"), col("m"), slice(col("v"), col("m") * Sub + 1, lit(Sub)).as("cv"))

  /** (id, m, sv): every vector split into its M subvectors. */
  private def subvectors(emb: DataFrame, idCol: String, out: String): DataFrame =
    emb.select(col(idCol), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col(idCol), explode(sequence(lit(0), lit(M - 1))).as("m"), col("v"))
      .select(col(idCol), col("m"), slice(col("v"), col("m") * Sub + 1, lit(Sub)).as(out))

  /** PQ codes: (vec_id, m, code) — argmin-L2 centroid per subspace,
    * ties to the lowest centroid id via lexicographic struct-min. */
  def encode(spark: SparkSession, emb: DataFrame): DataFrame = {
    Graft.init(spark)
    val cent = centroids(emb)
    subvectors(emb, "vec_id", "sv")
      .join(broadcast(cent), Seq("m"))
      .select(col("vec_id"), col("m"),
        struct(Graft.l2(col("sv"), col("cv")).as("d"), col("c")).as("dc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("dc")).as("best"))
      .select(col("vec_id"), col("m"), col("best.c").as("code"))
  }

  /** v18: encode the corpus, search by asymmetric dot — each query's exact
    * subvectors scored against the coded corpus's reconstruction. */
  def search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cent = centroids(emb)
    val codes = encode(spark, emb)

    val qsub = subvectors(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding")), "qid", "qm")

    val partials = codes
      .join(broadcast(cent), codes("m") === cent("m") && codes("code") === cent("c"))
      .select(col("vec_id"), codes("m").as("m"), col("cv"))
      .join(broadcast(qsub), Seq("m"))
      .select(col("qid"), col("vec_id"), Graft.dot(col("cv"), col("qm")).as("p"))

    val scored = partials.groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("p")).as("score"))
    Knn.topkPerQuery(scored, "dot", k)
  }

  /** v30: PQ ADC search for the EXTERNAL query workload table
    * ([[Knn.queryTable]]) — extends the workload convention past the
    * index families (flat v26, IVF v27, LSH v29) onto the quantizer
    * path: the workload's exact subvectors broadcast against the coded
    * corpus reconstruction; the corpus side is identical to v18 (codes ×
    * broadcast codebook), so serving an external query log instead of a
    * corpus prefix costs nothing but the workload scan. */
  def workloadSearch(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cent = centroids(emb)
    val codes = encode(spark, emb)
    val qsub = subvectors(
      Knn.queryTable(spark, dir).select(col("qid"), col("qvec").as("embedding")), "qid", "qm")
    val partials = codes
      .join(broadcast(cent), codes("m") === cent("m") && codes("code") === cent("c"))
      .select(col("vec_id"), codes("m").as("m"), col("cv"))
      .join(broadcast(qsub), Seq("m"))
      .select(col("qid"), col("vec_id"), Graft.dot(col("cv"), col("qm")).as("p"))
    val scored = partials.groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("p")).as("score"))
    Knn.topkPerQuery(scored, "dot", k)
  }

  def workloadSearchOracle(k: Int = 10): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |em AS (SELECT vec_id, v, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM e),
       |sub AS (SELECT vec_id, m, v[($Sub*m+1):($Sub*m+$Sub)] AS sv FROM em),
       |cent AS (SELECT vec_id AS c, m, sv AS cv FROM sub WHERE vec_id < $K),
       |dist AS (SELECT s.vec_id, s.m, c.c, list_distance(s.sv, c.cv) AS d
       |         FROM sub s JOIN cent c USING (m)),
       |code AS (SELECT vec_id, m, c AS code FROM (
       |           SELECT vec_id, m, c,
       |                  row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
       |           FROM dist) WHERE rn = 1),
       |recon AS (SELECT k.vec_id, k.m, c.cv FROM code k
       |          JOIN cent c ON k.m = c.m AND k.code = c.c),
       |q AS (${Knn.queryTableSql()}),
       |qm0 AS (SELECT qid, qvec AS v, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM q),
       |qsub AS (SELECT qid, m, v[($Sub*m+1):($Sub*m+$Sub)] AS qm FROM qm0),
       |part AS (SELECT q.qid, r.vec_id, list_inner_product(r.cv, q.qm) AS p
       |         FROM recon r JOIN qsub q USING (m)),
       |sc AS (SELECT qid, vec_id, sum(p) AS score FROM part GROUP BY 1, 2),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM sc)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** Per-subspace Lloyd's k-means over the subvector table — the
    * reference's train flow (app/core/vector_db.py:294 train_index) applied
    * per PQ subspace, as Jégou et al. §III prescribe. ALL `M` codebooks
    * train simultaneously: one map-only grouped-argmin scan per iteration
    * ([[graft.functions.NearestCentroidGrouped]] keyed by subspace index,
    * L2 mode) + one partial `graft_vecsum` aggregate whose exchange carries
    * M×K pre-summed subvectors per partition — NOT one training job per
    * subspace (M× the scans) and NOT a per-row shuffle. Driver state is the
    * M×K×(d/M) codebook tensor = exactly d×K doubles, independent of corpus
    * size. (At 100 TB the scan would be over a fixed-size training sample —
    * the FAISS convention; the loop shape is unchanged.)
    *
    * Init = subvectors of the first K corpus vectors (v18's fixed
    * codebooks); empty cells RESEED from the subspace's worst-served
    * subvectors — the per-(m, cell) mirror of [[Ivf.trainCentroids]]'s
    * deterministic farthest-point refill (most-negative grouped-L2 sim,
    * ties to lowest vec_id, one distinct row per dead cell). The reseed
    * pass runs ONLY in an iteration that emptied a cell; distances are
    * measured against the LIVE cells only (n > 0 this iteration) —
    * the same rule as Ivf's reseed, so a stale dead-cell value sitting
    * near real data can never mask the points that should reseed it.
    * The per-m pick is a window row_number over the subvector table —
    * at 100 TB training runs on a fixed-size sample (FAISS convention),
    * so the sort is sample-sized, never corpus-sized.
    *
    * Accumulation inputs are grid-quantized ([[Graft.vecQuantize]]) so the
    * per-(m, cell) sums are exact and order-independent: training is
    * bit-for-bit reproducible and replayable by [[searchTrainedOracle]]. */
  private[graft] def trainCodebooks(sub: DataFrame, iters: Int = 5): Map[Long, Array[Array[Double]]] = {
    var mats: Map[Long, Array[Array[Double]]] =
      sub.filter(col("vec_id") < K).collect()
        .map(r => (r.getInt(1).toLong, r.getLong(0), r.getSeq[Double](2).toArray))
        .groupBy(_._1)
        .map { case (m, rows) => m -> rows.sortBy(_._2).map(_._3) }

    for (_ <- 1 to iters) {
      val matLit = typedLit(mats.map { case (m, cs) => m -> cs.map(_.toSeq).toSeq })
      val sums = sub
        .withColumn("nc", Graft.nearestCentroidGroupedL2(col("sv"), col("m").cast("long"), matLit))
        .groupBy(col("m"), col("nc.idx").as("idx"))
        .agg(Graft.vecsum(Graft.vecQuantize(col("sv"))).as("vsum"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0).toLong, r.getInt(1)), (r.getSeq[Double](2).toArray, r.getLong(3))))
        .toMap
      val updated = mats.map { case (m, cs) =>
        m -> cs.zipWithIndex.map { case (old, i) =>
          sums.get((m, i)) match {
            case Some((vsum, n)) if n > 0 => vsum.map(_ / n)
            case _ => old
          }
        }
      }
      val empties: Map[Long, Seq[Int]] = mats.flatMap { case (m, cs) =>
        val dead = cs.indices.filterNot(i => sums.get((m, i)).exists(_._2 > 0))
        if (dead.isEmpty) None else Some(m -> (dead: Seq[Int]))
      }
      val reseeded: Map[(Long, Int), Array[Double]] =
        if (empties.isEmpty) Map.empty
        else {
          // live cells only (n > 0), mirroring Ivf.trainCentroids' rule
          val liveLit = typedLit(updated.map { case (m, cs) =>
            m -> cs.zipWithIndex.collect {
              case (c, i) if sums.get((m, i)).exists(_._2 > 0) => c.toSeq
            }.toSeq
          })
          val maxE = empties.values.map(_.size).max
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("m")).orderBy(col("s").asc, col("vec_id").asc)
          val picked = sub
            .withColumn("nc", Graft.nearestCentroidGroupedL2(col("sv"), col("m").cast("long"), liveLit))
            .select(col("m").cast("long").as("m"), col("nc.sim").as("s"), col("vec_id"), col("sv"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= maxE)
            .collect()
            .map(r => ((r.getLong(0), r.getInt(4)), r.getSeq[Double](3).toArray))
            .toMap
          empties.toSeq.flatMap { case (m, dead) =>
            dead.sorted.zipWithIndex.flatMap { case (cell, j) =>
              picked.get((m, j + 1)).map(sv => (m, cell) -> sv)
            }
          }.toMap
        }
      mats = updated.map { case (m, cs) =>
        m -> cs.zipWithIndex.map { case (c, i) => reseeded.getOrElse((m, i), c) }
      }
    }
    mats
  }

  /** v18b: PQ search with TRAINED codebooks + EXACT REFINE — the full
    * production PQ shape (ADC scan then re-rank, FAISS IndexRefineFlat):
    * k-means codebooks (MSE −28% vs the first-K convention on this data)
    * score the whole corpus asymmetrically, the top `refine` candidates
    * per query are re-ranked by exact dot, top-k of that ships. The refine
    * join touches `Q × refine` rows — the compressed scan does the corpus
    * pass, the exact pass costs what a broadcast point-lookup costs. Same
    * candidates→exact-rerank pattern as the IVF (v7) and LSH (v10) paths.
    * Encoding needs NO join at all now: the grouped-argmin expression
    * assigns codes in the scan. Rows-only gate (iterative training is not
    * SQL-expressible); quality is spec-gated (RecallSpec: ≥ 0.5 floor vs
    * untrained v18's 0.2 — measured ≈0.75 with refine=64).  */
  def searchTrained(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                    iters: Int = 5, refine: Int = 64): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // subvector table materialized ONCE (localCheckpoint): the init
    // collect, every training iteration, and the encode pass all reuse it
    // — un-checkpointed, each of those ~7 jobs re-scanned and re-exploded
    // the corpus from parquet
    val sub = subvectors(emb, "vec_id", "sv").localCheckpoint()
    val mats = trainCodebooks(sub)

    val matLit = typedLit(mats.map { case (m, cs) => m -> cs.map(_.toSeq).toSeq })
    // map-only encode: (vec_id, m, code), code = position in subspace codebook
    val codes = sub
      .withColumn("nc", Graft.nearestCentroidGroupedL2(col("sv"), col("m").cast("long"), matLit))
      .select(col("vec_id"), col("m").cast("long").as("m"), col("nc.idx").as("code"))

    // trained codebook as a 128-row broadcast dim for reconstruction
    val cent = Ivf.codebookDf(spark, mats)

    val qsub = subvectors(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding")), "qid", "qm")
      .select(col("qid"), col("m").cast("long").as("m"), col("qm"))

    val partials = codes
      .join(broadcast(cent), Seq("m", "code"))
      .join(broadcast(qsub), Seq("m"))
      .select(col("qid"), col("vec_id"), Graft.dot(col("cv"), col("qm")).as("p"))

    val scored = partials.groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("p")).as("score"))

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Knn.exactRefine(scored, emb, queries, "dot", refine, k)
  }

  /** DuckDB replay of [[searchTrained]]: the per-subspace Lloyd's
    * iterations unrolled into one CTE chain per iteration (argmin-L2
    * assignment with ties to the lowest cell, exact sums of the
    * grid-quantized subvectors, mean update, live-only worst-served
    * reseed), then encode + ADC + exact refine against the trained
    * codebooks. Expressible for the same reason as
    * [[Ivf.trainedSearchOracle]]: [[Graft.vecQuantize]] makes the
    * accumulation order-independent, so both engines derive bit-identical
    * codebooks. Distances mirror the L2 kernel exactly (sequential
    * sum of squared componentwise differences — `list_inner_product(dd,
    * dd)`, not `list_distance`, whose sqrt could merge distinct squared
    * distances into an SQL tie the Scala side never saw). */
  def searchTrainedOracle(k: Int = 10, nQueries: Int = 8,
                          iters: Int = 5, refine: Int = 64): String = {
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |em AS (SELECT vec_id, v, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM e),
       |sub AS MATERIALIZED (SELECT vec_id, m, v[($Sub*m+1):($Sub*m+$Sub)] AS sv FROM em),
       |${trainCtes("sub", iters)}
       |fd AS (SELECT s.vec_id, s.m, c.cell, ${ddSql("s.sv", "c.cv")} AS d2
       |       FROM sub s JOIN cb$iters c USING (m)),
       |codes AS (SELECT vec_id, m, cell FROM (
       |  SELECT vec_id, m, cell, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cell) AS rn
       |  FROM fd) WHERE rn = 1),
       |qsub AS (SELECT vec_id AS qid, m, sv AS qm FROM sub WHERE vec_id < $nQueries),
       |part AS (SELECT q.qid, k.vec_id, list_inner_product(c.cv, q.qm) AS p
       |         FROM codes k JOIN cb$iters c ON k.m = c.m AND k.cell = c.cell
       |         JOIN qsub q ON k.m = q.m),
       |sc AS (SELECT qid, vec_id, sum(p) AS score FROM part GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |  FROM sc) WHERE rn <= $refine),
       |qv AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |ex AS (SELECT c.qid, c.vec_id, list_inner_product(e.v, q.qvec) AS score
       |       FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN qv q ON c.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM ex)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** Sequential Σ(a−b)² — `list_inner_product` of the explicit difference
    * list, NOT `list_distance`, whose sqrt could merge distinct squared
    * distances into an SQL tie the Scala argmin never saw. */
  private[operators] def ddSql(a: String, b: String): String =
    s"list_inner_product([$a[i] - $b[i] for i in generate_series(1, $Sub)]," +
      s" [$a[i] - $b[i] for i in generate_series(1, $Sub)])"

  /** The per-subspace training replay over any `src(vec_id, m, sv)` CTE:
    * `iters` unrolled iterations ending in the trained codebook
    * `cb<iters>(m, cell, cv)` (trailing comma — callers append their tail).
    * Shared by [[searchTrainedOracle]] and [[IvfPq.searchTrainedOracle]]
    * (which feeds RESIDUAL subvectors in). */
  private[operators] def trainCtes(src: String, iters: Int): String = {
    val Q = Graft.QuantScale
    def dd(a: String, b: String) = ddSql(a, b)
    val iterCtes = (1 to iters).map { t =>
      val p = s"cb${t - 1}"
      s"""pd$t AS (SELECT s.vec_id, s.m, c.cell, ${dd("s.sv", "c.cv")} AS d2
         |         FROM $src s JOIN $p c USING (m)),
         |pa$t AS MATERIALIZED (SELECT vec_id, m, cell FROM (
         |  SELECT vec_id, m, cell, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cell) AS rn
         |  FROM pd$t) WHERE rn = 1),
         |px$t AS (SELECT a.m, a.cell,
         |                unnest([floor(y * $Q + 0.5) / $Q for y in s.sv]) AS xq,
         |                unnest([i for i in generate_series(1, $Sub)]) AS i
         |         FROM pa$t a JOIN $src s USING (vec_id, m)),
         |pn$t AS (SELECT m, cell, count(*) AS n FROM pa$t GROUP BY m, cell),
         |pg$t AS (SELECT m, cell, list(sq ORDER BY i) AS vsum FROM (
         |           SELECT m, cell, i, sum(xq) AS sq FROM px$t GROUP BY m, cell, i) GROUP BY m, cell),
         |pu$t AS MATERIALIZED (SELECT g.m, g.cell, [y / n.n for y in g.vsum] AS cv
         |         FROM pg$t g JOIN pn$t n USING (m, cell)),
         |pm$t AS (SELECT c.m, c.cell, row_number() OVER (PARTITION BY c.m ORDER BY c.cell) AS rn
         |         FROM $p c WHERE NOT EXISTS (
         |           SELECT 1 FROM pu$t u2 WHERE u2.m = c.m AND u2.cell = c.cell)),
         |pf$t AS (SELECT s.vec_id, s.m, s.sv, min(${dd("s.sv", "u.cv")}) AS d2m
         |         FROM $src s JOIN pu$t u USING (m) GROUP BY s.vec_id, s.m, s.sv),
         |pw$t AS (SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY d2m DESC, vec_id ASC) AS rn
         |         FROM pf$t),
         |cb$t AS MATERIALIZED (SELECT p.m, p.cell, COALESCE(u.cv, w.sv, p.cv) AS cv
         |        FROM $p p
         |        LEFT JOIN pu$t u USING (m, cell)
         |        LEFT JOIN pm$t me USING (m, cell)
         |        LEFT JOIN pw$t w ON me.m = w.m AND me.rn = w.rn),""".stripMargin
    }.mkString("\n")
    s"""cb0 AS (SELECT m, vec_id::INT AS cell, sv AS cv FROM $src WHERE vec_id < $K),
       |$iterCtes""".stripMargin
  }

  def searchOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |em AS (SELECT vec_id, v, unnest([i for i in generate_series(0, ${M - 1})]) AS m FROM e),
       |sub AS (SELECT vec_id, m, v[($Sub*m+1):($Sub*m+$Sub)] AS sv FROM em),
       |cent AS (SELECT vec_id AS c, m, sv AS cv FROM sub WHERE vec_id < $K),
       |dist AS (SELECT s.vec_id, s.m, c.c, list_distance(s.sv, c.cv) AS d
       |         FROM sub s JOIN cent c USING (m)),
       |code AS (SELECT vec_id, m, c AS code FROM (
       |           SELECT vec_id, m, c,
       |                  row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rn
       |           FROM dist) WHERE rn = 1),
       |recon AS (SELECT k.vec_id, k.m, c.cv FROM code k
       |          JOIN cent c ON k.m = c.m AND k.code = c.c),
       |qsub AS (SELECT vec_id AS qid, m, sv AS qm FROM sub WHERE vec_id < $nQueries),
       |part AS (SELECT q.qid, r.vec_id, list_inner_product(r.cv, q.qm) AS p
       |         FROM recon r JOIN qsub q USING (m)),
       |sc AS (SELECT qid, vec_id, sum(p) AS score FROM part GROUP BY 1, 2),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM sc)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
}
