package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.api.GraftDb
import graft.sources.Tables

/** f13: the [[graft.api.GraftDb]] FACADE itself under the DuckDB oracle
  * gate — the r14 verdict's missing strongest gate: v56 hash-gates the
  * base+delta serving *pattern* at the registry level, but the facade's
  * own fold → train → standing-index build → post-build delta → serve
  * pipeline was spec-gated only. This query drives the real facade end
  * to end (reference: the service lifecycle across
  * app/api/routes/libraries.py + chunks.py + operations.py — create,
  * ingest, update, delete, train, then search a standing index) and the
  * oracle replays every step in SQL:
  *
  *   1. FOLD — 120 chunk upserts, the %10==5 slice re-upserted with a
  *      different vector (latest-wins), the %17==3 slice chunk-deleted,
  *      document 2 cascade-deleted: closed-form rules over the
  *      embeddings table, so the oracle re-derives the identical live
  *      set without reading the changelog.
  *   2. TRAIN + BUILD — `trainIndex(8, 3)` (init = the 8 lowest LIVE
  *      chunk ids — which the fold changed: id 3 is deleted and id 5
  *      re-vectored, so the oracle's k-means must run over the folded
  *      corpus, not the raw table) then `buildIndex`: the standing
  *      cluster-partitioned lists + centroids + receipt under the
  *      aside-swap.
  *   3. DELTA — new chunks 300–305, a re-upsert of id 11, a delete of
  *      id 4, all AFTER the build: no rebuild happens; serving must
  *      reconcile sealed lists MINUS the delta-key/tombstone mask PLUS
  *      the on-the-fly-assigned tail.
  *   4. SERVE — `searchAll` (k=10, nProbes=2) over a 6-query workload:
  *      probe-pruned standing lists + delta ≡ assigning the merged live
  *      corpus with the same matrix (the v56 identity), which is
  *      exactly what the oracle computes.
  *
  * The facade's mutations are driver-side row RPCs by design (the
  * reference API shape); the SERVE is the distributed plan under test.
  * At 100 TB the scenario is the production loop: a nightly build, a
  * day of writes, every query reconciling at read time. */
object FacadeServe {

  private val NBase = 120
  private val K = 8
  private val Iters = 3
  private val NQueries = 6
  private val TopK = 10
  private val Probes = 2
  // f14's standing-key-table parameters — MUST equal searchAll's
  // defaults, or the serve would fall back to in-memory keying and the
  // gate would stop exercising the persisted route
  private val LshTables = 4
  private val LshBits = 10
  private val LshSeed = 1000L

  /** Fresh store + the pre-build op sequence (shared by f13/f14): base
    * upserts, latest-wins re-upserts, chunk-batch + doc-cascade deletes.
    * Returns the opened store. Bounded driver state: the ≤ ~330 vectors
    * the op sequence touches (facade mutations are row RPCs — the
    * reference API's shape; the workload SERVE is the distributed
    * part). The root is scheme-less (GraftDb's existence probes are
    * local-path java.nio like its specs'). */
  private def freshFoldedStore(spark: SparkSession, dir: String, store: String,
                               indexType: String): (GraftDb, Map[Long, Array[Float]]) = {
    Graft.init(spark)
    val root = Persist.tablePath(spark, store).stripPrefix("file:")
    val rp = new Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    val db = new GraftDb(spark, root)
    val byId = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < NBase || col("vec_id").between(200, 320))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    db.createLibrary(1L, store, byId(0L).length, indexType)
    db.upsertChunks((0L until NBase.toLong).map(id =>
      (1L, id / 10, id, s"chunk $id", byId(id))))
    db.upsertChunks((0L until NBase.toLong).filter(_ % 10 == 5).map(id =>
      (1L, id / 10, id, s"chunk $id v2", byId(id + 200))))
    // one batch append for the whole delete set (chunks.py:135's batch
    // route) — a per-id loop would be 7 changelog write jobs
    db.deleteChunksBatch(1L, (0L until NBase.toLong).filter(_ % 17 == 3))
    db.deleteDocument(1L, 2L) // cascades chunks 20-29
    (db, byId)
  }

  /** The post-build DELTA (shared by f13/f14): appends, one re-upsert,
    * one delete — all AFTER the standing build; no rebuild happens. */
  private def runDelta(db: GraftDb, byId: Map[Long, Array[Float]]): Unit = {
    db.upsertChunks((300L to 305L).map(id =>
      (1L, 30L, id, s"chunk $id", byId(id))))
    db.upsertChunks(Seq((1L, 1L, 11L, "chunk 11 v2", byId(241L))))
    db.deleteChunk(1L, 0L, 4L)
  }

  private def serveWorkload(db: GraftDb, spark: SparkSession, dir: String): DataFrame = {
    val queries = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    db.searchAll(1L, queries, k = TopK, nProbes = Probes)
      .select(col("qid"), col("rank"), col("chunk_id"),
        round(col("score"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  def facadeServing(spark: SparkSession, dir: String): DataFrame = {
    // 1. FOLD  2. TRAIN + BUILD the standing index  3. DELTA  4. SERVE
    val (db, byId) = freshFoldedStore(spark, dir, "graft_f13_store", "ivf")
    db.trainIndex(1L, kCentroids = K, iters = Iters)
    db.buildIndex(1L)
    runDelta(db, byId)
    serveWorkload(db, spark, dir)
  }

  /** f14: the LSH facade lifecycle under the same gate — [[GraftDb]]'s
    * OTHER standing-index family driven end to end: the identical fold,
    * then `buildLshIndex` persists the standing key table, the delta
    * lands with no rebuild, and `searchAll` serves base+delta (persisted
    * keys anti-join-masked, the tail keyed on the fly — keys are
    * per-vector, so base∪delta keys ≡ keying the merged live corpus,
    * which is exactly what the oracle computes: SimHash keys over the
    * folded corpus, bucket-union candidates, exact rerank). With f13
    * this puts BOTH facade serving families inside the hash gate. */
  def facadeLshServing(spark: SparkSession, dir: String): DataFrame = {
    val (db, byId) = freshFoldedStore(spark, dir, "graft_f14_store", "lsh")
    db.buildLshIndex(1L, nTables = LshTables, nBits = LshBits, seed = LshSeed)
    runDelta(db, byId)
    serveWorkload(db, spark, dir)
  }

  /** f15: the library BUNDLE under the same gate — the facade's
    * cross-store hand-off driven end to end: the identical fold, then
    * `exportLibrary` writes the folded corpus as a self-contained
    * bundle, `importLibrary` lands it in a SECOND store root (fresh
    * `GraftDb`, one atomic single-seq batch append), and the WORKLOAD
    * SERVES FROM THE IMPORTED STORE — flat-exact, so every hit score is
    * a function of every imported vector: one flipped byte anywhere in
    * the bundle round-trip moves a cosine and breaks the hash. The
    * oracle replays the fold and scores `live0` directly (a correct
    * export→import is corpus-identity; the reference has no bundle
    * analog — its store is process memory — so the oracle IS the
    * defining semantics). */
  def bundleRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (db, _) = freshFoldedStore(spark, dir, "graft_f15_src", "flat")
    val conf = spark.sessionState.newHadoopConf()
    val bundle = Persist.tablePath(spark, "graft_f15_bundle").stripPrefix("file:")
    val bp = new Path(bundle)
    bp.getFileSystem(conf).delete(bp, true) // export refuses to overwrite
    db.exportLibrary(1L, bundle)
    val root2 = Persist.tablePath(spark, "graft_f15_dst").stripPrefix("file:")
    val rp2 = new Path(root2)
    rp2.getFileSystem(conf).delete(rp2, true)
    val db2 = new GraftDb(spark, root2)
    db2.importLibrary(bundle, 7L)
    val queries = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    db2.searchAll(7L, queries, k = TopK)
      .select(col("qid"), col("rank"), col("chunk_id"),
        round(col("score"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  /** The f15 replay: exact cosine top-k over the folded pre-build
    * corpus (`live0` — f15 runs no post-build delta; the imported store
    * holds exactly the exported fold). */
  def bundleRoundtripOracle(): String =
    s"""WITH $foldSql,
       |q AS (SELECT vec_id AS qid, v AS qvec FROM eall WHERE vec_id < $NQueries),
       |scored AS (SELECT q.qid, l.vec_id, list_cosine_similarity(l.v, q.qvec) AS score
       |           FROM live0 l CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT qid, rank, vec_id AS chunk_id, round(score, 4) AS score
       |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** The full SQL replay: fold → k-means over the folded corpus (the
    * registry's unrolled-iteration CTEs, [[Ivf.kmeansIterCtes]], fed a
    * DERIVED `e`/`en`) → probe → assign the post-delta live corpus with
    * the trained matrix → probed top-k. */
  /** The fold replayed in SQL, shared by the f13/f14 oracles: `live0` =
    * the pre-build corpus (latest-wins re-upserts, chunk + cascade
    * deletes), `live1` = after the post-build delta. */
  private def foldSql: String =
    s"""eall AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |live0 AS MATERIALIZED (
       |  SELECT b.vec_id, CASE WHEN b.vec_id % 10 = 5 THEN u.v ELSE b.v END AS v
       |  FROM eall b LEFT JOIN eall u ON u.vec_id = b.vec_id + 200
       |  WHERE b.vec_id < $NBase AND b.vec_id % 17 <> 3
       |    AND NOT (b.vec_id BETWEEN 20 AND 29)),
       |live1 AS MATERIALIZED (
       |  SELECT l.vec_id,
       |         CASE WHEN l.vec_id = 11 THEN (SELECT v FROM eall WHERE vec_id = 241)
       |              ELSE l.v END AS v
       |  FROM live0 l WHERE l.vec_id <> 4
       |  UNION ALL
       |  SELECT vec_id, v FROM eall WHERE vec_id BETWEEN 300 AND 305)""".stripMargin

  def facadeServingOracle(): String =
    s"""WITH $foldSql,
       |e AS MATERIALIZED (SELECT vec_id, v FROM live0),
       |en AS MATERIALIZED (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
       |c0 AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT $K),
       |${Ivf.kmeansIterCtes(Iters)}
       |q AS (SELECT vec_id AS qid, v AS qvec FROM eall WHERE vec_id < $NQueries),
       |ps AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |       FROM q CROSS JOIN c$Iters c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
       |  FROM ps) WHERE rn <= $Probes),
       |asg_s AS (SELECT l.vec_id, c.cid, list_cosine_similarity(l.v, c.cvec) AS sim
       |          FROM live1 l CROSS JOIN c$Iters c),
       |asg AS MATERIALIZED (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |  FROM asg_s) WHERE rn = 1),
       |sc AS (SELECT p.qid, a.vec_id, list_cosine_similarity(l.v, q.qvec) AS score
       |       FROM asg a JOIN probes p ON a.cluster_id = p.cid
       |            JOIN live1 l ON a.vec_id = l.vec_id JOIN q ON p.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM sc)
       |SELECT qid, rank, vec_id AS chunk_id, round(score, 4) AS score
       |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** The f14 replay: SimHash keys over the POST-DELTA live corpus (keys
    * are per-vector, so base∪delta keying ≡ keying live1 wholesale),
    * bucket-union candidates, exact cosine rerank. */
  def facadeLshServingOracle(): String =
    s"""WITH $foldSql,
       |q AS (SELECT vec_id AS qid, v AS qv FROM eall WHERE vec_id < $NQueries),
       |dk AS (${Lsh.keysSql("live1", "vec_id", LshTables, LshBits, 64, LshSeed)}),
       |qk AS (${Lsh.keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id",
                LshTables, LshBits, 64, LshSeed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(l.v, q.qv) AS score
       |           FROM cand JOIN live1 l ON cand.vec_id = l.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM scored)
       |SELECT qid, rank, vec_id AS chunk_id, round(score, 4) AS score
       |FROM r WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
}
