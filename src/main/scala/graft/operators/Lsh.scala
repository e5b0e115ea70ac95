package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.LcgPlanes
import graft.sources.Tables

/** SimHash LSH — Spark re-expression of the reference's multi-table
  * random-hyperplane index (reference: app/core/indexes/lsh_simhash.py).
  *
  * The hash tables become rows `(vec_id, table_id, key)`; a bucket is a
  * group, and both search and similarity-join are **equi-joins on
  * (table_id, key)** — broadcast at test scale, sort-merge on a cluster,
  * never an all-pairs product. Keys come from the codegen'd
  * [[graft.functions.SimhashKeys]] expression; the LCG plane construction
  * is reproduced verbatim in the generated oracle SQL (exact integer math,
  * see [[LcgPlanes]]).
  */
object Lsh {

  /** (vec_id, table_id, key) rows for every vector. `keep` carries extra
    * payload columns through the explode (map-only) — the facade's key
    * table wants doc_id beside each key, and carrying it here beats a
    * post-hoc self-join on vec_id (one broadcast materialization per
    * standing-index build, r18). */
  def keyRows(emb: DataFrame, nTables: Int, nBits: Int, seed: Long,
              idCol: String = "vec_id", keep: Seq[String] = Nil): DataFrame = {
    val keyed = emb.withColumn("keys",
      Graft.simhashKeys(col("embedding"), nTables, nBits, seed))
    keyed.select(col(idCol) +: posexplode(col("keys")).as(Seq("table_id", "key")) +:
        keep.map(col): _*)
      .select(col(idCol) +: col("table_id").cast("long").as("table_id") +:
        col("key") +: keep.map(col): _*)
  }

  /** v9: the index build — SimHash keys per (vector, table). */
  def buildKeys(spark: SparkSession, dir: String,
                nTables: Int = 4, nBits: Int = 16, seed: Long = 9000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    keyRows(emb, nTables, nBits, seed).orderBy("vec_id", "table_id")
  }

  /** Bucket-union + exact-cosine rerank of `queries(qid, qvec)` against any
    * `(vec_id, table_id, key)` index frame — in-flight (v10), persisted
    * (p1), or incrementally appended (p4, streaming ingest): the search is
    * the same plan regardless of where the index came from. */
  def searchIndex(index: DataFrame, emb: DataFrame, queries: DataFrame,
                  nTables: Int, nBits: Int, seed: Long, k: Int): DataFrame = {
    val queryKeys = keyRows(
      queries.select(col("qid"), col("qvec").as("embedding")),
      nTables, nBits, seed, idCol = "qid")

    val candidates = index.join(broadcast(queryKeys), Seq("table_id", "key"))
      .select(col("qid"), col("vec_id")).distinct()

    val scored = candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  /** v10: bucket-union candidates for each query, exact cosine re-rank
    * (reference: app/core/indexes/lsh_simhash.py:105-131). */
  def search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
             nTables: Int = 4, nBits: Int = 10, seed: Long = 1000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    searchIndex(keyRows(emb, nTables, nBits, seed), emb, queries, nTables, nBits, seed, k)
  }

  /** v16c: metadata-filtered LSH search — the reference's
    * `metadata_filters` on the LSH path (app/core/indexes/
    * lsh_simhash.py:104). The FULL index is probed (a persisted index is
    * never rebuilt per filter); the label predicate lands on the SCORING
    * join's corpus scan — a pushed parquet filter — so non-matching
    * candidates are dropped before any distance math. Completes the
    * filter×family matrix: v16 flat, v16b IVF, v16c LSH. */
  def filteredSearch(spark: SparkSession, dir: String, labels: Seq[Int] = Seq(2, 5),
                     k: Int = 10, nQueries: Int = 8,
                     nTables: Int = 4, nBits: Int = 10, seed: Long = 1000): DataFrame = {
    Graft.init(spark)
    val all = Tables.embeddings(spark, dir)
    val emb = all.select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val filtered = all.filter(col("label").isin(labels: _*))
      .select(col("vec_id"), col("embedding"))
    searchIndex(keyRows(emb, nTables, nBits, seed), filtered, queries, nTables, nBits, seed, k)
  }

  def filteredSearchOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10, nQueries: Int = 8,
                           nTables: Int = 4, nBits: Int = 10, seed: Long = 1000,
                           dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |dk AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(e.v, q.qv) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid
       |           JOIN embeddings raw ON cand.vec_id = raw.vec_id
       |           WHERE raw.label IN (${labels.mkString(", ")})),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v37: MULTI-PROBE LSH (Lv et al. 2007) — probe the query's exact
    * bucket PLUS every 1-bit-flip neighbor bucket in each table, so one
    * table yields `nBits+1` probes. The point of the technique: recall
    * that would need many hash tables comes from extra probes into the
    * SAME index instead — here 2 tables × 17 probes replaces v10's
    * 4-table build at half the index storage (at 100 TB the index IS the
    * cost), and the probe expansion is query-side only: a
    * `(qid, table_id, key)`-row explode of the broadcast side, the
    * candidate join identical to v10's equi-join. Flipping one bit of a
    * SimHash key = crossing one random hyperplane — the 1-flip
    * neighborhood is exactly the "likely to still match" perturbation
    * set for near-duplicate vectors. */
  def multiProbeSearch(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                       nTables: Int = 2, nBits: Int = 16, seed: Long = 1000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val index = keyRows(emb, nTables, nBits, seed)
    val probes = keyRows(queries.select(col("qid"), col("qvec").as("embedding")),
        nTables, nBits, seed, idCol = "qid")
      .select(col("qid"), col("table_id"), explode(expr(
        s"concat(array(key), transform(sequence(0, ${nBits - 1}), b -> key ^ shiftleft(1L, b)))"))
        .as("key"))

    val candidates = index.join(broadcast(probes), Seq("table_id", "key"))
      .select(col("qid"), col("vec_id")).distinct()
    val scored = candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k)
  }

  def multiProbeSearchOracle(k: Int = 10, nQueries: Int = 8, nTables: Int = 2,
                             nBits: Int = 16, seed: Long = 1000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |dk AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |qp AS (SELECT id, table_id,
       |              unnest(list_prepend(key, [xor(key, (1::BIGINT << b))
       |                                        for b in generate_series(0, ${nBits - 1})])) AS key
       |       FROM qk),
       |cand AS (SELECT DISTINCT qp.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qp ON dk.table_id = qp.table_id AND dk.key = qp.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(e.v, q.qv) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v11: all-pairs cosine ≥ τ via shared LSH buckets — the approximate
    * similarity-join / embedding near-dup primitive. */
  def simJoin(spark: SparkSession, dir: String, tau: Double = 0.3,
              nTables: Int = 4, nBits: Int = 8, seed: Long = 2000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val keys = keyRows(emb, nTables, nBits, seed)

    val pairs = keys.as("a")
      .join(keys.as("b"),
        col("a.table_id") === col("b.table_id") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")).distinct()

    pairs
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .withColumn("score", Graft.cosine(col("va"), col("vb")))
      .filter(col("score") >= tau)
      .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score"))
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB expression computing the SimHash key of table `t` over a
    * DOUBLE[] column `v` — same LCG planes, same summation order. */
  private def keySqlExpr(v: String, t: Int, nBits: Int, dim: Int, seed: Long): String = {
    val bits = (0 until nBits).map { j =>
      val off = seed + (t.toLong * nBits + j) * dim
      val w = LcgPlanes.sqlWeight(off)
      s"(CASE WHEN list_sum([$w * $v[i+1] for i in generate_series(0, ${dim - 1})]) >= 0 THEN ${1L << j} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")::BIGINT")
  }

  /** CTE body: keys([extra...,] id, table_id, key) for a source select;
    * `extra` columns (e.g. a library key) pass through for scoped joins. */
  private[operators] def keysSql(src: String, idExpr: String, nTables: Int, nBits: Int,
                      dim: Int, seed: Long, extra: Seq[String] = Nil): String = {
    val ex = extra.map(e => s"$e, ").mkString
    (0 until nTables).map { t =>
      s"SELECT $ex$idExpr AS id, ${t}::BIGINT AS table_id, ${keySqlExpr("v", t, nBits, dim, seed)} AS key FROM $src"
    }.mkString("\nUNION ALL\n")
  }

  def buildKeysOracle(nTables: Int = 4, nBits: Int = 16, seed: Long = 9000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |k AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)})
       |SELECT id AS vec_id, table_id, key FROM k ORDER BY vec_id, table_id""".stripMargin

  def searchOracle(k: Int = 10, nQueries: Int = 8, nTables: Int = 4, nBits: Int = 10,
                   seed: Long = 1000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |dk AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(e.v, q.qv) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v29: LSH bucket search for the external query WORKLOAD table
    * ([[Knn.queryTable]]) — completes the workload convention across all
    * three index families (flat v26, IVF v27): the workload's keys are
    * computed on its own (tiny, broadcast) scan and meet the corpus key
    * table in the usual bucket equi-join; nothing else changes. */
  def workloadSearch(spark: SparkSession, dir: String, k: Int = 10,
                     nTables: Int = 4, nBits: Int = 10, seed: Long = 1000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = Knn.queryTable(spark, dir)
    searchIndex(keyRows(emb, nTables, nBits, seed), emb, queries, nTables, nBits, seed, k)
  }

  def workloadSearchOracle(k: Int = 10, nTables: Int = 4, nBits: Int = 10,
                           seed: Long = 1000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT qid, qvec AS qv FROM (${Knn.queryTableSql()}) t),
       |dk AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(e.v, q.qv) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  def simJoinOracle(tau: Double = 0.3, nTables: Int = 4, nBits: Int = 8,
                    seed: Long = 2000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |k AS (${keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |          FROM k a JOIN k b ON a.table_id = b.table_id AND a.key = b.key AND a.id < b.id),
       |scored AS (SELECT p.id_a, p.id_b, list_cosine_similarity(ea.v, eb.v) AS score
       |           FROM pairs p JOIN e ea ON p.id_a = ea.vec_id JOIN e eb ON p.id_b = eb.vec_id)
       |SELECT id_a, id_b, round(score, 4) AS score FROM scored WHERE score >= $tau ORDER BY id_a, id_b""".stripMargin
}
