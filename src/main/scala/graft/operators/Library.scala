package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.Graft
import graft.sources.Tables

/** Multi-library semantics + chunk-payload search — the reference's data
  * model scopes every index and search to a Library (reference:
  * app/core/models.py:26-30 `Library{dims,index_type}` ⊃ Document ⊃ Chunk),
  * and `search(..., include_chunk=True)` returns the chunk object with each
  * hit (reference: app/core/vector_db.py:249,266-270).
  *
  * Library ≡ the `label` column of `embeddings` (10 groups). The Spark-first
  * shape: "per-library" is a GROUPING COLUMN threaded through build and
  * search — scoping becomes an equi-join on `library`, which at 100 TB is a
  * co-partitioned (bucketed) join, never a cross-library scan. One plan
  * serves all libraries at once; the reference loops over them one at a time.
  */
object Library {

  /** v15: flat kNN search returning the full document payload with each hit
    * (`include_chunk=True`) — the payload join-back runs with the HIT SET
    * as the broadcast build side (≤ Q·k rows by construction) streaming
    * over the corpus scan: at 100 TB `documents` is SF-proportional and
    * must never be a broadcast, while the hit set is bounded by the query
    * workload. Inner ≡ the reference's left semantics here because every
    * hit id is a corpus id by construction (hits come from scoring the
    * corpus itself); a store whose ids could dangle would union the
    * anti-joined hits back with NULL payload. */
  def searchWithPayload(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val hits = Knn.flatSearch(spark, dir, "cosine", k, nQueries)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        substring(col("text"), 1, 48).as("snippet"))
    docs.join(broadcast(hits), hits("vec_id") === docs("doc_id"))
      .select(col("qid"), col("rank"), col("vec_id"), col("score"),
        col("source"), col("lang"), col("n_chars"), col("snippet"))
      .orderBy("qid", "rank")
  }

  def searchWithPayloadOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT r.qid, r.rank, r.vec_id, round(r.score, 4) AS score,
       |       d.source, d.lang, d.n_chars, substr(d.text, 1, 48) AS snippet
       |FROM r LEFT JOIN documents d ON r.vec_id = d.doc_id
       |WHERE r.rank <= $k ORDER BY r.qid, r.rank""".stripMargin

  /** l1: per-library flat kNN — the first `qPerLib` vectors of every library
    * query THEIR OWN library only. Scoping = an equi-join on `library`
    * (bucketed/sort-merge at scale); rank is per (library, query). This is
    * the reference's `search(library_id, ...)` for all libraries in one plan. */
  /** First `n` vec_ids of each library as (library, vec_id, embedding) —
    * a partial-aggregate TopK (map-side combine ships ≤ n ids per task
    * per library) plus a broadcast join-back for the vectors. NOT a
    * `Window.partitionBy(library)` rank: with ~10 libraries that window
    * sorts each library's entire scan in ONE task — the q9 lesson applied
    * to the library axis. Deterministic: lowest vec_ids, no ties. */
  private def firstPerLibrary(emb: DataFrame, n: Int): DataFrame = {
    val ids = emb.groupBy(col("library"))
      .agg(Graft.topk(col("vec_id").cast("double"), col("vec_id"), lit(n), lit(true)).as("top"))
      .select(col("library"), explode(col("top.id")).as("vec_id"))
    emb.join(broadcast(ids), Seq("library", "vec_id"))
      .select(col("library"), col("vec_id"), col("embedding"))
  }

  def libraryKnn(spark: SparkSession, dir: String, k: Int = 5, qPerLib: Int = 2): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("library"))
    // localCheckpoint (l3's convention): materializes the ≤ libs·qPerLib
    // query rows so the broadcast promise is backed by an actually-
    // materialized bounded frame, not by the corpus-joined subplan that
    // produced it — and the TopK probe never recomputes
    val queries = firstPerLibrary(emb, qPerLib)
      .select(col("library"), col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()

    val scored = emb.join(broadcast(queries), Seq("library"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))

    scored
      .groupBy(col("library"), col("qid"))
      .agg(Graft.topk(col("score"), col("vec_id"), lit(k), lit(false)).as("top"))
      .select(col("library"), col("qid"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("library"), col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("vec_id"), round(col("r.score"), 4).as("score"))
      .orderBy("library", "qid", "rank")
  }

  def libraryKnnOracle(k: Int = 5, qPerLib: Int = 2): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label::BIGINT AS library FROM embeddings),
       |q AS (SELECT library, vec_id AS qid, v AS qvec FROM (
       |        SELECT library, vec_id, v,
       |               row_number() OVER (PARTITION BY library ORDER BY vec_id) AS rn FROM e)
       |      WHERE rn <= $qPerLib),
       |s AS (SELECT q.library, q.qid, e.vec_id, list_cosine_similarity(e.v, q.qvec) AS score
       |      FROM e JOIN q ON e.library = q.library),
       |r AS (SELECT library, qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT library, qid, rank, vec_id, round(score, 4) AS score
       |FROM r WHERE rank <= $k ORDER BY library, qid, rank""".stripMargin

  /** Driver-side per-library centroid state: library → (cids sorted
    * ascending, k×d matrix in the same order), from the first `kPerLib`
    * vectors of each library. #libraries × k × d doubles — the grouped
    * analog of [[Ivf.collectCentroids]]'s canonical k-means driver state. */
  private[operators] def collectLibraryCentroids(emb: DataFrame, kPerLib: Int)
      : Map[Long, Array[(Long, Array[Double])]] = {
    firstPerLibrary(emb, kPerLib)
      .collect()
      .map { r =>
        val vec = r.get(2) match {
          case s: scala.collection.Seq[_] => s.map {
            case f: Float => f.toDouble
            case d: Double => d
          }.toArray
        }
        (r.getLong(0), r.getLong(1), vec)
      }
      .groupBy(_._1)
      .map { case (lib, rows) => lib -> rows.map(t => (t._2, t._3)).sortBy(_._1) }
  }

  /** l2: per-library IVF index BUILD — each library gets its own centroid
    * set (first `kPerLib` vectors of that library) and every vector is
    * assigned within its library only. Assignment is ONE map-only codegen'd
    * pass ([[graft.functions.NearestCentroidGrouped]]): the row's library
    * key selects its k×d matrix from the broadcast literal, argmax runs in
    * the scan — no centroid join, no ×kPerLib row amplification, no
    * pre-aggregation shuffle (the round-2/3 shape paid both for the same
    * answer; at 100 TB that was an avoidable per-vector exchange). The only
    * shuffle left carries ≤ #libraries × kPerLib pre-aggregated counts.
    * Output = per-library inverted-list sizes (the reference's per-library
    * `stats` after `rebuild_index`, app/core/vector_db.py:294+stats). */
  def libraryIvfBuild(spark: SparkSession, dir: String, kPerLib: Int = 4): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("library"))
    val cents = collectLibraryCentroids(emb, kPerLib)
    // two aligned literals: library → matrix (scorer) and library → cid list
    // (idx-in-matrix → centroid id, resolved relationally after the scan)
    val matByLib = typedLit(cents.map { case (lib, cs) => lib -> cs.map(_._2.toSeq).toSeq })
    val cidByLib = typedLit(cents.map { case (lib, cs) => lib -> cs.map(_._1).toSeq })

    emb
      .withColumn("nc", Graft.nearestCentroidGrouped(col("embedding"), col("library"), matByLib))
      .select(col("library"),
        element_at(element_at(cidByLib, col("library")), col("nc.idx") + 1).as("cluster_id"))
      .groupBy(col("library"), col("cluster_id"))
      .agg(count(lit(1)).as("list_size"))
      .orderBy("library", "cluster_id")
  }

  /** Ranked top-k per (library, query) from scored candidate rows. */
  private def topkPerLibQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("library"), col("qid"))
      .agg(Graft.topk(col("score"), col("vec_id"), lit(k), lit(false)).as("top"))
      .select(col("library"), col("qid"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("library"), col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("vec_id"), round(col("r.score"), 4).as("score"))

  /** l3: per-library `index_type` DISPATCH — the reference stores an index
    * type on every Library (`app/core/models.py:26-33 Library.index_type`)
    * and routes each search through that library's own index via the
    * factory (`app/core/indexing.py`). Here the routing is a deterministic
    * config: libraries 0–3 are flat, 4–6 IVF, 7–9 LSH; every library's
    * queries (its first `qPerLib` vectors) search THEIR OWN library through
    * THEIR OWN index family, and the three arms union into one ranked
    * result — heterogeneous routing in a single plan, where the reference
    * loops libraries one at a time.
    *
    * Scale shape per arm: flat = broadcast(queries)-scoped scan + TopK
    * partial agg; IVF = map-only grouped assignment
    * ([[graft.functions.NearestCentroidGrouped]]) + broadcast probe join;
    * LSH = equi-join on (library, table_id, key). No arm ever crosses a
    * library boundary or an all-pairs product. */
  def libraryDispatchSearch(spark: SparkSession, dir: String, k: Int = 5, qPerLib: Int = 2,
                            kPerLib: Int = 4, ivfProbes: Int = 2,
                            nTables: Int = 4, nBits: Int = 8, seed: Long = 3000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("library"))
    // materialize the (tiny) query set ONCE: all three arms reference it,
    // and without the checkpoint each arm would re-run the corpus pass
    // just to re-derive ~2·#libraries rows
    val queries = firstPerLibrary(emb, qPerLib)
      .select(col("library"), col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()

    // ---- flat arm (libraries 0–3): exact scan within the library scope
    val flatEmb = emb.filter(col("library") <= 3)
    val flatQ = queries.filter(col("library") <= 3)
    val flatHits = topkPerLibQuery(
      flatEmb.join(broadcast(flatQ), Seq("library"))
        .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
        .select(col("library"), col("qid"), col("vec_id"), col("score")), k)
      .withColumn("index_type", lit("flat"))

    // ---- IVF arm (libraries 4–6): grouped map-only assignment + probes
    val ivfEmb = emb.filter(col("library") >= 4 && col("library") <= 6)
    val cents = collectLibraryCentroids(ivfEmb, kPerLib)
    val matByLib = typedLit(cents.map { case (lib, cs) => lib -> cs.map(_._2.toSeq).toSeq })
    val cidByLib = typedLit(cents.map { case (lib, cs) => lib -> cs.map(_._1).toSeq })
    val assigned = ivfEmb
      .withColumn("nc", Graft.nearestCentroidGrouped(col("embedding"), col("library"), matByLib))
      .select(col("library"), col("vec_id"), col("embedding"),
        element_at(element_at(cidByLib, col("library")), col("nc.idx") + 1).as("cluster_id"))

    val centSchema = StructType(Seq(
      StructField("library", LongType, nullable = false),
      StructField("cid", LongType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val centRows = cents.toSeq.flatMap { case (lib, cs) =>
      cs.map { case (cid, v) => Row(lib, cid, v.toSeq) }
    }
    val centDf = spark.createDataFrame(spark.sparkContext.parallelize(centRows, 1), centSchema)

    val ivfQ = queries.filter(col("library") >= 4 && col("library") <= 6)
    val probes = ivfQ.join(broadcast(centDf), Seq("library"))
      .withColumn("s", Graft.cosine(col("qvec"), col("cvec")))
      .groupBy(col("library"), col("qid"))
      .agg(Graft.topk(col("s"), col("cid"), lit(ivfProbes), lit(false)).as("top"))
      .select(col("library"), col("qid"), explode(col("top.id")).as("cluster_id"))

    val ivfHits = topkPerLibQuery(
      assigned.join(broadcast(probes), Seq("library", "cluster_id"))
        .join(broadcast(ivfQ), Seq("library", "qid"))
        .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
        .select(col("library"), col("qid"), col("vec_id"), col("score")), k)
      .withColumn("index_type", lit("ivf"))

    // ---- LSH arm (libraries 7–9): bucket join scoped by library
    val lshEmb = emb.filter(col("library") >= 7)
    val lshQ = queries.filter(col("library") >= 7)
    val dataKeys = lshEmb
      .withColumn("keys", Graft.simhashKeys(col("embedding"), nTables, nBits, seed))
      .select(col("library"), col("vec_id"), posexplode(col("keys")).as(Seq("table_id", "key")))
    val queryKeys = lshQ
      .withColumn("keys", Graft.simhashKeys(col("qvec"), nTables, nBits, seed))
      .select(col("library"), col("qid"), posexplode(col("keys")).as(Seq("table_id", "key")))
    val lshCand = dataKeys.join(broadcast(queryKeys), Seq("library", "table_id", "key"))
      .select(col("library"), col("qid"), col("vec_id")).distinct()
    val lshHits = topkPerLibQuery(
      lshCand
        .join(lshEmb.select(col("library"), col("vec_id"), col("embedding")), Seq("library", "vec_id"))
        .join(broadcast(lshQ), Seq("library", "qid"))
        .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
        .select(col("library"), col("qid"), col("vec_id"), col("score")), k)
      .withColumn("index_type", lit("lsh"))

    flatHits.unionByName(ivfHits).unionByName(lshHits)
      .select(col("library"), col("index_type"), col("qid"), col("rank"), col("vec_id"), col("score"))
      .orderBy("library", "qid", "rank")
  }

  def libraryDispatchSearchOracle(k: Int = 5, qPerLib: Int = 2, kPerLib: Int = 4,
                                  ivfProbes: Int = 2, nTables: Int = 4, nBits: Int = 8,
                                  seed: Long = 3000, dim: Int = 64): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label::BIGINT AS library FROM embeddings),
       |q AS (SELECT library, vec_id AS qid, v AS qvec FROM (
       |        SELECT library, vec_id, v,
       |               row_number() OVER (PARTITION BY library ORDER BY vec_id) AS rn FROM e)
       |      WHERE rn <= $qPerLib),
       |flat_r AS (SELECT e.library, q.qid, e.vec_id,
       |                  list_cosine_similarity(e.v, q.qvec) AS score,
       |                  row_number() OVER (PARTITION BY q.library, q.qid
       |                                     ORDER BY list_cosine_similarity(e.v, q.qvec) DESC, e.vec_id) AS rank
       |           FROM e JOIN q ON e.library = q.library WHERE e.library <= 3),
       |c AS (SELECT library, vec_id AS cid, v AS cvec FROM (
       |        SELECT library, vec_id, v,
       |               row_number() OVER (PARTITION BY library ORDER BY vec_id) AS rn FROM e
       |        WHERE library BETWEEN 4 AND 6)
       |      WHERE rn <= $kPerLib),
       |probes AS (SELECT library, qid, cid AS cluster_id FROM (
       |             SELECT q.library, q.qid, c.cid,
       |                    row_number() OVER (PARTITION BY q.library, q.qid
       |                                       ORDER BY list_cosine_similarity(q.qvec, c.cvec) DESC, c.cid) AS rn
       |             FROM q JOIN c ON q.library = c.library)
       |           WHERE rn <= $ivfProbes),
       |assigned AS (SELECT library, vec_id, cid AS cluster_id FROM (
       |               SELECT e.library, e.vec_id, c.cid,
       |                      row_number() OVER (PARTITION BY e.vec_id
       |                                         ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cid) AS rn
       |               FROM e JOIN c ON e.library = c.library)
       |             WHERE rn = 1),
       |ivf_r AS (SELECT s.library, s.qid, s.vec_id, s.score,
       |                 row_number() OVER (PARTITION BY s.library, s.qid
       |                                    ORDER BY s.score DESC, s.vec_id) AS rank
       |          FROM (SELECT a.library, p.qid, a.vec_id,
       |                       list_cosine_similarity(e.v, q.qvec) AS score
       |                FROM assigned a
       |                JOIN probes p ON a.library = p.library AND a.cluster_id = p.cluster_id
       |                JOIN e ON a.vec_id = e.vec_id
       |                JOIN q ON p.library = q.library AND p.qid = q.qid) s),
       |lsh_src AS (SELECT library, vec_id, v FROM e WHERE library >= 7),
       |dk AS (${Lsh.keysSql("lsh_src", "vec_id", nTables, nBits, dim, seed, extra = Seq("library"))}),
       |q_src AS (SELECT library, qid AS vec_id, qvec AS v FROM q WHERE library >= 7),
       |qk AS (${Lsh.keysSql("q_src", "vec_id", nTables, nBits, dim, seed, extra = Seq("library"))}),
       |lsh_cand AS (SELECT DISTINCT dk.library, qk.id AS qid, dk.id AS vec_id
       |             FROM dk JOIN qk ON dk.library = qk.library
       |                             AND dk.table_id = qk.table_id AND dk.key = qk.key),
       |lsh_r AS (SELECT s.library, s.qid, s.vec_id, s.score,
       |                 row_number() OVER (PARTITION BY s.library, s.qid
       |                                    ORDER BY s.score DESC, s.vec_id) AS rank
       |          FROM (SELECT cand.library, cand.qid, cand.vec_id,
       |                       list_cosine_similarity(e.v, q.qvec) AS score
       |                FROM lsh_cand cand
       |                JOIN e ON cand.vec_id = e.vec_id
       |                JOIN q ON cand.library = q.library AND cand.qid = q.qid) s),
       |uni AS (
       |  SELECT library, 'flat' AS index_type, qid, rank, vec_id, round(score, 4) AS score
       |  FROM flat_r WHERE rank <= $k
       |  UNION ALL
       |  SELECT library, 'ivf', qid, rank, vec_id, round(score, 4) FROM ivf_r WHERE rank <= $k
       |  UNION ALL
       |  SELECT library, 'lsh', qid, rank, vec_id, round(score, 4) FROM lsh_r WHERE rank <= $k)
       |SELECT library, index_type, qid, rank, vec_id, score
       |FROM uni ORDER BY library, qid, rank""".stripMargin

  def libraryIvfBuildOracle(kPerLib: Int = 4): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label::BIGINT AS library FROM embeddings),
       |c AS (SELECT library, vec_id AS cid, v AS cvec FROM (
       |        SELECT library, vec_id, v,
       |               row_number() OVER (PARTITION BY library ORDER BY vec_id) AS rn FROM e)
       |      WHERE rn <= $kPerLib),
       |s AS (SELECT e.library, e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim
       |      FROM e JOIN c ON e.library = c.library),
       |a AS (SELECT library, vec_id, cid FROM (
       |        SELECT library, vec_id, cid,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s)
       |      WHERE rn = 1)
       |SELECT library, cid AS cluster_id, count(*) AS list_size
       |FROM a GROUP BY library, cid ORDER BY library, cluster_id""".stripMargin
}
