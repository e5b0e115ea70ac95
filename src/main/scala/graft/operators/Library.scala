package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * (`include_chunk=True`) — one broadcast-dim join back to `documents`
    * on vec_id = doc_id; hits without a stored document keep NULL payload
    * (left join, same as the reference's `chunk if include_chunk else None`). */
  def searchWithPayload(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val hits = Knn.flatSearch(spark, dir, "cosine", k, nQueries)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        substring(col("text"), 1, 48).as("snippet"))
    hits.join(broadcast(docs), hits("vec_id") === docs("doc_id"), "left")
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
  def libraryKnn(spark: SparkSession, dir: String, k: Int = 5, qPerLib: Int = 2): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("library"))
    val byLib = Window.partitionBy(col("library")).orderBy(col("vec_id"))
    val queries = emb.withColumn("rn", row_number().over(byLib))
      .filter(col("rn") <= qPerLib)
      .select(col("library"), col("vec_id").as("qid"), col("embedding").as("qvec"))

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
    val byLib = Window.partitionBy(col("library")).orderBy(col("vec_id"))
    emb.withColumn("rn", row_number().over(byLib))
      .filter(col("rn") <= kPerLib)
      .select(col("library"), col("vec_id"), col("embedding"))
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
