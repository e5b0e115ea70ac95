package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LcgPlanes
import graft.sources.Tables

/** Text-query search — the reference's `/search_text` endpoint (embed the
  * query text, then kNN; reference: app/api/routes/operations.py,
  * README "Text-based Search").
  *
  * The reference calls the Cohere embed API; that external call is STUBBED
  * with a deterministic LCG embedder (same [[LcgPlanes]] arithmetic, exact
  * in both engines) so the *pipeline* — embed → broadcast → score → TopK —
  * is real and oracle-checkable end-to-end. Swapping in a real embedder is
  * one expression change.
  */
object SearchText {
  val Dim = 64
  val P: Long = Dedup.P

  /** Deterministic stub embedding of a text column: e_i = lcg(h60(text) mod
    * P + i) — exact-integer arithmetic, dim 64, double elements.
    *
    * CAUTION (cost): CollapseProject inlines the md5 subtree into the
    * transform lambda when `h` is referenced once, so the hash re-evaluates
    * PER ELEMENT — 64 md5s/row. Fine for a handful of query rows; for a
    * corpus-sized embed, materialize the hash first (localCheckpoint or a
    * write) and call [[stubEmbedFromHash]] on the stored column — f3 does
    * exactly this (3.0 s → md5-once at sf0.1). */
  def stubEmbed(text: Column): Column = stubEmbedFromHash(Dedup.h60(text) % P)

  /** The LCG expansion alone, over an already-computed `h60(text) % P`
    * column — per-element cost is pure integer arithmetic. */
  def stubEmbedFromHash(h: Column): Column =
    transform(sequence(lit(0), lit(Dim - 1)),
      i => (((lit(LcgPlanes.A) * (h + i.cast("long")) + LcgPlanes.C) % LcgPlanes.M)
        .cast("double") / lit(LcgPlanes.M.toDouble)) - 0.5)

  /** v20: the reference's embed endpoint (app/api/routes/embed.py
    * embed_texts — a batch of texts in, vectors out) as a batch operator:
    * map-only stub embedding over the scan, the documented deterministic
    * stand-in for the model call. At 100 TB this is the embedding-backfill
    * job shape — swap the stub for a batched model UDF and the plan is
    * unchanged (scan → per-row vectorize → write; no shuffle).
    *
    * Output is EXPLODED to scalar `(doc_id, i, val)` rows: the driver's
    * oracle compare sorts rows with pandas, which cannot factorize
    * array-typed cells (round-5 CORRECTNESS failure), so no oracle-gated
    * query may return an array column. `val` is rounded to 4 dp like every
    * other float in the suite; the underlying LCG expansion is exact
    * integer arithmetic + identical IEEE double ops on both engines. */
  def embedTexts(spark: SparkSession, dir: String, limit: Long = 100): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") < limit)
      .select(col("doc_id"), posexplode(stubEmbed(col("text"))).as(Seq("i", "val")))
      .select(col("doc_id"), col("i"), round(col("val"), 4).as("val"))
      .orderBy("doc_id", "i")

  def embedTextsOracle(limit: Long = 100): String =
    s"""SELECT doc_id, i, round(v, 4) AS val FROM (
       |  SELECT doc_id, unnest(${stubEmbedSql("text")}) AS v,
       |         unnest(generate_series(0, ${Dim - 1})) AS i
       |  FROM documents WHERE doc_id < $limit)
       |ORDER BY doc_id, i""".stripMargin

  /** v13: embed the texts of query docs (doc_id < nQueries), search the
    * embeddings table by cosine. */
  def searchText(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = Tables.documents(spark, dir).filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), stubEmbed(col("text")).as("qvec"))
    val scored = Knn.scoreAll(emb, queries, "cosine")
    Knn.topkPerQuery(scored, "cosine", k)
  }

  /** The stub embedding as a DuckDB list comprehension over any text
    * expression — single source for v13's and f3's oracles. */
  private[operators] def stubEmbedSql(textExpr: String): String = {
    val (a, c, m) = (LcgPlanes.A, LcgPlanes.C, LcgPlanes.M)
    s"[ (($a * ((CAST('0x' || substr(md5($textExpr), 1, 15) AS BIGINT) % $P) + i) + $c) % $m)::DOUBLE / $m.0 - 0.5" +
      s" for i in generate_series(0, ${Dim - 1}) ]"
  }

  def searchTextOracle(k: Int = 10, nQueries: Int = 4): String = {
    s"""WITH q AS (
       |  SELECT doc_id AS qid, ${stubEmbedSql("text")} AS qvec
       |  FROM documents WHERE doc_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id,
       |             list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }
}
