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
    * Output is EXPLODED to scalar `(doc_id, i, val_q4)` rows: the driver's
    * oracle compare sorts rows with pandas, which cannot factorize
    * array-typed cells (round-5 CORRECTNESS failure), so no oracle-gated
    * query may return an array column. The element value is emitted at
    * FIXED-POINT 4-dp quantization (`floor(val·10⁴ + 0.5)` as BIGINT, i.e.
    * val ≈ val_q4/10⁴) rather than `round(val, 4)`: each engine implements
    * decimal `round` differently at representation edges (Spark via
    * BigDecimal HALF_UP on the binary expansion, DuckDB via its C rounding
    * path), and with thousands of LCG-uniform samples one lands on an edge
    * (the round-6 hash mismatch). `floor(x·10⁴ + 0.5)` by contrast is the
    * SAME IEEE multiply/add/floor sequence on bit-identical doubles in both
    * engines — deterministic by construction, not by luck. */
  def embedTexts(spark: SparkSession, dir: String, limit: Long = 100): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") < limit)
      .select(col("doc_id"), posexplode(stubEmbed(col("text"))).as(Seq("pos", "val")))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        floor(col("val") * 10000d + 0.5d).cast("long").as("val_q4"))
      .orderBy("doc_id", "i")

  def embedTextsOracle(limit: Long = 100): String =
    s"""SELECT doc_id, i, floor(v * 10000 + 0.5)::BIGINT AS val_q4 FROM (
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
  private[operators] def stubEmbedSql(textExpr: String): String =
    stubEmbedFromHashSql(s"(CAST('0x' || substr(md5($textExpr), 1, 15) AS BIGINT) % $P)")

  /** The LCG expansion alone over an already-computed `h60(…) % P`
    * BIGINT expression — the SQL twin of [[stubEmbedFromHash]] (m5's
    * media encoder hashes a frame fingerprint instead of text). */
  private[operators] def stubEmbedFromHashSql(hExpr: String): String = {
    val (a, c, m) = (LcgPlanes.A, LcgPlanes.C, LcgPlanes.M)
    s"[ (($a * ($hExpr + i) + $c) % $m)::DOUBLE / $m.0 - 0.5" +
      s" for i in generate_series(0, ${Dim - 1}) ]"
  }

  /** v49: DOC-LEVEL MAX-SIM retrieval over CHUNK embeddings — the serving
    * shape of every chunked RAG store: the index holds CHUNKS (long docs
    * can't embed whole — the reference's data model IS chunks-in-docs,
    * models.py), the product ranks DOCUMENTS, and the bridge is late
    * max-pooling: doc score = max over its chunks' similarities (the
    * single-vector degenerate of ColBERT-style late interaction).
    * Pipeline: t9's window chunker → stub chunk embeddings (map-side, no
    * shuffle — swap the real encoder in, plan unchanged) → cosine vs the
    * broadcast query panel → ONE partial agg does BOTH poolings: groupBy
    * (qid, doc) max-pools chunks, then the TopK partial agg cuts per-query
    * winners — the corpus never sorts globally and never hits a few-
    * partition window (qid has |Q| values; the v1 TopK shape avoids
    * partitioning by it). Queries are the first windows of the first
    * nQueries docs, so rank-1 self-retrieval is the spec's built-in
    * ground truth. */
  def docMaxSim(spark: SparkSession, dir: String, window: Int = 64,
                stride: Int = 48, k: Int = 5, nQueries: Int = 4): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // r17 (guide §1.2 "per-task work" + §2.5): the corpus-side chunk hash
    // is MATERIALIZED once per chunk before the 64-element LCG expansion —
    // CollapseProject otherwise inlines the md5 subtree into the transform
    // lambda and re-evaluates it PER ELEMENT (the stubEmbed CAUTION; f3's
    // md5-once lesson applied here: 64 md5s of the full chunk text per
    // chunk → 1). The chunker+hash pass runs fanned out (the one-row-group
    // corpus otherwise serializes it on one core), and the checkpoint is
    // chunk-count × 16 B — the embed vectors themselves are never stored.
    // Same h per chunk → bit-identical cvec/scores; max/TopK are
    // order-independent, so the fan-out cannot move a result.
    val chunkH = Text.chunkFrame(Tables.fanOut(docs, col("doc_id")), window, stride)
      .select(col("doc_id"), (Dedup.h60(array_join(col("cw"), " ")) % P).as("h"))
      .localCheckpoint()
    val chunks = chunkH.select(col("doc_id"), stubEmbedFromHash(col("h")).as("cvec"))
    val queries = Text.chunkFrame(docs.filter(col("doc_id") < nQueries), window, stride)
      .filter(col("chunk_idx") === 0L)
      .select(col("doc_id").as("qid"), stubEmbed(array_join(col("cw"), " ")).as("qvec"))
    val pooled = chunks.crossJoin(broadcast(queries))
      .withColumn("sim", graft.Graft.cosine(col("cvec"), col("qvec")))
      .groupBy(col("qid"), col("doc_id"))
      .agg(max(col("sim")).as("score"))
    Knn.topkPerQuery(pooled, "cosine", k, idCol = "doc_id", outId = "doc_id")
  }

  def docMaxSimOracle(window: Int = 64, stride: Int = 48,
                      k: Int = 5, nQueries: Int = 4): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
       |                  len(string_split(text, ' '))::BIGINT AS n_tok
       |           FROM documents),
       |nc AS (SELECT doc_id, w,
       |              CASE WHEN n_tok <= $window THEN 1
       |                   ELSE (n_tok - $window + ${stride - 1}) // $stride + 1 END AS n_chunks
       |       FROM w),
       |x AS (SELECT doc_id, w,
       |             unnest([i for i in generate_series(0, n_chunks - 1)]) AS chunk_idx
       |      FROM nc),
       |ct AS (SELECT doc_id, chunk_idx,
       |              array_to_string(w[(chunk_idx * $stride + 1):(chunk_idx * $stride + $window)], ' ') AS ctext
       |       FROM x),
       |cv AS (SELECT doc_id, ${stubEmbedSql("ctext")} AS cvec FROM ct),
       |q AS (SELECT doc_id AS qid, ${stubEmbedSql("ctext")} AS qvec
       |      FROM ct WHERE doc_id < $nQueries AND chunk_idx = 0),
       |pooled AS (SELECT q.qid, cv.doc_id,
       |                  max(list_cosine_similarity(cv.cvec, q.qvec)) AS score
       |           FROM cv CROSS JOIN q GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |      FROM pooled)
       |SELECT qid, rank, doc_id, round(score, 4) AS score
       |FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v24: hybrid search — reciprocal-rank fusion (Cormack et al. 2009) of
    * the BM25 arm (t11) and the vector arm (v13's stub-embedded query →
    * cosine) for ONE query text, the lexical+semantic pattern every
    * production vector store now ships. Each arm is its existing
    * distributed top-C plan (TopK partial agg / term-filtered BM25); the
    * fusion is a full-outer join of two ≤C-row lists plus `1/(60+rank)`
    * arithmetic on INTEGER ranks — exactly reproducible cross-engine, so
    * the composite hash-gates even though it mixes float scores from two
    * different scoring models (ranks, not scores, are fused — that IS the
    * point of RRF). The rank windows run unpartitioned over the ≤C fused
    * rows, AFTER each arm's distributed top-C cut. */
  def hybridSearch(spark: SparkSession, dir: String,
                   queryText: String = "merge spark window",
                   k: Int = 10, c: Int = 50, rrfK: Int = 60): DataFrame = {
    graft.Graft.init(spark)
    import org.apache.spark.sql.expressions.Window
    val terms = queryText.split(" ").toSeq
    val bm = Text.bm25TopK(spark, dir, terms, c)
      .withColumn("rank_bm25",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_bm25"))
    val qdf = spark.range(1).select(stubEmbed(lit(queryText)).as("qvec"))
    val vec = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(qdf))
      .withColumn("score", graft.Graft.cosine(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("vec_id")).limit(c)
      .withColumn("rank_vec",
        row_number().over(Window.orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_vec"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_bm25").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_vec").cast("double")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("rank_bm25"), col("rank_vec"), round(col("rrf"), 6).as("rrf"))
  }

  def hybridSearchOracle(queryText: String = "merge spark window",
                         k: Int = 10, c: Int = 50, rrfK: Int = 60): String = {
    val terms = queryText.split(" ").toSeq
    s"""WITH bm AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
       |  FROM (${Text.bm25TopKOracle(terms, k = c)})),
       |vq AS (SELECT ${stubEmbedSql(s"'$queryText'")} AS qvec),
       |vs AS (SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], vq.qvec) AS score
       |       FROM embeddings e CROSS JOIN vq),
       |vr AS (SELECT vec_id AS doc_id, rank_vec FROM (
       |  SELECT vec_id, score, row_number() OVER (ORDER BY score DESC, vec_id) AS rank_vec FROM vs)
       |  WHERE rank_vec <= $c),
       |f AS (SELECT coalesce(bm.doc_id, vr.doc_id) AS doc_id, bm.rank_bm25, vr.rank_vec,
       |             coalesce(1.0 / ($rrfK.0 + bm.rank_bm25::DOUBLE), 0.0) +
       |             coalesce(1.0 / ($rrfK.0 + vr.rank_vec::DOUBLE), 0.0) AS rrf
       |      FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id)
       |SELECT doc_id, rank_bm25, rank_vec, round(rrf, 6) AS rrf FROM f
       |ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin
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

  /** v54: DELTA RE-EMBEDDING — embedding maintenance between corpus
    * generations: when last night's run rewrote ONE shard's text (p17's
    * generation edits), only THOSE documents re-encode; everyone else's
    * vector is REUSED from the persisted gen-1 embedding store. At
    * 100 TB the encoder is the cost (GPU-months for a full corpus pass)
    * and this is the only sane refresh: recompute ∝ changed bytes, reuse
    * ∝ everything else — the embedding-store twin of p19's
    * copy-on-write. The op builds the gen-1 store (one stub-embed pass,
    * persisted — the standing artifact), derives gen 2 (shard 5's text
    * rewritten, shard 15 dropped), re-encodes ONLY shard 5, and serves
    * gen 2 as recomputed ∪ reused-by-join; the gate folds the SERVED
    * vectors (first-dim Q4 per doc, order-independent checksum) per
    * (shard, status), which the oracle replays by embedding gen-2's text
    * from scratch — so the hash proves the reuse join serves vectors
    * bit-identical to recomputation (doubles round-trip parquet
    * bit-exactly), while the `status` column proves only the changed
    * shard paid the encoder. */
  def embedDelta(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w = docs.agg(expr("(max(doc_id) + 16) div 16").as("w")).head.getLong(0)
    val sharded = docs.withColumn("shard", expr(s"doc_id div $w"))
    // the gen-1 embedding store: the persisted standing artifact
    val storePath = Persist.tablePath(spark, "graft_embed_store_gen1")
    sharded.select(col("doc_id"), stubEmbed(col("text")).as("embedding"))
      .write.mode("overwrite").parquet(storePath)
    // gen 2: shard 5 rewritten, shard 15 dropped (p17's edit predicates)
    val gen2 = sharded.filter(col("shard") =!= 15L)
      .withColumn("text2", when(col("shard") === 5L,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    val recomputed = gen2.filter(col("shard") === 5L)
      .select(col("doc_id"), col("shard"),
        stubEmbed(col("text2")).as("embedding"), lit("recomputed").as("status"))
    val reused = gen2.filter(col("shard") =!= 5L)
      .select(col("doc_id"), col("shard"))
      .join(spark.read.parquet(storePath), Seq("doc_id")) // reuse, never re-encode
      .select(col("doc_id"), col("shard"), col("embedding"),
        lit("reused").as("status"))
    recomputed.unionByName(reused)
      .select(col("shard"), col("status"), col("doc_id"),
        floor(element_at(col("embedding"), 1) * 10000d + 0.5d).cast("long").as("val_q4"))
      .withColumn("hc", graft.operators.Dedup.h60(
        concat_ws(":", lit("emb"), col("doc_id"), col("val_q4"))))
      .groupBy(col("shard"), col("status"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(hc)").as("chk"))
      .orderBy("shard", "status")
  }

  def embedDeltaOracle(): String =
    s"""WITH b AS (SELECT ((max(doc_id) + 16) // 16)::BIGINT AS w FROM documents),
       |d AS (SELECT doc_id, text, (doc_id // b.w)::BIGINT AS shard FROM documents, b),
       |g2 AS (SELECT doc_id, shard,
       |              CASE WHEN shard = 5 THEN text || ' v2' ELSE text END AS text2,
       |              CASE WHEN shard = 5 THEN 'recomputed' ELSE 'reused' END AS status
       |       FROM d WHERE shard <> 15),
       |e AS (SELECT doc_id, shard, status,
       |             floor((${stubEmbedSql("text2")})[1] * 10000 + 0.5)::BIGINT AS val_q4
       |      FROM g2),
       |h AS (SELECT shard, status,
       |             CAST('0x' || substr(md5('emb:' || CAST(doc_id AS VARCHAR) || ':' || CAST(val_q4 AS VARCHAR)), 1, 15) AS BIGINT) AS hc
       |      FROM e)
       |SELECT shard, status, count(*)::BIGINT AS n_docs, bit_xor(hc)::BIGINT AS chk
       |FROM h GROUP BY shard, status ORDER BY shard, status""".stripMargin
}
