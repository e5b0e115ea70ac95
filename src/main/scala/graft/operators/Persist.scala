package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.{Sinks, Tables}

/** Index persistence / rebuild — the reference's "indexes survive restart"
  * semantics (reference: app/core/vector_db.py:272-292 rebuilds every
  * library's index from storage on startup; tests-mongo/test_persistence.py
  * exercises flat/IVF/LSH round-trips).
  *
  * The Spark-native analog of "persist the index" is a MATERIALIZED TABLE
  * whose physical layout *is* the index:
  *
  *   - LSH keys → a table bucketed by the bucket key, so probe/self-joins
  *     co-locate without an Exchange;
  *   - MinHash band keys → same, bucketed by band key (this also removes
  *     round 1's reliance on AQE ReuseExchange for the band self-join —
  *     the signatures are computed ONCE, on disk, instead of twice);
  *   - IVF cluster assignments → a hive-partitioned table on `cluster_id`
  *     (the inverted lists literally become directories; probing clusters
  *     is partition pruning at the file-listing level).
  *
  * Each query here does the full round-trip — build, write, reload from
  * storage, search against the reloaded artifact — and must hash-match the
  * fresh-build oracle: persistence may not change a single result bit.
  */
object Persist {

  /** Warehouse location for a graft index table (inside the repo). */
  private[operators] def tablePath(spark: SparkSession, table: String): String =
    spark.conf.get("spark.sql.warehouse.dir") + "/" + table

  /** Drop table + its files (works across sessions — the in-memory catalog
    * forgets tables on restart but the parquet stays, so a plain overwrite
    * saveAsTable would refuse the non-empty managed location). */
  private[graft] def dropIndexTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new Path(tablePath(spark, table))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Rewrite `df` as a bucketed+sorted catalog table and reload it. */
  private[operators] def materializeBucketed(spark: SparkSession, df: DataFrame, table: String,
                                             buckets: Int, bucketCols: Seq[String]): DataFrame = {
    dropIndexTable(spark, table)
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** p1: LSH persistence round-trip — build the SimHash key table, persist
    * it bucketed by `key`, reload, and run the v10-style bucket-union +
    * exact-cosine-rerank search against the RELOADED index
    * (reference: tests-mongo/test_persistence.py:319 lsh_simhash restart).
    * Oracle = the fresh-build search; the round-trip must be invisible. */
  def lshPersistSearch(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                       nTables: Int = 4, nBits: Int = 12, seed: Long = 5000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

    val built = Lsh.keyRows(emb, nTables, nBits, seed)
    val index = materializeBucketed(spark, built, "graft_idx_lsh", 8, Seq("key"))

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Lsh.searchIndex(index, emb, queries, nTables, nBits, seed, k)
  }

  def lshPersistSearchOracle(k: Int = 10, nQueries: Int = 8, nTables: Int = 4,
                             nBits: Int = 12, seed: Long = 5000): String =
    Lsh.searchOracle(k, nQueries, nTables, nBits, seed)

  /** p7: DELETION from a persisted index WITHOUT rebuild — the
    * right-to-be-forgotten flow an ANN store actually runs: the bucketed
    * index stays untouched on disk, a deletion request appends the doc
    * ids to a tiny tombstone log (its own parquet artifact), and every
    * search applies the log MERGE-ON-READ as a broadcast anti-join on
    * the candidate set (and on the query set — a deleted doc may not
    * query either). Cost per delete is O(|log|) writes and O(|log|)
    * broadcast per search, never an index rebuild; a compaction job
    * (the [[graft.streaming.Streams.compactIndex]] shape) folds the log
    * into a new generation when it grows. The delete set is a pure
    * content-hash slice so the oracle re-derives it as a predicate —
    * semantically, search-after-delete ≡ a fresh index over the
    * surviving corpus (spec-asserted bit-for-bit). */
  def tombstoneDeleteSearch(spark: SparkSession, dir: String, k: Int = 10,
                            nQueries: Int = 8, nTables: Int = 4, nBits: Int = 12,
                            seed: Long = 5000, mod: Long = 7L): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val built = Lsh.keyRows(emb, nTables, nBits, seed)
    val index = materializeBucketed(spark, built, "graft_idx_lsh_del", 8, Seq("key"))
    val delPath = tablePath(spark, "graft_idx_lsh_tombstones")
    emb.select(col("vec_id"))
      .filter(Dedup.h60(concat(lit("del:"), col("vec_id").cast("string"))) % mod === 0L)
      .write.mode("overwrite").parquet(delPath)
    val tombs = spark.read.parquet(delPath)
    val liveIndex = index.join(broadcast(tombs), Seq("vec_id"), "left_anti")
    val queries = emb.filter(col("vec_id") < nQueries)
      .join(broadcast(tombs), Seq("vec_id"), "left_anti")
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Lsh.searchIndex(liveIndex, emb, queries, nTables, nBits, seed, k)
  }

  def tombstoneDeleteSearchOracle(k: Int = 10, nQueries: Int = 8, nTables: Int = 4,
                                  nBits: Int = 12, seed: Long = 5000, mod: Long = 7L,
                                  dim: Int = 64): String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM e0
       |      WHERE NOT ((CAST('0x' || substr(md5('del:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)) % $mod = 0)),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries),
       |dk AS (${Lsh.keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${Lsh.keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(e.v, q.qv) AS score
       |           FROM cand JOIN e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** p2: MinHash-signature persistence round-trip — compute the banded LSH
    * key table ONCE, persist it bucketed by `band_key`, reload, self-join
    * the materialized table for candidate pairs, exact-Jaccard rerank
    * (reference: tests-mongo/test_persistence.py:182 index state survives
    * restart). The self-join on the bucketed table needs NO Exchange
    * (asserted in PersistSpec) — this replaces round 1's fragile
    * AQE-ReuseExchange of the in-flight signature computation. */
  /** p11: VERIFIED PHYSICAL PURGE — the data-governance flow
    * (right-to-be-forgotten / takedown) a training-data store must prove,
    * not just promise. p7 shows MERGE-ON-READ deletion (tombstones mask
    * at query time, files untouched); this is the second half: the
    * COMPACTION that rewrites corpus and index without the tombstoned
    * rows, then an audit computed by RE-READING the rewritten artifacts —
    * per artifact: row count, count of purged ids still present (must be
    * 0), and an order-independent `bit_xor` content checksum (the f7
    * manifest device). The oracle recomputes count+checksum from the base
    * table with the tombstone predicate inverted, so a hash-green row
    * proves the files on disk hold exactly the intended survivors —
    * deletion evidenced from the storage, not the query path. At 100 TB
    * this is one filtered rewrite per artifact plus bounded-output
    * audit aggregates. */
  def purgeProof(spark: SparkSession, dir: String, mod: Long = 7L,
                 nTables: Int = 4, nBits: Int = 12, seed: Long = 5000): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def tomb(c: Column): Column =
      Dedup.h60(concat(lit("del:"), c.cast("string"))) % mod === 0L
    val corpusPath = tablePath(spark, "graft_purged_corpus")
    emb.filter(!tomb(col("vec_id"))).write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val idxPath = tablePath(spark, "graft_purged_lsh")
    Lsh.keyRows(corpus, nTables, nBits, seed).write.mode("overwrite").parquet(idxPath)
    val idx = spark.read.parquet(idxPath)

    val corpusAudit = corpus
      .select(col("vec_id"),
        Dedup.h60(concat(lit("chk:"), col("vec_id").cast("string"))).as("hc"))
      .groupBy(lit("corpus").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("vec_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    val idxAudit = idx
      .select(col("vec_id"), Dedup.h60(concat_ws(":",
        lit("chk"), col("vec_id"), col("table_id"), col("key"))).as("hc"))
      .groupBy(lit("lsh_index").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("vec_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    corpusAudit.unionAll(idxAudit).orderBy("artifact")
  }

  def purgeProofOracle(mod: Long = 7L, nTables: Int = 4, nBits: Int = 12,
                       seed: Long = 5000, dim: Int = 64): String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM e0
       |      WHERE NOT ((CAST('0x' || substr(md5('del:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)) % $mod = 0)),
       |dk AS (${Lsh.keysSql("e", "vec_id", nTables, nBits, dim, seed)}),
       |ca AS (SELECT 'corpus' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |       FROM e),
       |ia AS (SELECT 'lsh_index' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(id AS VARCHAR) || ':' ||
       |                CAST(table_id AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |       FROM dk)
       |SELECT * FROM ca UNION ALL SELECT * FROM ia ORDER BY artifact""".stripMargin

  /** p12: [[purgeProof]] extended to the DERIVED index artifacts — the
    * round-8 finding that right-to-be-forgotten must hold for EVERY
    * standing artifact, not just the corpus and the LSH keys: after the
    * purge rewrite, the IVF assignment lists and the binary sign-word
    * index are REBUILT FROM THE REWRITTEN CORPUS FILES (read back from
    * disk, so the audit chain starts at storage), persisted, re-read, and
    * audited with p11's inverted-predicate recipe — row count, purged ids
    * still present (must be 0), order-independent `bit_xor` content
    * checksum that the oracle recomputes from the base table with the
    * tombstone predicate inverted. Centroids are the K lowest SURVIVING
    * ids, so even the model parameters derive from post-purge data. At
    * 100 TB: one filtered rewrite + two map-only derivations (centroid
    * assignment is a typedLit probe, sign-packing is codegen'd integer
    * math) + bounded-output audit aggregates. */
  def purgeProofIndexed(spark: SparkSession, dir: String, mod: Long = 7L,
                        kCentroids: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def tomb(c: Column): Column =
      Dedup.h60(concat(lit("del:"), c.cast("string"))) % mod === 0L
    val basePath = tablePath(spark, "graft_purged_base")
    emb.filter(!tomb(col("vec_id"))).write.mode("overwrite").parquet(basePath)
    val corpus = spark.read.parquet(basePath)

    val mat: Array[(Long, Array[Double])] =
      corpus.orderBy("vec_id").limit(kCentroids).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val listsPath = tablePath(spark, "graft_purged_ivf_lists")
    Ivf.assignToMat(corpus, mat).select(col("vec_id"), col("cluster_id"))
      .write.mode("overwrite").parquet(listsPath)
    val lists = spark.read.parquet(listsPath)

    val binPath = tablePath(spark, "graft_purged_binary_words")
    corpus.select(col("vec_id"),
      Knn.signWordExpr("embedding", 0).as("w0"), Knn.signWordExpr("embedding", 1).as("w1"))
      .write.mode("overwrite").parquet(binPath)
    val bin = spark.read.parquet(binPath)

    val listsAudit = lists
      .select(col("vec_id"), Dedup.h60(concat_ws(":",
        lit("chk"), col("vec_id"), col("cluster_id"))).as("hc"))
      .groupBy(lit("ivf_lists").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("vec_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    val binAudit = bin
      .select(col("vec_id"), Dedup.h60(concat_ws(":",
        lit("chk"), col("vec_id"), col("w0"), col("w1"))).as("hc"))
      .groupBy(lit("binary_index").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("vec_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    binAudit.unionAll(listsAudit).orderBy("artifact")
  }

  def purgeProofIndexedOracle(mod: Long = 7L, kCentroids: Int = 8): String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM e0
       |      WHERE NOT ((CAST('0x' || substr(md5('del:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)) % $mod = 0)),
       |c AS (SELECT vec_id AS cid, v AS cvec FROM e ORDER BY vec_id LIMIT $kCentroids),
       |asg AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim FROM e CROSS JOIN c),
       |lists AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM asg)
       |  WHERE rn = 1),
       |p AS (SELECT vec_id,
       |             list_sum([CASE WHEN v[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w0,
       |             list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w1
       |      FROM e),
       |la AS (SELECT 'ivf_lists' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(vec_id AS VARCHAR) || ':' ||
       |                CAST(cluster_id AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |       FROM lists),
       |ba AS (SELECT 'binary_index' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(vec_id AS VARCHAR) || ':' ||
       |                CAST(w0 AS VARCHAR) || ':' || CAST(w1 AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |       FROM p)
       |SELECT * FROM ba UNION ALL SELECT * FROM la ORDER BY artifact""".stripMargin

  /** p13: the purge proof extended to the PRODUCT-QUANTIZER artifacts —
    * the last standing per-vector derived data ([[purgeProofIndexed]]
    * covers IVF lists + binary words; this covers the coded families'
    * two artifacts): after the purge rewrite, the PQ CODEBOOK is rebuilt
    * from the K lowest SURVIVING ids (so even the model parameters derive
    * from post-purge data — a purged vector must not live on as a
    * codebook row, the right-to-be-forgotten leak v19c's artifact would
    * otherwise have), the surviving corpus is re-encoded, the M per-
    * subspace cells PACKED into one bigint per vector (4 bits/cell — the
    * v19c packed-row shape), both persisted, RE-READ FROM DISK and
    * audited with p11's inverted-predicate recipe: row count, purged ids
    * still present (must be 0 in both artifacts), order-independent
    * `bit_xor` content checksum the oracle recomputes from the base
    * table with the tombstone predicate inverted. Packed codes are
    * integers, so the checksum covers the encode math transitively. At
    * 100 TB: one filtered rewrite + a broadcast-codebook encode (128
    * tiny rows) + bounded-output audit aggregates. */
  def purgeProofCoded(spark: SparkSession, dir: String, mod: Long = 7L): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def tomb(c: Column): Column =
      Dedup.h60(concat(lit("del:"), c.cast("string"))) % mod === 0L
    val basePath = tablePath(spark, "graft_purged_pq_base")
    emb.filter(!tomb(col("vec_id"))).write.mode("overwrite").parquet(basePath)
    val corpus = spark.read.parquet(basePath)

    // codebook SOURCE ids: the Pq.K lowest surviving ids, cell = rank —
    // driver state is 16 longs (the artifact's own bound)
    val cbIds: Array[Long] = corpus.select(col("vec_id")).orderBy("vec_id")
      .limit(Pq.K).collect().map(_.getLong(0))
    val cellOf = cbIds.sorted.zipWithIndex.toMap
    val cbPath = tablePath(spark, "graft_purged_pq_codebook")
    val subAll = corpus
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(Pq.M - 1))).as("m"), col("v"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * Pq.Sub + 1, lit(Pq.Sub)).as("sv"))
    val cellMap = typedLit(cellOf.map { case (id, cell) => id -> cell.toLong })
    subAll.filter(col("vec_id").isin(cbIds: _*))
      .select(col("m"), element_at(cellMap, col("vec_id")).as("cell"),
        col("vec_id").as("src_id"), col("sv").as("cv"))
      .write.mode("overwrite").parquet(cbPath)
    val codebook = spark.read.parquet(cbPath)

    // encode survivors against the re-read codebook: argmin-L2 per
    // subspace (ties to the lowest cell), cells packed 4 bits each
    val codesPath = tablePath(spark, "graft_purged_pq_codes")
    subAll
      .join(broadcast(codebook.select(col("m"), col("cell"), col("cv"))), Seq("m"))
      .select(col("vec_id"), col("m"),
        struct(Graft.l2(col("sv"), col("cv")).as("d"), col("cell")).as("dc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("dc")).as("best"))
      .select(col("vec_id"),
        expr("shiftleft(cast(best.cell as bigint), cast(4 * m as int))").as("part"))
      .groupBy(col("vec_id")).agg(sum(col("part")).as("packed"))
      .write.mode("overwrite").parquet(codesPath)
    val codes = spark.read.parquet(codesPath)

    val cbAudit = codebook
      .select(col("src_id"), Dedup.h60(concat_ws(":",
        lit("chk"), col("m"), col("cell"), col("src_id"))).as("hc"))
      .groupBy(lit("pq_codebook").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("src_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    val codesAudit = codes
      .select(col("vec_id"), Dedup.h60(concat_ws(":",
        lit("chk"), col("vec_id"), col("packed"))).as("hc"))
      .groupBy(lit("pq_codes").as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(tomb(col("vec_id")), 1L).otherwise(0L)).as("n_purged_remaining"),
        expr("bit_xor(hc)").as("checksum"))
    cbAudit.unionAll(codesAudit).orderBy("artifact")
  }

  def purgeProofCodedOracle(mod: Long = 7L): String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM e0
       |      WHERE NOT ((CAST('0x' || substr(md5('del:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)) % $mod = 0)),
       |cb AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
       |       FROM e ORDER BY vec_id LIMIT ${Pq.K}),
       |em AS (SELECT vec_id, v, unnest([i for i in generate_series(0, ${Pq.M - 1})]) AS m FROM e),
       |sub AS (SELECT vec_id, m, v[(${Pq.Sub}*m+1):(${Pq.Sub}*m+${Pq.Sub})] AS sv FROM em),
       |cent AS (SELECT s.m, b.cell, s.vec_id AS src_id, s.sv AS cv
       |         FROM sub s JOIN cb b USING (vec_id)),
       |dist AS (SELECT s.vec_id, s.m, c.cell, list_distance(s.sv, c.cv) AS d
       |         FROM sub s JOIN cent c USING (m)),
       |code AS (SELECT vec_id, m, cell FROM (
       |           SELECT vec_id, m, cell,
       |                  row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cell) AS rn
       |           FROM dist) WHERE rn = 1),
       |packed AS (SELECT vec_id, sum(cell * (1::BIGINT << (4 * m)))::BIGINT AS packed
       |           FROM code GROUP BY vec_id),
       |cba AS (SELECT 'pq_codebook' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |               bit_xor(CAST('0x' || substr(md5('chk:' || CAST(m AS VARCHAR) || ':' ||
       |                 CAST(cell AS VARCHAR) || ':' || CAST(src_id AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |        FROM cent),
       |cda AS (SELECT 'pq_codes' AS artifact, count(*)::BIGINT AS n_rows, 0::BIGINT AS n_purged_remaining,
       |               bit_xor(CAST('0x' || substr(md5('chk:' || CAST(vec_id AS VARCHAR) || ':' ||
       |                 CAST(packed AS VARCHAR)), 1, 15) AS BIGINT))::BIGINT AS checksum
       |        FROM packed)
       |SELECT * FROM cba UNION ALL SELECT * FROM cda ORDER BY artifact""".stripMargin

  /** p14: SMALL-FILES COMPACTION with a content-invariance proof — the
    * lakehouse maintenance operation 100 TB tables live or die by: a
    * micro-batch/streaming writer fragments a table into thousands of
    * KB-sized files, and every later scan pays per-file open/footer/task
    * overhead until a compaction rewrites the data into target-sized
    * files. Here the fragmented state is produced deliberately
    * (`repartition(nFragments)` — the many-small-writers stand-in), the
    * compaction is a shuffle-FREE `coalesce(nTarget)` rewrite (read +
    * concatenate, never a redistribution — compaction must not pay a
    * corpus shuffle), and the GATE is content invariance: both
    * generations are RE-READ FROM DISK and audited with the f7 manifest
    * recipe (row count, distinct keys, order-independent `bit_xor`
    * content checksum over id+payload). The oracle computes the same
    * triple from the base table — fragmented ≡ compacted ≡ source proves
    * the rewrite moved bytes, not data. File counts are physical-layout
    * facts the oracle cannot see; the spec asserts them (≥ nFragments
    * before, ≤ nTarget after). */
  def compactSmallFiles(spark: SparkSession, dir: String,
                        nFragments: Int = 64, nTarget: Int = 4): DataFrame = {
    Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val fragPath = tablePath(spark, "graft_frag_corpus")
    docs.repartition(nFragments).write.mode("overwrite").parquet(fragPath)
    val frag = spark.read.parquet(fragPath)
    val compPath = tablePath(spark, "graft_compacted_corpus")
    frag.coalesce(nTarget).write.mode("overwrite").parquet(compPath)
    val comp = spark.read.parquet(compPath)

    def audit(df: DataFrame, name: String): DataFrame = df
      .select(col("doc_id"),
        Dedup.h60(concat_ws(":", lit("chk"), col("doc_id"), col("text"))).as("hc"))
      .groupBy(lit(name).as("artifact")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        expr("bit_xor(hc)").as("checksum"))
    audit(comp, "compacted").unionAll(audit(frag, "fragmented")).orderBy("artifact")
  }

  def compactSmallFilesOracle(): String =
    """WITH s AS (SELECT count(*)::BIGINT AS n_rows, count(DISTINCT doc_id)::BIGINT AS n_docs,
      |                  bit_xor(CAST('0x' || substr(md5('chk:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT))::BIGINT AS checksum
      |           FROM documents),
      |a AS (SELECT 'compacted' AS artifact UNION ALL SELECT 'fragmented')
      |SELECT a.artifact, s.n_rows, s.n_docs, s.checksum
      |FROM a CROSS JOIN s ORDER BY artifact""".stripMargin

  /** p15: TABLE-STATISTICS COLLECTION (ANALYZE) — the per-column
    * row-count / null-count / NDV / min / max profile every cost-based
    * planner and data-quality monitor reads before touching a 100 TB
    * table (join-order choice, broadcast decisions, zone-map sanity,
    * schema-drift alerts all start here). One corpus scan: the five
    * numeric columns unpivot map-side into (column, value) rows — 5× row
    * amplification of a 2-field row, no shuffle — then ONE groupBy(column)
    * computes all five stats; a single `countDistinct` per group keeps the
    * plan Expand-free (the q19 lesson — multi-distinct over separate
    * columns in one wide aggregate is the shape that triples the scan).
    * Values quantize to 4-dp fixed point BEFORE distinct/min/max, so the
    * NDV is over the q4 domain and every stat hash-gates exactly. Exact
    * NDV is the ANALYZE semantics; t13's HLL sketch is this operator's
    * approximate twin when a pass over the distinct domain is too dear. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    statsUnpivot(Tables.lineitem(spark, dir))
      .groupBy(col("cname"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("vq4"))).as("n_nulls"),
        countDistinct(col("vq4")).as("n_distinct"),
        min(col("vq4")).as("min_q4"), max(col("vq4")).as("max_q4"))
      .orderBy("cname")
  }

  def tableStatsOracle(): String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val arms = cols.map(c =>
      s"SELECT '$c' AS cname, floor($c::DOUBLE * 10000 + 0.5)::BIGINT AS vq4 FROM lineitem")
      .mkString("\nUNION ALL\n")
    s"""WITH u AS ($arms)
       |SELECT cname, count(*)::BIGINT AS n_rows,
       |       (count(*) - count(vq4))::BIGINT AS n_nulls,
       |       count(DISTINCT vq4)::BIGINT AS n_distinct,
       |       min(vq4) AS min_q4, max(vq4) AS max_q4
       |FROM u GROUP BY 1 ORDER BY cname""".stripMargin
  }

  /** The p15 unpivot: the five lineitem numerics as (cname, vq4) rows,
    * values quantized to 4-dp fixed point per VALUE (map-side, no
    * shuffle) so every downstream stat is exact-integer. */
  private def statsUnpivot(li: DataFrame): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val arms = cols.map(c => struct(lit(c).as("cname"),
      floor(col(c).cast("double") * 1e4 + 0.5).cast("long").as("vq4")))
    // fanOut (r17, guide §2.5): the 5× unpivot of a one-row-group scan
    // otherwise runs on one core; every downstream stat is exact-integer
    // (count/min/max/distinct) — order-independent under any partitioning
    graft.sources.Tables.fanOut(li, col("l_orderkey"))
      .select(explode(array(arms: _*)).as("u"))
      .select(col("u.cname").as("cname"), col("u.vq4").as("vq4"))
  }

  /** p16: INCREMENTAL ANALYZE — p15's stats maintained WITHOUT rescanning
    * the whole table, the only way statistics stay fresh at 100 TB (a new
    * generation lands nightly; re-profiling 100 TB to absorb a 100 GB
    * delta is the anti-pattern). Each generation (the p8 even/odd
    * doc-split rule) computes and PERSISTS two mergeable artifacts:
    * per-column scalar stats (rows / nulls / min / max — merge = sum,
    * sum, min, max) and the exact DISTINCT-VALUE DOMAIN table (merge =
    * union-distinct; exact NDV is NOT mergeable from counts alone — the
    * domain table is the price of exactness, edge-sized state, and t13's
    * HLL register file is the constant-state approximate twin). The
    * refresh then reads ONLY the artifacts back from disk — never the
    * base table — and merges: one |columns|-group aggregate over 2·|cols|
    * scalar rows plus one distinct-count over the unioned domains (the
    * merge shuffle is domain-sized, not corpus-sized). Gate: the merged
    * profile must equal p15's from-scratch scan BIT-FOR-BIT — same
    * schema, same oracle — so a hash-green row proves incremental ≡
    * full-rescan. Spec adds the physical facts the oracle can't see:
    * generations partition the table, and the domain tables genuinely
    * overlap (the union-distinct merge is not a concat).
    *
    * TRUE incremental shape (r15, the v51c rule applied here):
    * generation 0's scalar+domain artifacts are the STANDING history —
    * built only when missing or profiled from a different corpus (a
    * `src` provenance column keys the reuse, so a wiped warehouse or a
    * dataset switch self-heals) — and a call's own work is exactly ONE
    * new-generation scan plus the artifacts-only merge. Spec proves the
    * repeat call leaves gen-0's files byte-identical (mtime-stable) and
    * the merge subtree scans only artifacts, never lineitem. */
  def statsMerge(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    // standing history: reuse generation 0's artifacts when both exist
    // and carry this corpus's provenance (the v51c registry rule — a
    // stats artifact silently carried across datasets is how a CBO
    // serves garbage estimates). The probe's VERDICT is cached per
    // session keyed by the artifact's (path, mtime) signature — the
    // GraftDb.readMetaCached pattern — so a repeat call costs two
    // filesystem stats and ZERO driver-side parquet reads
    // (counter-gated: [[g0ProbeReads]]); an out-of-band wipe or rewrite
    // changes the signature and re-probes.
    val g0Paths = Seq(tablePath(spark, "graft_stats_scalar_g0"),
      tablePath(spark, "graft_stats_domain_g0"))
    val conf = spark.sessionState.newHadoopConf()
    val g0Ok = g0Paths.forall { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      fs.exists(hp) && {
        val sig = (p, dir, fs.getFileStatus(hp).getModificationTime)
        g0ProbeCache.getOrElseUpdate(sig, {
          g0ProbeReads.incrementAndGet()
          val probe = spark.read.parquet(p)
          probe.columns.contains("src") && {
            // bounded: one row per distinct src value (normally exactly 1)
            val srcs = probe.select(col("src")).distinct().collect()
            srcs.nonEmpty && srcs.forall(_.getString(0) == dir)
          }
        })
      }
    }
    if (!g0Ok) writeGenProfileArtifacts(spark, dir, 0)
    // the incremental step: ONE new-generation scan + artifacts-only merge
    writeGenProfileArtifacts(spark, dir, 1)
    mergeProfileArtifacts(spark)
  }

  /** p16's gen-0 provenance-probe verdicts, keyed (path, corpus dir,
    * artifact mtime): a fresh build rewrites the directory and gets a
    * new mtime, so stale verdicts are unreachable — entries are
    * (re)build-bounded, never invalidated in place. */
  private val g0ProbeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), Boolean]

  /** Counts ACTUAL parquet probe reads behind [[statsMerge]]'s gen-0
    * reuse check — the spec gate proving a repeat call's probe is pure
    * driver state (the Ivf.trainInvocations counter pattern). */
  private[graft] val g0ProbeReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One GENERATION's p16 profile artifacts (scalar stats + exact distinct
    * domain), one scan of that generation's rows only — the nightly job's
    * unit of work; `src` provenance rides every row so the standing-gen
    * reuse key is the artifact's own content. */
  private[graft] def writeGenProfileArtifacts(spark: SparkSession, dir: String,
                                              g: Int): Unit = {
    // unpivot ONCE (r18): the scalar stats and the distinct domain both
    // consume the same generation unpivot, and nothing dedups the shared
    // subtree across two separate write actions — uncheckpointed, the
    // corpus-half unpivot ran twice per generation. The two artifact
    // writes are then independent reads of the checkpoint → concurrent
    // (guide §2.6). Both aggregates are exact integers over q4 longs, so
    // the materialization order can't move a value.
    val u = statsUnpivot(Tables.lineitem(spark, dir)
      .filter(pmod(col("l_orderkey"), lit(2)) === g)).localCheckpoint()
    graft.Par.run(Seq(
      () => u.groupBy(col("cname"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("vq4"))).as("n_nulls"),
          min(col("vq4")).as("min_q4"), max(col("vq4")).as("max_q4"))
        .withColumn("src", lit(dir))
        .write.mode("overwrite").parquet(tablePath(spark, s"graft_stats_scalar_g$g")),
      () => u.select(col("cname"), col("vq4")).distinct()
        .withColumn("src", lit(dir))
        .write.mode("overwrite").parquet(tablePath(spark, s"graft_stats_domain_g$g"))))
  }

  /** ARTIFACTS-ONLY p16 merge: scalar stats sum/min/max-merge, NDV from
    * the union-distinct of the persisted domains — the subtree's only
    * file scans are the generation artifacts (spec-asserted), and the
    * merge shuffle is domain-sized, not corpus-sized. */
  private[graft] def mergeProfileArtifacts(spark: SparkSession): DataFrame = {
    val scalar = spark.read.parquet(tablePath(spark, "graft_stats_scalar_g0"))
      .unionByName(spark.read.parquet(tablePath(spark, "graft_stats_scalar_g1")))
      .groupBy(col("cname"))
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_nulls")).as("n_nulls"),
        min(col("min_q4")).as("min_q4"), max(col("max_q4")).as("max_q4"))
    val ndv = spark.read.parquet(tablePath(spark, "graft_stats_domain_g0"))
      .unionByName(spark.read.parquet(tablePath(spark, "graft_stats_domain_g1")))
      .groupBy(col("cname"))
      .agg(countDistinct(col("vq4")).as("n_distinct"))
    scalar.join(ndv, Seq("cname"))
      .select(col("cname"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_q4"), col("max_q4"))
      .orderBy("cname")
  }

  /** Incremental ≡ from-scratch: the oracle IS p15's. */
  def statsMergeOracle(): String = tableStatsOracle()

  /** p18: TTL RETENTION — time-based expiry, the third face of the purge
    * family (p11 deletes by ID, p12/p13 chase derived artifacts, this
    * enforces the RETENTION POLICY every event log lives under: "keep N
    * days"). The 100 TB property is WHERE the cutoff runs: the rewrite
    * reads through [[Tables.eventsAfterMs]], whose predicate is pushed in
    * the column's NATIVE type — row groups whose ts-max precedes the
    * cutoff are never read, so enforcing retention costs what the young
    * data costs, not a full-log scan. Cutoff = the log's midpoint
    * (min+max)/2 ms — derived, so the oracle re-derives it. The retained
    * artifact is WRITTEN and the audit RE-READS the files (p11
    * discipline: rows + order-independent bit_xor checksum prove the
    * disk holds exactly the intended survivors); the expired side is
    * audited from the complement scan — retention deletes by NOT
    * rewriting, there is nothing to read back, and the audit documents
    * what was dropped. Boundary: the ms-cutoff is INCLUSIVE on the
    * expired side at any sub-ms residue (the eventsUpToMs/AfterMs
    * partition contract). */
  def ttlRetention(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    val bounds = Tables.events(spark, dir)
      .agg(expr("min(ts div 1000000)").as("lo"), expr("max(ts div 1000000)").as("hi"))
      .head()
    val cutoffMs = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val path = tablePath(spark, "graft_events_retained")
    Tables.eventsAfterMs(spark, dir, cutoffMs)
      .write.mode("overwrite").parquet(path)
    def audit(df: DataFrame, name: String): DataFrame = df
      .select(Dedup.h60(concat_ws(":", lit("ttl"), col("event_id"),
        col("user_id"))).as("hc"))
      .groupBy(lit(name).as("artifact"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(hc)").as("checksum"))
    audit(Tables.eventsUpToMs(spark, dir, cutoffMs), "expired")
      .unionAll(audit(spark.read.parquet(path), "retained"))
      .orderBy("artifact")
  }

  def ttlRetentionOracle(): String =
    """WITH b AS (SELECT (min(epoch_ms(ts)::BIGINT) + max(epoch_ms(ts)::BIGINT)) // 2 AS cut
      |           FROM events),
      |h AS (SELECT epoch_ns(ts)::BIGINT AS ns,
      |             CAST('0x' || substr(md5('ttl:' || CAST(event_id AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hc
      |      FROM events),
      |ex AS (SELECT 'expired' AS artifact, count(*)::BIGINT AS n_rows,
      |              bit_xor(hc)::BIGINT AS checksum
      |       FROM h, b WHERE ns <= b.cut * 1000000 + 999999),
      |re AS (SELECT 'retained' AS artifact, count(*)::BIGINT AS n_rows,
      |              bit_xor(hc)::BIGINT AS checksum
      |       FROM h, b WHERE ns > b.cut * 1000000 + 999999)
      |SELECT * FROM ex UNION ALL SELECT * FROM re ORDER BY artifact""".stripMargin

  /** p17: MANIFEST DIFF between two corpus GENERATIONS — the export-audit
    * that answers "what did last night's run actually change" at the
    * SHARD level, reading manifests (shard-count-sized) instead of data:
    * c10 diffs at row grain by scanning the log; this is its lakehouse
    * twin for published artifacts, where re-reading two 100 TB exports to
    * compare them is the anti-pattern and two shard-local aggregates + a
    * 16-row join is the job. Generations are deterministic edits of the
    * corpus (range-sharded so changes LOCALIZE — the reason file-level
    * diffs are useful at all): gen1 drops the first shard's id range
    * (that shard reads `added` in gen2), gen2 drops the last shard's
    * (`removed`) and rewrites shard 5's text (`changed`); the other 13
    * shards must read `same`. Both generations are WRITTEN shard-
    * partitioned and manifests computed by RE-READING the files (the f7
    * discipline — the audit chain starts at storage); per shard: row
    * count + the order-independent `bit_xor` content checksum, so `same`
    * is a content claim, not a count claim. The oracle recomputes both
    * manifests from the base table with the same edit predicates. */
  def manifestDiff(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w = docs.agg(expr("(max(doc_id) + 16) div 16").as("w")).head.getLong(0)
    def sharded(df: DataFrame): DataFrame =
      df.withColumn("shard", expr(s"doc_id div $w"))
    val gen1 = sharded(docs.filter(col("doc_id") >= w))
    val gen2 = sharded(docs.filter(col("doc_id") < 15L * w))
      .withColumn("text", when(expr(s"doc_id div $w") === 5L,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    def persist(df: DataFrame, name: String): DataFrame = {
      val p = tablePath(spark, name)
      df.write.mode("overwrite").partitionBy("shard").parquet(p)
      spark.read.parquet(p)
    }
    // partition discovery types the `shard` directory column INT — re-cast
    // to the oracle's BIGINT before it reaches output schema
    def manifest(df: DataFrame, pre: String): DataFrame = df
      .select(col("shard").cast("long").as("shard"),
        Dedup.h60(concat_ws(":", lit("chk"), col("doc_id"), col("text"))).as("hc"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as(s"n_$pre"), expr("bit_xor(hc)").as(s"chk_$pre"))
    val m1 = manifest(persist(gen1, "graft_gen1_corpus"), "g1")
    val m2 = manifest(persist(gen2, "graft_gen2_corpus"), "g2")
    m1.join(m2, Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("n_g1").isNull, "added")
          .when(col("n_g2").isNull, "removed")
          .when(col("chk_g1") === col("chk_g2"), "same")
          .otherwise("changed").as("status"),
        coalesce(col("n_g1"), lit(0L)).as("n_g1"),
        coalesce(col("n_g2"), lit(0L)).as("n_g2"),
        coalesce(col("chk_g1"), lit(0L)).as("chk_g1"),
        coalesce(col("chk_g2"), lit(0L)).as("chk_g2"))
      .orderBy("shard")
  }

  def manifestDiffOracle(): String =
    """WITH b AS (SELECT ((max(doc_id) + 16) // 16)::BIGINT AS w FROM documents),
      |d AS (SELECT doc_id, text, (doc_id // b.w)::BIGINT AS shard FROM documents, b),
      |g1 AS (SELECT shard, count(*)::BIGINT AS n_g1,
      |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT))::BIGINT AS chk_g1
      |       FROM d, b WHERE doc_id >= b.w GROUP BY 1),
      |d2 AS (SELECT doc_id, CASE WHEN shard = 5 THEN text || ' v2' ELSE text END AS text, shard
      |       FROM d, b WHERE doc_id < 15 * b.w),
      |g2 AS (SELECT shard, count(*)::BIGINT AS n_g2,
      |              bit_xor(CAST('0x' || substr(md5('chk:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT))::BIGINT AS chk_g2
      |       FROM d2 GROUP BY 1)
      |SELECT coalesce(g1.shard, g2.shard) AS shard,
      |       CASE WHEN g1.shard IS NULL THEN 'added'
      |            WHEN g2.shard IS NULL THEN 'removed'
      |            WHEN g1.chk_g1 = g2.chk_g2 THEN 'same'
      |            ELSE 'changed' END AS status,
      |       coalesce(n_g1, 0)::BIGINT AS n_g1, coalesce(n_g2, 0)::BIGINT AS n_g2,
      |       coalesce(chk_g1, 0)::BIGINT AS chk_g1, coalesce(chk_g2, 0)::BIGINT AS chk_g2
      |FROM g1 FULL OUTER JOIN g2 ON g1.shard = g2.shard
      |ORDER BY shard""".stripMargin

  /** p19: TIME-TRAVEL READ over COPY-ON-WRITE generations — the
    * snapshot-isolation mechanism (Iceberg/Delta's) p17's diff audits
    * from the outside: a new generation REWRITES ONLY ITS CHANGED SHARDS
    * under the same parent (`gen=G/shard=N/`) and publishes a SNAPSHOT
    * MANIFEST (shard → source generation, shard-count-sized) mapping
    * every shard of the logical snapshot to the physical generation that
    * last wrote it; a reader pins a snapshot by resolving its manifest
    * to static (gen, shard-set) predicates — partition-pruned at
    * file-listing time, no data copied, both snapshots live. At 100 TB
    * this is the difference between last night's run rewriting one
    * changed shard (1/16 of the corpus here) and re-exporting
    * everything — while yesterday's readers keep a consistent corpus.
    * Generations are p17's deterministic edits (shard 5's text
    * rewritten, shard 15 dropped); the gated output reads BOTH snapshots
    * through their manifests and emits per-snapshot shard/row counts +
    * the order-independent content checksum, which the oracle recomputes
    * from the base table under the same edit predicates — so the gate
    * proves the manifest-resolved physical layout reconstructs each
    * logical snapshot bit-for-bit. Spec additionally proves the gen-2
    * write touched ONLY the one changed shard and the pinned read
    * partition-prunes. */
  def timeTravelRead(spark: SparkSession, dir: String): DataFrame = {
    Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w = docs.agg(expr("(max(doc_id) + 16) div 16").as("w")).head.getLong(0)
    val sharded = docs.withColumn("shard", expr(s"doc_id div $w"))
    val parent = tablePath(spark, "graft_cow_corpus")
    dropIndexTable(spark, "graft_cow_corpus")
    // gen 1: the full corpus; gen 2: ONLY the rewritten shard's files
    Sinks.writePartitioned(sharded, s"$parent/gen=1", "shard")
    Sinks.writePartitioned(
      sharded.filter(col("shard") === 5L)
        .withColumn("text", concat(col("text"), lit(" v2"))),
      s"$parent/gen=2", "shard")
    // snapshot manifests: shard → source generation (shard-count-sized).
    // The shard domain is DERIVED from the data (occupancy depends on max
    // doc_id — (max+16) div 16 leaves top shards empty at some corpus
    // sizes), so the manifest never lists a directory that was not written
    import spark.implicits._
    val shards = sharded.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq // bounded: ≤16 shard ids
    val gen2Rewritten = shards.filter(_ == 5L).map(s => (2L, s, 2L))
    val manifest =
      (shards.map(s => (1L, s, 1L)) ++
        shards.filterNot(s => s == 5L || s == 15L).map(s => (2L, s, 1L)) ++
        gen2Rewritten)
        .toDF("snap_gen", "shard", "src_gen")
    val manPath = tablePath(spark, "graft_cow_manifest")
    manifest.coalesce(1).write.mode("overwrite").parquet(manPath)
    // pinned reads: manifest rows → static (gen, shard-set) predicates
    def asOf(g: Long): DataFrame = {
      val rows = spark.read.parquet(manPath).filter(col("snap_gen") === g)
        .select(col("src_gen"), col("shard")).collect() // bounded: shard count
      rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (sg, rs) =>
        spark.read.parquet(parent)
          .filter(col("gen") === sg &&
            col("shard").isin(rs.map(_.getLong(1)).toIndexedSeq: _*))
      }.reduce(_ unionByName _)
    }
    Seq(1L, 2L).map { g =>
      asOf(g).select(lit(g).as("gen"), col("shard"), col("doc_id"),
          Dedup.h60(concat_ws(":", lit("chk"), col("doc_id"), col("text"))).as("hc"))
        .groupBy(col("gen"))
        .agg(countDistinct(col("shard")).as("n_shards"),
          count(lit(1)).as("n_docs"), expr("bit_xor(hc)").as("chk"))
    }.reduce(_ unionByName _).orderBy("gen")
  }

  def timeTravelReadOracle(): String =
    """WITH b AS (SELECT ((max(doc_id) + 16) // 16)::BIGINT AS w FROM documents),
      |d AS (SELECT doc_id, text, (doc_id // b.w)::BIGINT AS shard FROM documents, b),
      |g1 AS (SELECT 1::BIGINT AS gen, shard, doc_id, text FROM d),
      |g2 AS (SELECT 2::BIGINT AS gen, shard, doc_id,
      |              CASE WHEN shard = 5 THEN text || ' v2' ELSE text END AS text
      |       FROM d WHERE shard <> 15),
      |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
      |SELECT gen, count(DISTINCT shard)::BIGINT AS n_shards, count(*)::BIGINT AS n_docs,
      |       bit_xor(CAST('0x' || substr(md5('chk:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT))::BIGINT AS chk
      |FROM u GROUP BY gen ORDER BY gen""".stripMargin

  /** p20: BLOOM FILE-SKIPPING — the data-skipping index a lakehouse keeps
    * for NON-partition keys (Iceberg bloom filters, Delta file stats):
    * the corpus shards on doc_id, but a lineage/dedup lookup arrives by
    * CONTENT FINGERPRINT — uncorrelated with the layout, so partition
    * pruning is useless and min/max row-group stats are useless too (a
    * hash fills each shard's full range). Per shard, ONE 1024-bit Bloom
    * bitset over the fingerprints (an 8-long sidecar row, the s25
    * bitset fold reused for storage) is computed IN the shard write's
    * aggregate and persisted beside the data; a probe resolves its
    * fingerprints against the sidecar (shard-count-sized driver read) to
    * a static shard IN-list, and scans only candidate shards. Bloom
    * false positives can only ADD a scanned shard — never change the
    * result — so the gate (probe fingerprints of known docs + one absent
    * fingerprint → located rows) is replayed by the oracle WITHOUT the
    * bloom, from the base table: the sidecar is provably pure pruning.
    * At 100 TB this turns a by-content point lookup from a corpus scan
    * into reading ~FP-rate × shards. Spec: the probe's candidate set is
    * a strict subset of the shards and contains every true home. */
  def bloomSkippingLookup(spark: SparkSession, dir: String,
                          probeIds: Seq[Long] = Seq(7L, 123L, 456L),
                          nBits: Int = 1024, nHash: Int = 4): DataFrame = {
    Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w = docs.agg(expr("(max(doc_id) + 16) div 16").as("w")).head.getLong(0)
    val fp = Dedup.h60(concat_ws(":", lit("skip"), col("text")))
    val sharded = docs
      .withColumn("shard", expr(s"doc_id div $w"))
      .withColumn("fp", fp)
    val path = tablePath(spark, "graft_skip_corpus")
    Sinks.writePartitioned(sharded, path, "shard")
    // sidecar: per shard, OR-fold each fingerprint's nHash bit positions
    // into 16 64-bit words — per-row word columns, then one partial agg
    // (bit_or) → 16 longs per shard (the fold shared with the streaming
    // maintenance path, [[graft.streaming.Streams.bloomSidecarStream]])
    val sidecar = bloomWordRows(
      spark.read.parquet(path).select(col("shard"), col("fp")), nBits, nHash)
    val sidePath = tablePath(spark, "graft_skip_sidecar")
    sidecar.coalesce(1).write.mode("overwrite").parquet(sidePath)

    // probe set: fingerprints of known docs + one absent fingerprint —
    // derived from the base table so the oracle can re-derive it
    val probes = docs.filter(col("doc_id").isin(probeIds: _*))
      .select(col("doc_id").as("probe_id"), fp.as("pfp"))
      .unionByName(spark.range(1).select(lit(-1L).as("probe_id"),
        Dedup.h60(lit("skip:absent-probe")).as("pfp")))
      .collect().map(r => (r.getLong(0), r.getLong(1))) // ≤4 rows: bounded

    // resolve each probe against the sidecar (shard-count-sized read)
    val side = spark.read.parquet(sidePath).collect()
      .map(r => r.getLong(0) -> (0 until nBits / 64).map(i => r.getLong(i + 1)).toArray)
    val candShards = probes.flatMap { case (_, pfp) =>
      side.collect { case (s, ws) if bloomMightContain(ws, pfp, nBits, nHash) => s }
    }.distinct.sorted.toIndexedSeq

    val probeDf = spark.createDataFrame(probes.toSeq).toDF("probe_id", "pfp")
    val found = spark.read.parquet(path)
      .filter(col("shard").isin(candShards: _*)) // the skipped scan
      .select(col("doc_id"), col("shard").cast("long").as("shard"), col("fp"))
      .join(broadcast(probeDf), col("fp") === col("pfp"))
      .select(col("probe_id"), col("doc_id"), col("shard"))
    // absent probes must surface as an explicit miss row, not silence
    probeDf.select(col("probe_id")).join(found, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
        coalesce(col("shard"), lit(-1L)).as("shard"))
      .orderBy("probe_id", "doc_id")
  }

  /** The per-shard Bloom word fold shared by p20's batch sidecar build
    * and s28's streaming maintenance: for each (shard, fp) row, each of
    * the nHash hash positions ORs into its 64-bit word (per-row word
    * columns, map-side), then ONE partial agg (bit_or) yields nBits/64
    * longs per shard PRESENT IN `df`. bit_or is commutative, associative
    * and idempotent, so folds over any partitioning / batching / replay
    * of the same rows are bit-identical — the algebra the streaming path
    * leans on. */
  private[graft] def bloomWordRows(df: DataFrame, nBits: Int = 1024,
                                   nHash: Int = 4): DataFrame = {
    def posSql(j: Int): String =
      s"pmod(CAST(conv(substring(md5(concat_ws(':', 'skipb$j', CAST(fp AS STRING))), 1, 15), 16, 10) AS BIGINT), $nBits)"
    val rowWords = (0 until nBits / 64).foldLeft(
      df.select(col("shard").cast("long").as("shard"), col("fp"))) {
      case (d, wd) =>
        val bits = (0 until nHash).map { j =>
          s"(CASE WHEN ${posSql(j)} div 64 = $wd " +
            s"THEN shiftleft(CAST(1 AS BIGINT), CAST(${posSql(j)} % 64 AS INT)) " +
            "ELSE CAST(0 AS BIGINT) END)"
        }.mkString(" | ")
        d.withColumn(s"w$wd", expr(bits))
    }
    rowWords.groupBy(col("shard"))
      .agg(expr("bit_or(w0)").as("w0"),
        (1 until nBits / 64).map(i => expr(s"bit_or(w$i)").as(s"w$i")): _*)
  }

  /** The sidecar membership test — JVM twin of the write-side bit fold
    * (shared with PersistSpec's pruning audit). */
  private[graft] def bloomMightContain(words: Array[Long], pfp: Long,
                                       nBits: Int = 1024, nHash: Int = 4): Boolean =
    (0 until nHash).forall { j =>
      val pos = (graft.streaming.Streams.h60jvm(s"skipb$j:$pfp") % nBits).toInt
      (words(pos / 64) & (1L << (pos % 64))) != 0L
    }

  def bloomSkippingLookupOracle(probeIds: Seq[Long] = Seq(7L, 123L, 456L)): String = {
    val ids = probeIds.mkString(", ")
    s"""WITH b AS (SELECT ((max(doc_id) + 16) // 16)::BIGINT AS w FROM documents),
       |d AS (SELECT doc_id, (doc_id // b.w)::BIGINT AS shard,
       |             CAST('0x' || substr(md5('skip:' || text), 1, 15) AS BIGINT) AS fp
       |      FROM documents, b),
       |probes AS (SELECT doc_id AS probe_id, fp AS pfp FROM d WHERE doc_id IN ($ids)
       |           UNION ALL
       |           SELECT -1, CAST('0x' || substr(md5('skip:absent-probe'), 1, 15) AS BIGINT)),
       |f AS (SELECT p.probe_id, d.doc_id, d.shard
       |      FROM probes p JOIN d ON d.fp = p.pfp)
       |SELECT p.probe_id,
       |       coalesce(f.doc_id, -1)::BIGINT AS doc_id,
       |       coalesce(f.shard, -1)::BIGINT AS shard
       |FROM probes p LEFT JOIN f ON p.probe_id = f.probe_id
       |ORDER BY p.probe_id, doc_id""".stripMargin
  }

  def minhashPersistPairs(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    Graft.init(spark)
    val sig = Dedup.minhash(spark, dir)
    val bandCols = (0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
      val parts = (0 until Dedup.BandSize).map(i => col(s"m${b * Dedup.BandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(":", parts: _*)).as("band_key"))
    }
    val built = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx"), col("bd.band_key"))

    // bucketed on BOTH join keys — the self-join's required clustering is
    // exactly the bucket spec, so the probe is Exchange-free
    val bands = materializeBucketed(spark, built, "graft_idx_minhash_bands", 8,
      Seq("band_key", "band_idx"))

    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()

    // both rerank sides read the session's memoized shingle table (the d3
    // pattern — the two joins shuffle on different keys, so nothing
    // dedupes the subtree otherwise)
    val shingles = Dedup.corpusShingles(spark, dir)._1

    pairs
      .join(shingles.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(shingles.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def minhashPersistPairsOracle(tau: Double = 0.5): String = Dedup.minhashLshOracle(tau)

  /** d8: incremental dedup — screen an arriving delta against the
    * PERSISTED base-corpus band index, the nightly-ingest shape. The base
    * signatures live in a bucketed table maintained by the last full run
    * (built here so the query is self-contained; in production it is p2's
    * standing artifact). At query time only the DELTA is tokenized,
    * signatured and banded — O(|delta|) compute — and its bands broadcast
    * against the base table, so candidate generation reads the bucketed
    * band table with zero shuffle of the base corpus. Exact Jaccard
    * reranks candidates only. A 100 TB corpus with a 0.1% daily delta
    * pays 0.1% of the full d3 cost per day instead of re-deduping the
    * world; delta-internal duplicates are the batch d3 shape over the
    * delta alone (not repeated here).
    *
    * Deltas are modeled as `doc_id % mod == 0` (the driver's corpus has
    * no arrival date); result ≡ d3's pair set restricted to base×delta
    * pairs (spec-asserted), since banding is symmetric. */
  def incrementalDedupPairs(spark: SparkSession, dir: String,
                            tau: Double = 0.5, mod: Int = 10): DataFrame = {
    Graft.init(spark)
    val (shingles, sh) = Dedup.corpusShingles(spark, dir)
    val isDelta = (col("doc_id") % mod) === 0

    val aggs = Dedup.coeffs().zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % Dedup.P).as(s"m$j")
    }
    val bandCols = (0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
      val parts = (0 until Dedup.BandSize).map(i => col(s"m${b * Dedup.BandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(":", parts: _*)).as("band_key"))
    }
    def bandsOf(side: DataFrame): DataFrame =
      side.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
        .select(col("doc_id"), col("bd.band_idx"), col("bd.band_key"))

    // the standing artifact: base-corpus bands, bucketed on the join keys
    val baseBands = materializeBucketed(spark, bandsOf(sh.filter(!isDelta)),
      "graft_idx_inc_bands", 8, Seq("band_key", "band_idx"))
    // today's delta: computed in-flight, broadcast (delta ≪ corpus)
    val deltaBands = bandsOf(sh.filter(isDelta))

    val pairs = baseBands.as("a")
      .join(broadcast(deltaBands.as("b")),
        col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx"))
      .select(col("b.doc_id").as("new_doc"), col("a.doc_id").as("base_doc")).distinct()

    pairs
      .join(shingles.select(col("doc_id").as("new_doc"), col("sh").as("sa")), Seq("new_doc"))
      .join(shingles.select(col("doc_id").as("base_doc"), col("sh").as("sb")), Seq("base_doc"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("new_doc"), col("base_doc"), col("jaccard"))
      .orderBy("new_doc", "base_doc")
  }

  def incrementalDedupPairsOracle(tau: Double = 0.5, mod: Int = 10): String = {
    val bandArms = (0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
      val parts = (0 until Dedup.BandSize).map(i => s"m${b * Dedup.BandSize + i}").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws(':', $parts)) AS band_key FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${Dedup.shingleSqlCte},
       |sig AS (${Dedup.minhashSqlSelect}),
       |bands AS ($bandArms),
       |pairs AS (SELECT DISTINCT b.doc_id AS new_doc, a.doc_id AS base_doc
       |          FROM bands a JOIN bands b
       |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |           AND a.doc_id % $mod <> 0 AND b.doc_id % $mod = 0),
       |shl AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                      for i in generate_series(1, len(w) - 2)]) AS sh FROM w),
       |j AS (SELECT p.new_doc, p.base_doc,
       |             len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |             len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE AS jaccard
       |      FROM pairs p JOIN shl sa ON p.new_doc = sa.doc_id JOIN shl sb ON p.base_doc = sb.doc_id)
       |SELECT new_doc, base_doc, jaccard FROM j WHERE jaccard >= $tau ORDER BY new_doc, base_doc""".stripMargin
  }

  /** p3: IVF persistence round-trip — materialize the cluster assignments
    * as a hive-partitioned table on `cluster_id` (the inverted lists become
    * directories), reload, probe-and-rerank against the reloaded lists.
    * Probing `Probes` clusters per query is PARTITION PRUNING on read — at
    * 100 TB a search touches probed directories only, never the full scan
    * (reference: tests-mongo/test_persistence.py:182 IVF restart;
    * app/core/vector_db.py:272-292 rebuild-on-startup). */
  def ivfPersistSearch(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))

    // build: one map-only assignment pass, written as partitioned lists
    // (embedding travels with the row — the reloaded index is self-contained,
    // like the reference's persisted chunk store)
    val path = tablePath(spark, "graft_idx_ivf_lists")
    val built = Ivf.assignToMat(emb, mat).select(col("vec_id"), col("embedding"), col("cluster_id"))
    Sinks.writePartitioned(built, path, "cluster_id")

    val lists = spark.read.parquet(path)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    val probes = Ivf.probesFor(queries, mat, spark)

    val scored = lists.join(broadcast(probes), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  def ivfPersistSearchOracle(k: Int = 10, nQueries: Int = 8): String =
    Ivf.searchOracle(k, nQueries)

  /** v16b: metadata-filtered IVF search over the PERSISTED partitioned
    * lists — the composition the reference declares on every index's search
    * signature (`metadata_filters`, app/core/indexes/ivf.py:91) but the
    * flat-only v16 couldn't show at scale: ONE scan that is pruned on BOTH
    * axes. The probed cluster ids (a driver-side Q×Probes set) become a
    * static `cluster_id IN (...)` → PARTITION pruning at file-listing time;
    * the metadata filter (`label IN (...)`) pushes into the parquet reader
    * → row-group pruning inside the surviving partitions. At 100 TB a
    * filtered probe reads probed-directories ∩ label-matching-row-groups,
    * never the corpus. Queries are NOT label-filtered (v16 semantics: the
    * filter restricts candidates). */
  def filteredIvfSearch(spark: SparkSession, dir: String, labels: Seq[Int] = Seq(2, 5),
                        k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"), col("label"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))

    // build: map-only assignment with `label` carried into the lists —
    // the persisted index is metadata-complete, like the reference's chunk
    // store (filters never need a join back to the corpus)
    val path = tablePath(spark, "graft_idx_ivf_lists_labeled")
    val built = Ivf.assignToMat(emb, mat, keep = Seq("label"))
      .select(col("vec_id"), col("embedding"), col("label"), col("cluster_id"))
    Sinks.writePartitioned(built, path, "cluster_id")
    val lists = spark.read.parquet(path)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // probe pairs land on the driver (Q×Probes rows) so the cluster set is
    // a STATIC IN-filter — partition pruning at planning time, not runtime
    val probePairs = Ivf.probesFor(queries, mat, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    val scored = lists
      .filter(col("cluster_id").isin(probedClusters: _*))
      .filter(col("label").isin(labels: _*))
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  def filteredIvfSearchOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10, nQueries: Int = 8): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < ${Ivf.K}),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= ${Ivf.Probes}),
       |assign_s AS (SELECT e.vec_id, e.label, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |             FROM embeddings e CROSS JOIN c),
       |assigned AS (SELECT vec_id, label, cid AS cluster_id FROM (
       |  SELECT vec_id, label, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid
       |         WHERE a.label IN (${labels.mkString(", ")})),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v16d: FREE-FORM metadata filters — the reference's `Chunk.metadata` is
    * an arbitrary string dict (app/core/models.py:48) and every index search
    * signature takes `metadata_filters` over arbitrary keys (ivf.py:91,
    * lsh_simhash.py:104-105); v16/v16b/v16c only ever filtered one TYPED
    * `label` column. Here the persisted chunk store carries BOTH kinds of
    * key and the search filters on both:
    *
    *   - a PROMOTED hot key (`lang`, stored as its own typed column): the
    *     equality pushes into the parquet reader (visible as PushedFilters)
    *     → row-group stats pruning — the 100 TB story for keys that are
    *     filtered often;
    *   - an arbitrary COLD key (`metadata['source']`): parquet can NOT push
    *     a map-value predicate, so it runs as a post-scan filter — correct
    *     for ANY key a user invents, cheap only because the pushed filter
    *     already cut the scan.
    *
    * The split (lang pushed, map lookup not) is asserted in PersistSpec.
    * "Promote what's hot, map for the rest" is how a production chunk store
    * squares schema-on-write scan speed with schema-less metadata. */
  /** HOT-KEY PROMOTION: pick which free-form metadata keys deserve their
    * own typed (pushdown-able) column, from (a) an observed FILTER WORKLOAD
    * — the metadata keys recent searches filtered on, most-filtered first —
    * and (b) a bounded data sample asserting the key is actually present in
    * ≥ `minPresence` of rows (a typed column of mostly-nulls has no
    * row-group stats worth pushing into). Round-5 hand-picked `lang`; this
    * derives the same decision from evidence, and scales to any schema: the
    * sample is `sampleN` rows regardless of corpus size, driver state is
    * one count per distinct sampled key. Ties break on key name so the
    * promotion set is deterministic for a given workload. */
  private[graft] def promoteHotKeys(meta: DataFrame, workload: Seq[String],
                                    mapCol: String = "metadata", sampleN: Int = 1000,
                                    minPresence: Double = 0.9, maxPromoted: Int = 2): Seq[String] = {
    val freq = workload.groupBy(identity).map { case (k, ks) => k -> ks.size }
    val sampled = meta.select(col(mapCol)).limit(sampleN).localCheckpoint()
    val n = sampled.count().toDouble
    val presence = sampled.select(explode(map_keys(col(mapCol))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    freq.toSeq
      .filter { case (k, _) => n == 0 || presence.getOrElse(k, 0L) >= minPresence * n }
      .sortBy { case (k, f) => (-f, k) }
      .take(maxPromoted).map(_._1)
  }

  /** Chunk store writer: `promoted` map keys become typed columns (parquet
    * row-group stats → PushedFilters) alongside the intact free-form map. */
  private[graft] def writeChunkStore(spark: SparkSession, base: DataFrame, name: String,
                                     promoted: Seq[String],
                                     partitionCol: Option[String] = None): DataFrame = {
    val cols = col("vec_id") +: col("embedding") +:
      (promoted.map(k => element_at(col("metadata"), lit(k)).as(k)) ++
        (col("metadata") +: partitionCol.map(col).toSeq))
    val path = tablePath(spark, name)
    partitionCol match {
      case Some(p) => Sinks.writePartitioned(base.select(cols: _*), path, p)
      case None => base.select(cols: _*).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Apply (key → value) equality filters: promoted keys hit the typed
    * column (pushed to the reader), anything else the map (post-scan) —
    * correct for ANY key, fast for the promoted ones. */
  private[graft] def metadataFilter(store: DataFrame, promoted: Seq[String],
                                    filters: Seq[(String, String)]): DataFrame =
    filters.foldLeft(store) { case (df, (key, v)) =>
      if (promoted.contains(key)) df.filter(col(key) === v)
      else df.filter(element_at(col("metadata"), lit(key)) === v)
    }

  /** The store-build input shared by v16d (flat) and the spec: vector +
    * free-form metadata map (vec_id ↔ doc_id is the corpus' 1:1
    * chunk↔document alignment). */
  private[graft] def chunkStoreBase(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id"), col("lang"), col("source"), col("n_chars")),
        Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        map(
          lit("lang"), col("lang"),
          lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("metadata"))

  /** The v16d/v16e filter workload: `lang` is filtered by (almost) every
    * search, `source` occasionally — so promotion derives `lang` with the
    * default maxPromoted budget spent on evidence, not a hand-pick. */
  private val ObservedFilterWorkload: Seq[String] = Seq("lang", "lang", "lang", "source")

  def metadataFilteredSearch(spark: SparkSession, dir: String,
                             lang: String = "en", source: String = "src7",
                             k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val base = chunkStoreBase(spark, dir)
    val promoted = promoteHotKeys(base, ObservedFilterWorkload, maxPromoted = 1)
    val store = writeChunkStore(spark, base, "graft_idx_chunkstore", promoted)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val candidates = metadataFilter(store, promoted, Seq("lang" -> lang, "source" -> source))
      .select(col("vec_id"), col("embedding"))
    Knn.topkPerQuery(Knn.scoreAll(candidates, queries, "cosine"), "cosine", k)
  }

  /** Candidate-side scan of the chunk store with both filters, exposed for
    * PersistSpec's pushdown assertion (same filters as the query path). */
  private[graft] def chunkStoreScan(spark: SparkSession, lang: String = "en",
                                    source: String = "src7"): DataFrame =
    metadataFilter(spark.read.parquet(tablePath(spark, "graft_idx_chunkstore")),
      Seq("lang"), Seq("lang" -> lang, "source" -> source))
      .select(col("vec_id"), col("embedding"))

  def metadataFilteredSearchOracle(lang: String = "en", source: String = "src7",
                                   k: Int = 10, nQueries: Int = 8): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |cand AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v
       |         FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |         WHERE d.lang = '$lang' AND d.source = '$source'),
       |s AS (SELECT q.qid, cand.vec_id, list_cosine_similarity(cand.v, q.qvec) AS score
       |      FROM cand CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v14b: the reference's FULL production IVF flow in one query —
    * train_index (v8's Lloyd's, with round-5's deterministic empty-cluster
    * reseed) → persist the inverted lists partitioned by the TRAINED
    * cluster ids (p3's directory layout) → reload → probe-pruned search
    * with the trained centroids (reference: app/api train endpoint →
    * vector_db.py:294 train_index, :272-292 rebuild-on-startup,
    * tests-mongo/test_persistence.py IVF restart). v14 proved trained
    * search in-flight, p3 proved persistence with fixed centroids; this
    * composite proves the trained artifact SURVIVES storage: training is
    * deterministic, so the persisted round-trip must equal the in-flight
    * v14 bit-for-bit (spec-gated; rows-only for the driver — iterative
    * training is not SQL-expressible). At 100 TB: train on a sample
    * (driver state k×d), one map-only assignment pass writes the lists,
    * every later search reads probed directories only. */
  def trainedIvfPersistSearch(spark: SparkSession, dir: String, k: Int = 10,
                              nQueries: Int = 8, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      // trained matrix from the session registry (train once, serve many —
      // the single-JVM analog of the persisted trained index this query
      // then writes; v14 fills it or reuses it identically)
      val mat = Ivf.trainedCentroidsFor(spark, dir, iters)

      val path = tablePath(spark, "graft_idx_ivf_trained")
      val built = Ivf.assignToMat(emb, mat)
        .select(col("vec_id"), col("embedding"), col("cluster_id"))
      Sinks.writePartitioned(built, path, "cluster_id")

      probedListsSearch(spark, emb, path, mat, k, nQueries)
    } finally emb.unpersist()
  }

  /** v44: SHARD-PARALLEL index construction + merged serving — how a
    * 100 TB IVF index is actually built: the centroid matrix trains ONCE
    * (on a sample at scale — v8b's lever; the session registry here, so
    * v14/v14b/v44 share one training run), then each corpus shard builds
    * ITS OWN cluster-partitioned list artifact as an independent job —
    * per-vector assignment needs no cross-shard coordination, a failed
    * shard retries alone, and a corpus delta rebuilds one shard artifact
    * instead of the index (p7's tombstone story composes per shard).
    * The shard artifacts live under ONE parent root with `shard` as a
    * leading partition column — `graft_idx_ivf_sharded/shard=N/
    * cluster_id=M/` — so serving is a single scan of the parent with
    * uniform partition depth: a probe's cluster_id predicate prunes
    * directories within every shard independently, and `shard` is a
    * free queryable column (per-shard audits, targeted rebuild reads)
    * rather than a path convention. Result ≡ the monolithic build BY
    * CONSTRUCTION
    * (assignment commutes with sharding), and that equivalence IS the
    * gate: the oracle is v14b's monolithic trained-search replay,
    * unchanged. Spec additionally proves the shard artifacts partition
    * the corpus and the merged scan prunes to the probed clusters. */
  def shardedBuildSearch(spark: SparkSession, dir: String, k: Int = 10,
                         nQueries: Int = 8, iters: Int = 5,
                         nShards: Int = 2): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).cache()
    try {
      val mat = Ivf.trainedCentroidsFor(spark, dir, iters)
      val parent = tablePath(spark, "graft_idx_ivf_sharded")
      dropIndexTable(spark, "graft_idx_ivf_sharded") // clear stale shard dirs
      (0 until nShards).foreach { s =>
        Sinks.writePartitioned(
          Ivf.assignToMat(emb.filter(col("vec_id") % nShards === s), mat)
            .select(col("vec_id"), col("embedding"), col("cluster_id")),
          s"$parent/shard=$s", "cluster_id")
      }
      probedListsSearch(spark, emb, parent, mat, k, nQueries)
    } finally emb.unpersist()
  }

  /** Probe-pruned serving tail over hive-partitioned trained lists at
    * `path`: the collected Q×Probes pairs prune the scan to the probed
    * cluster DIRECTORIES, broadcast-join back to their queries, exact
    * cosine rerank. Shared by v14b and the streaming IVF ingest path
    * ([[graft.streaming.Streams.ivfIngestStream]]'s lists serve through
    * this identical plan) — however the lists were produced (one batch
    * build, continuous micro-batch appends, or v44's per-shard parallel
    * jobs under a `shard=N` partition level), reads only ever touch
    * probed directories. */
  private[graft] def probedListsSearch(spark: SparkSession, emb: DataFrame, path: String,
                                       mat: Array[(Long, Array[Double])],
                                       k: Int = 10, nQueries: Int = 8): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probePairs = Ivf.probesFor(queries, mat, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    val scored = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probedClusters: _*)) // partition pruning
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  /** v16e: free-form metadata × partitioned IVF — v16d's promoted/cold-key
    * split composed with v16b's partition-pruned probe. The persisted
    * inverted lists carry the promoted `lang` column AND the free-form map,
    * so ONE scan stacks THREE prunings:
    *   1. PartitionFilters: the probed cluster ids (static IN from the
    *      driver-side Q×Probes set) prune list DIRECTORIES at file-listing
    *      time;
    *   2. PushedFilters: the promoted `lang` equality prunes row groups
    *      inside surviving partitions;
    *   3. post-scan: the arbitrary map key (`metadata['source']`) filters
    *      the rows the first two admitted — correct for any key, paying
    *      only for what survived the pushed prunings.
    * At 100 TB a metadata-filtered probe reads
    * probed-dirs ∩ lang-matching-row-groups, then drops non-matching cold
    * keys in the projection — never the corpus. */
  def metadataFilteredIvfSearch(spark: SparkSession, dir: String,
                                lang: String = "en", source: String = "src7",
                                k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val docs = Tables.documents(spark, dir)
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))

    // build: map-only assignment, metadata joined in (1:1 on vec_id=doc_id)
    // — the persisted lists are metadata-complete like v16b's; the promoted
    // column set comes from the observed-workload helper, not a hand-pick
    val built = Ivf.assignToMat(emb, mat)
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
      .join(docs.select(col("doc_id").as("vec_id"), col("lang"), col("source"), col("n_chars")),
        Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        map(
          lit("lang"), col("lang"),
          lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("metadata"),
        col("cluster_id"))
    val promoted = promoteHotKeys(built, ObservedFilterWorkload, maxPromoted = 1)
    val lists = writeChunkStore(spark, built, "graft_idx_ivf_lists_meta", promoted,
      partitionCol = Some("cluster_id"))

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probePairs = Ivf.probesFor(queries, mat, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    val scored = metadataFilter(
      lists.filter(col("cluster_id").isin(probedClusters: _*)), // partition pruning
      promoted, Seq("lang" -> lang, "source" -> source)) // pushed + post-scan
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  /** The v51 stats artifact: per-(column, value) frequencies of the
    * documents' categorical filter columns — the ANALYZE-family artifact
    * (p15's profile, p16's incremental merge) the adaptive-serving
    * decision reads INSTEAD of the corpus. ONE unpivot scan + one
    * groupBy at build/refresh time (the maintenance job — at 100 TB
    * refreshed by p16's merge rule: per-generation frequency tables sum);
    * the artifact is value-domain-sized (|langs| + |sources| rows here —
    * a high-cardinality column would cap to a top-K histogram, the
    * standard CBO compromise). Returns the artifact path. */
  private[graft] def writeFilterStatsArtifact(spark: SparkSession, docs: DataFrame,
                                              cols: Seq[String]): String = {
    val arms = cols.map(c => struct(lit(c).as("cname"), col(c).cast("string").as("v")))
    val path = tablePath(spark, "graft_stats_filterfreq")
    docs.select(explode(array(arms: _*)).as("u"))
      .groupBy(col("u.cname").as("cname"), col("u.v").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  /** The v51 decision inputs — total row count + per-filter match counts
    * (m+1 longs) — computed ENTIRELY from the persisted stats artifact:
    * the subtree's only file scan is `graft_stats_filterfreq`
    * (spec-asserted), never the documents table. `n` is the sum of one
    * column's frequency rows (every document contributes exactly one
    * value per column — including a NULL group — so the sum is the
    * exact row count). */
  private[graft] def v51DecisionInputs(spark: SparkSession,
                                       filters: Seq[(String, String)]): DataFrame = {
    val stats = spark.read.parquet(tablePath(spark, "graft_stats_filterfreq"))
    val aggs =
      coalesce(sum(when(col("cname") === filters.head._1, col("cnt"))
        .otherwise(0L)), lit(0L)).as("n") +:
        filters.zipWithIndex.map { case ((c, v), i) =>
          coalesce(sum(when(col("cname") === c && col("v") === v, col("cnt"))
            .otherwise(0L)), lit(0L)).as(s"c$i")
        }
    stats.agg(aggs.head, aggs.tail: _*)
  }

  /** v51: SELECTIVITY-ADAPTIVE filtered search — the pre-filter /
    * post-filter STRATEGY SWITCH every production vector store runs
    * (Milvus/Vespa/pgvector all dispatch on filter selectivity): a
    * highly-selective metadata filter makes brute-force-over-survivors
    * cheaper AND exact (scan the few matching rows, skip the index
    * entirely), while a broad filter keeps the index probe and drops
    * non-matching candidates post-scan. The decision input is the
    * per-filter match counts READ FROM THE PERSISTED STATS ARTIFACT
    * ([[writeFilterStatsArtifact]] — the p15/p16 ANALYZE family; the
    * refresh here doubles as the maintenance job, and the decision
    * subtree provably scans only the artifact, m+1 longs of driver
    * state) combined under independence; the threshold compare is EXACT
    * arbitrary-precision cross-multiplication (`thrDen·Πcᵢ ≤ nᵐ`, i.e.
    * estimated selectivity ≤ 1/thrDen), so no float boundary or Long
    * wrap can flip the branch between engines. Both branches are
    * individually oracle-gated (v51 selective → pre-filter exact, v51b
    * broad → post-filter IVF), and the emitted `strategy` column makes
    * the decision part of the gated contract, not a hidden heuristic. */
  def adaptiveFilteredSearch(spark: SparkSession, dir: String,
                             filters: Seq[(String, String)] =
                               Seq("lang" -> "de", "source" -> "src7"),
                             k: Int = 10, nQueries: Int = 8,
                             thrDen: Long = 50L): DataFrame = {
    Graft.init(spark)
    // maintenance: build/refresh the stats artifact (ONE scan); the
    // decision inside the serve reads the ARTIFACT, never the corpus
    writeFilterStatsArtifact(spark, Tables.documents(spark, dir),
      filters.map(_._1).distinct)
    adaptiveServe(spark, dir, filters, k, nQueries, thrDen)
  }

  /** One GENERATION's frequency artifact — one scan of that generation's
    * rows only (p8's even/odd doc-id split stands in for the date
    * partitions a real pipeline lands), persisted under its own table.
    * This is the nightly job's unit of work: at 100 TB each new
    * generation profiles ITS OWN bytes once, and history is never
    * re-read. Returns the artifact path. */
  private[graft] def writeGenStatsArtifact(spark: SparkSession, dir: String,
                                           cols: Seq[String], g: Int): String = {
    val arms = cols.map(c => struct(lit(c).as("cname"), col(c).cast("string").as("v")))
    val path = tablePath(spark, s"graft_stats_filterfreq_g$g")
    Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(2)) === g)
      .select(explode(array(arms: _*)).as("u"))
      .groupBy(col("u.cname").as("cname"), col("u.v").as("v"))
      .agg(count(lit(1)).as("cnt"))
      // provenance rides every row: a standing artifact is only reusable
      // for the corpus that produced it (a stats table silently carried
      // across datasets is how a CBO serves garbage estimates)
      .withColumn("src", lit(dir))
      .coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  /** ARTIFACTS-ONLY refresh: SUM-merge the generation artifacts into the
    * serving artifact — counts are exactly mergeable, so merged ≡
    * from-scratch bit-for-bit (spec-asserted), and the merge subtree's
    * only file scans are the generation artifacts, never the corpus
    * (spec-asserted on the executed plan). Value-domain-sized end to
    * end. Returns the merge frame for the plan assertion. */
  private[graft] def mergeStatsArtifacts(spark: SparkSession,
                                         genPaths: Seq[String]): DataFrame = {
    val merged = genPaths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .groupBy(col("cname"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    merged.coalesce(1).write.mode("overwrite")
      .parquet(tablePath(spark, "graft_stats_filterfreq"))
    merged
  }

  /** v51c: the stats artifact maintained INCREMENTALLY — p16's
    * merge-don't-rescan rule applied to v51's decision input, closing
    * the loop the operator doc promises at 100 TB (a nightly generation
    * lands; re-profiling the whole corpus to refresh a frequency table
    * is the anti-pattern). TRUE incremental shape (r14, the r13
    * verdict's split-build-from-refresh): generation 0's artifact is
    * the STANDING history — built only if its artifact is missing (the
    * nightly job that already ran; v14b's build-once registry rule,
    * here keyed by the artifact's own existence so a wiped warehouse
    * self-heals) — and a call's own work is exactly
    * [[writeGenStatsArtifact]] for the ONE new generation plus
    * [[mergeStatsArtifacts]]'s artifacts-only SUM-merge, then the
    * identical adaptive serve. Oracle = v51's, unchanged: the gate
    * proves incremental maintenance is invisible to the decision. */
  def adaptiveFilteredSearchMerged(spark: SparkSession, dir: String,
                                   filters: Seq[(String, String)] =
                                     Seq("lang" -> "de", "source" -> "src7"),
                                   k: Int = 10, nQueries: Int = 8,
                                   thrDen: Long = 50L): DataFrame = {
    Graft.init(spark)
    val cols = filters.map(_._1).distinct
    // standing history: reuse generation 0's artifact when it exists, was
    // profiled FROM THIS corpus (provenance column — a warehouse shared
    // across datasets must never serve another corpus's counts), and
    // covers the requested columns (a narrower standing profile
    // rebuilds). The artifact's own content is the registry key, so a
    // wiped warehouse, a dataset switch, and a widened workload all
    // self-heal.
    val g0 = tablePath(spark, "graft_stats_filterfreq_g0")
    val g0Path = new Path(g0)
    val fs = g0Path.getFileSystem(spark.sessionState.newHadoopConf())
    val g0Ok = fs.exists(g0Path) && {
      val probe = spark.read.parquet(g0)
      probe.columns.contains("src") && {
        val rows = probe.select(col("cname"), col("src")).distinct()
          .collect() // value-domain-sized
        rows.forall(_.getString(1) == dir) &&
          cols.toSet.subsetOf(rows.map(_.getString(0)).toSet)
      }
    }
    if (!g0Ok) writeGenStatsArtifact(spark, dir, cols, 0)
    // the incremental step: ONE new-generation scan + the merge
    val g1 = writeGenStatsArtifact(spark, dir, cols, 1)
    mergeStatsArtifacts(spark, Seq(g0, g1))
    adaptiveServe(spark, dir, filters, k, nQueries, thrDen)
  }

  /** The v51 serve: artifact-fed decision + the two branch plans. */
  private def adaptiveServe(spark: SparkSession, dir: String,
                            filters: Seq[(String, String)],
                            k: Int, nQueries: Int, thrDen: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val row = v51DecisionInputs(spark, filters).head() // m+1 longs: bounded
    val n = row.getAs[Long]("n")
    // exact arbitrary-precision cross-multiplication: Long would wrap
    // silently past 2^63 (≥3 filters × large corpora) while the oracle's
    // HUGEINT promotes — BigInt keeps the branch bit-identical on any
    // input the oracle's 128-bit arithmetic can represent (and beyond)
    val selective =
      BigInt(thrDen) * filters.indices.map(i => BigInt(row.getAs[Long](s"c$i"))).product <=
        BigInt(n).pow(filters.length)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val matchIds = filters.foldLeft(docs) { case (d, (c, v)) => d.filter(col(c) === v) }
      .select(col("doc_id").as("vec_id"))
    val hits =
      if (selective) {
        // PRE-FILTER EXACT: score only the survivors — no index at all
        Knn.topkPerQuery(
          Knn.scoreAll(emb.join(matchIds, Seq("vec_id")), queries, "cosine"),
          "cosine", k)
      } else {
        // POST-FILTER IVF: probe-pruned candidates, filter after the scan
        val mat = Ivf.collectCentroids(emb.filter(col("vec_id") < Ivf.K)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
        val probePairs = Ivf.probesFor(queries, mat, spark).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")
        val scored = Ivf.assignToMat(emb, mat)
          .select(col("vec_id"), col("embedding"), col("cluster_id"))
          .join(matchIds, Seq("vec_id"))
          .join(broadcast(probeDf), Seq("cluster_id"))
          .join(broadcast(queries), Seq("qid"))
          .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
          .select(col("qid"), col("vec_id"), col("score"))
        Knn.topkPerQuery(scored, "cosine", k)
      }
    hits.withColumn("strategy",
      lit(if (selective) "prefilter_exact" else "postfilter_ivf"))
  }

  def adaptiveFilteredSearchOracle(filters: Seq[(String, String)] =
                                     Seq("lang" -> "de", "source" -> "src7"),
                                   k: Int = 10, nQueries: Int = 8,
                                   thrDen: Long = 50L): String = {
    val m = filters.length
    val cSums = filters.zipWithIndex.map { case ((c, v), i) =>
      s"sum(CASE WHEN $c = '$v' THEN 1 ELSE 0 END) AS c$i"
    }.mkString(", ")
    val prod = filters.indices.map(i => s"c$i").mkString(" * ")
    val nPow = Seq.fill(m)("n").mkString(" * ")
    val wherePred = filters.map { case (c, v) => s"$c = '$v'" }.mkString(" AND ")
    s"""WITH dec AS (SELECT count(*) AS n, $cSums FROM documents),
       |flag AS (SELECT ($thrDen * $prod <= $nPow) AS selective FROM dec),
       |md AS (SELECT doc_id FROM documents WHERE $wherePred),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |pre_s AS (SELECT q.qid, e.vec_id,
       |                 list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |          FROM embeddings e JOIN md ON e.vec_id = md.doc_id CROSS JOIN q
       |          WHERE (SELECT selective FROM flag)),
       |pre_r AS (SELECT qid, vec_id, score,
       |                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |          FROM pre_s),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < ${Ivf.K}),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s
       |            FROM q CROSS JOIN c WHERE NOT (SELECT selective FROM flag)),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= ${Ivf.Probes}),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |             FROM embeddings e CROSS JOIN c WHERE NOT (SELECT selective FROM flag)),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |post_s AS (SELECT p.qid, a.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM assigned a JOIN probes p ON a.cluster_id = p.cid
       |                JOIN md ON a.vec_id = md.doc_id
       |                JOIN embeddings e ON a.vec_id = e.vec_id
       |                JOIN q ON p.qid = q.qid),
       |post_r AS (SELECT qid, vec_id, score,
       |                  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |           FROM post_s),
       |u AS (SELECT * FROM pre_r UNION ALL SELECT * FROM post_r)
       |SELECT qid, rank, vec_id, round(score, 4) AS score,
       |       CASE WHEN (SELECT selective FROM flag)
       |            THEN 'prefilter_exact' ELSE 'postfilter_ivf' END AS strategy
       |FROM u WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  def metadataFilteredIvfSearchOracle(lang: String = "en", source: String = "src7",
                                      k: Int = 10, nQueries: Int = 8): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < ${Ivf.K}),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= ${Ivf.Probes}),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |             FROM embeddings e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a
       |         JOIN probes p ON a.cluster_id = p.cid
       |         JOIN documents d ON a.vec_id = d.doc_id
       |         WHERE d.lang = '$lang' AND d.source = '$source'),
       |scored AS (SELECT cand.qid, cand.vec_id,
       |                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |           FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** p4: incremental index maintenance — the reference's `add_chunk` path
    * (app/core/indexes/lsh_simhash.py:72-80 adds one vector's keys to the
    * live tables; vector_db.py:150-168 add_chunks → index add). The Spark
    * analog: key the NEW vectors only and APPEND them to the persisted
    * bucketed index table — never rebuild the old ones. Searching the
    * appended table must equal a fresh full build bit-for-bit. At 100 TB
    * this is the difference between touching the daily delta and re-keying
    * the whole corpus. */
  def lshIncrementalSearch(spark: SparkSession, dir: String, splitId: Long = 400,
                           k: Int = 10, nQueries: Int = 8,
                           nTables: Int = 4, nBits: Int = 12, seed: Long = 5000): DataFrame = {
    Graft.init(spark)
    val table = "graft_idx_lsh_inc"
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

    // initial build: base corpus only
    val base = Lsh.keyRows(emb.filter(col("vec_id") < splitId), nTables, nBits, seed)
    materializeBucketed(spark, base, table, 8, Seq("key"))

    // incremental add: key ONLY the delta, append with the same bucket spec
    val delta = Lsh.keyRows(emb.filter(col("vec_id") >= splitId), nTables, nBits, seed)
    delta.write
      .mode("append")
      .bucketBy(8, "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)

    val index = spark.table(table)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Lsh.searchIndex(index, emb, queries, nTables, nBits, seed, k)
  }

  /** Oracle = a fresh full build over the whole corpus: the incremental
    * append must be indistinguishable from rebuilding. */
  def lshIncrementalSearchOracle(k: Int = 10, nQueries: Int = 8, nTables: Int = 4,
                                 nBits: Int = 12, seed: Long = 5000): String =
    Lsh.searchOracle(k, nQueries, nTables, nBits, seed)

  /** p5: cluster-label persistence — the duplicate-cluster label table
    * (d7's connected-components output, the artifact every curation
    * pipeline maintains BETWEEN runs) materialized as a catalog table
    * bucketed+sorted by `id`, reloaded, and exercised: the reloaded labels
    * drive d11's keep-best-copy selection, which must equal the
    * fresh-label result bit-for-bit (oracle = d11's). Bucketing by `id`
    * is the serving layout — label lookups and corpus join-backs key on
    * doc_id, so a co-bucketed consumer reads the table with no label-side
    * shuffle (plan-asserted in PersistSpec). At 100 TB the label table is
    * edge-sized (only clustered docs appear) and this is the p1–p4
    * convention applied to the THIRD dedup artifact: shingles (d6's
    * table), band keys (p2), and now labels. */
  def labelsPersistSearch(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    Graft.init(spark)
    val labels = Dedup.clusterLabelsFor(spark, dir, tau)
    val persisted = materializeBucketed(spark, labels, "graft_idx_cc_labels", 8, Seq("id"))
    Dedup.keepBestCopyFrom(spark, dir, persisted)
  }

  /** Oracle = d11's fresh-label selection: persistence must be invisible. */
  def labelsPersistSearchOracle(tau: Double = 0.5): String = Dedup.keepBestCopyOracle(tau)

  /** v14c: the 100 TB trained-IVF flow end to end — SAMPLE-trained
    * centroids (v8b's trainer, the shape production actually runs: the
    * Lloyd's iterations never see the full corpus) → ONE full-corpus
    * map-only assignment pass writing the hive-partitioned lists →
    * probe-pruned serving (v14b's tail). v14b proves the persisted flow
    * with the reference-faithful full trainer; this is the same flow
    * with the trainer you'd use when the corpus is 1000× the sample.
    * Oracle replays the sampled training CTEs + the same probe tail, so
    * the whole composite hash-gates; training runs fresh per call (a
    * build op prices its own training, the v8/d7 convention). */
  def sampledIvfPersistSearch(spark: SparkSession, dir: String, k: Int = 10,
                              nQueries: Int = 8, iters: Int = 5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.sampledCentroids(spark, emb, iters)
    val path = tablePath(spark, "graft_idx_ivf_sampled")
    val built = Ivf.assignToMat(emb, mat)
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
    Sinks.writePartitioned(built, path, "cluster_id")
    probedListsSearch(spark, emb, path, mat, k, nQueries)
  }

  def sampledIvfPersistSearchOracle(k: Int = 10, nQueries: Int = 8, iters: Int = 5): String =
    Ivf.trainedSearchOracle(k, nQueries, iters, sampled = true)

  /** v28: IVF + SQ8 — the remaining cell of the quantizer × index-family
    * matrix (PQ×IVF is v19; flat×SQ8 is v17): inverted lists persisted
    * partitioned by cluster AND storing the int8 codes instead of the
    * float vectors, so a probe reads probed DIRECTORIES of 4×-compressed
    * rows — the two big scan levers (partition pruning × quantized
    * storage) stacked on one artifact, which is exactly FAISS's `IVFx,SQ8`
    * factory string. Assignment runs on the RAW vectors at build (the
    * FAISS convention); search scores the codes directly — cosine is
    * scale-invariant, so per-vector SQ8 codes rank exactly like their
    * dequantized forms (v17's insight) and no scale column is needed.
    * Zero vectors carry no quantizable signal and are dropped at build,
    * like v17. */
  def ivfSq8Search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))

    val path = tablePath(spark, "graft_idx_ivf_sq8")
    val built = Ivf.assignToMat(emb, mat)
      .select(col("vec_id"), Graft.sq8Encode(col("embedding")).as("qcode"), col("cluster_id"))
      .filter(col("qcode").isNotNull)
    Sinks.writePartitioned(built, path, "cluster_id")

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probePairs = Ivf.probesFor(queries, mat, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    val scored = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probedClusters: _*)) // partition pruning
      .select(col("cluster_id"), col("vec_id"),
        expr("transform(qcode, c -> CAST(c AS DOUBLE))").as("embedding"))
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))

    Knn.topkPerQuery(scored, "cosine", k)
  }

  def ivfSq8SearchOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < ${Ivf.K}),
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= ${Ivf.Probes}),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim
       |             FROM e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |m AS (SELECT vec_id, v, list_max([abs(x) for x in v]) AS maxabs FROM e),
       |z AS (SELECT vec_id, [floor(x * (127.0 / maxabs) + 0.5) for x in v] AS qv
       |      FROM m WHERE maxabs > 0),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(z.qv, q.qvec) AS score
       |           FROM cand JOIN z ON cand.vec_id = z.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v36: v35's binary sign-bit index as a PERSISTED artifact — rows are
    * `(vec_id bigint, w0 bigint, w1 bigint)`, 24 bytes of payload per
    * vector and NO float column at all: the candidate stage scans a table
    * ~32× smaller than the raw corpus and its per-pair math is XOR +
    * popcount (the spec asserts the artifact scans' ReadSchema carries
    * only bigints — the float corpus is touched only by the Q·r-row exact
    * rerank). This is the binary cell of the persisted-quantizer matrix
    * (SQ8 = v17's artifact, PQ = v18b, IVF×SQ8 = v28); at 100 TB the
    * candidate pass reads ~3 TB. Query sign-words are recomputed from the
    * raw query vectors (an external workload arrives as floats), not read
    * from the artifact. */
  def binaryPersistSearch(spark: SparkSession, dir: String, k: Int = 10,
                          r: Int = 40, nQueries: Int = 8): DataFrame = {
    graft.Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val path = tablePath(spark, "graft_idx_binary")
    emb.select(col("vec_id"),
        Knn.signWordExpr("embedding", 0).as("w0"),
        Knn.signWordExpr("embedding", 1).as("w1"))
      .write.mode("overwrite").parquet(path)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = queries.select(col("qid"),
      Knn.signWordExpr("qvec", 0).as("qw0"), Knn.signWordExpr("qvec", 1).as("qw1"))
    val approx = spark.read.parquet(path).crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
    Knn.exactRefine(approx, emb, queries, "cosine", r, k)
  }

  /** Same semantics as the transient build — the artifact is a layout, not
    * a result change. */
  def binaryPersistSearchOracle(k: Int = 10, r: Int = 40, nQueries: Int = 8): String =
    Knn.binaryHammingSearchOracle(k, r, nQueries)

  /** v45: v44's SHARD-PARALLEL construction applied to the BINARY family —
    * the two 100 TB levers composed on one artifact: v36's float-free
    * 24-byte sign-word rows (32× candidate-scan compression) × v44's
    * coordination-free per-shard builds (sign-packing is per-row map-only
    * work, so each shard's job is independent; a failed shard retries
    * alone, a corpus delta rebuilds one shard artifact). Shards live
    * under ONE parent root with `shard` as the partition column
    * (`graft_idx_binary_sharded/shard=N/` — the corrected v44 layout),
    * so merged serving is a single uniform-depth scan and `shard` is a
    * free queryable column for per-shard audits/rebuild targeting.
    * Result ≡ the monolithic v36 artifact BY CONSTRUCTION (packing
    * commutes with sharding); oracle = v35's Hamming replay unchanged.
    * Spec: ≡ persisted v36, shards disjoint+complete by the keying rule,
    * merged candidate scan still reads ONLY the three bigints. */
  def shardedBinaryBuildSearch(spark: SparkSession, dir: String, k: Int = 10,
                               r: Int = 40, nQueries: Int = 8,
                               nShards: Int = 2): DataFrame = {
    graft.Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val parent = tablePath(spark, "graft_idx_binary_sharded")
    dropIndexTable(spark, "graft_idx_binary_sharded") // clear stale shard dirs
    (0 until nShards).foreach { s =>
      emb.filter(col("vec_id") % nShards === s)
        .select(col("vec_id"),
          Knn.signWordExpr("embedding", 0).as("w0"),
          Knn.signWordExpr("embedding", 1).as("w1"))
        .write.mode("overwrite").parquet(s"$parent/shard=$s")
    }
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = queries.select(col("qid"),
      Knn.signWordExpr("qvec", 0).as("qw0"), Knn.signWordExpr("qvec", 1).as("qw1"))
    val approx = spark.read.parquet(parent)
      .select(col("vec_id"), col("w0"), col("w1")) // drop the shard column pre-join
      .crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.exactRefine(approx, emb, queries, "cosine", r, k)
  }

  def shardedBinaryBuildSearchOracle(k: Int = 10, r: Int = 40, nQueries: Int = 8): String =
    Knn.binaryHammingSearchOracle(k, r, nQueries)

  /** v38: IVF × BINARY — the two big scan levers stacked on one artifact,
    * like v28 stacks IVF × SQ8: inverted lists partitioned by cluster AND
    * storing only the two sign words, so a probe reads probed DIRECTORIES
    * of float-free 24-byte rows (partition pruning × 32× compression —
    * FAISS's `IVFx` over a binary code, with exact refine). Assignment
    * runs on the raw vectors at build (the FAISS convention); the probed
    * candidate scan is XOR+popcount Hamming, top-`r` per query, then the
    * shared exact-cosine refine join touches the float corpus only for
    * Q·r rows. */
  def ivfBinarySearch(spark: SparkSession, dir: String, k: Int = 10,
                      r: Int = 40, nQueries: Int = 8): DataFrame = {
    graft.Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val mat = Ivf.collectCentroids(
      emb.filter(col("vec_id") < Ivf.K).select(col("vec_id").as("cid"), col("embedding").as("cvec")))
    val path = tablePath(spark, "graft_idx_ivf_binary")
    val built = Ivf.assignToMat(emb, mat)
      .select(col("vec_id"),
        Knn.signWordExpr("embedding", 0).as("w0"),
        Knn.signWordExpr("embedding", 1).as("w1"),
        col("cluster_id"))
    Sinks.writePartitioned(built, path, "cluster_id")

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = queries.select(col("qid"),
      Knn.signWordExpr("qvec", 0).as("qw0"), Knn.signWordExpr("qvec", 1).as("qw1"))
    val probePairs = Ivf.probesFor(queries, mat, spark).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val probedClusters = probePairs.map(_._2).distinct.sorted.toIndexedSeq
    val probeDf = spark.createDataFrame(probePairs.toSeq).toDF("qid", "cluster_id")

    val approx = spark.read.parquet(path)
      .filter(col("cluster_id").isin(probedClusters: _*)) // partition pruning
      .join(broadcast(probeDf), Seq("cluster_id"))
      .join(broadcast(qwords), Seq("qid"))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.exactRefine(approx, emb, queries, "cosine", r, k)
  }

  def ivfBinarySearchOracle(k: Int = 10, r: Int = 40, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < ${Ivf.K}),
       |q AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |probe_s AS (SELECT q.qid, c.cid, list_cosine_similarity(q.qvec, c.cvec) AS s FROM q CROSS JOIN c),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn FROM probe_s)
       |  WHERE rn <= ${Ivf.Probes}),
       |assign_s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cvec) AS sim
       |             FROM e CROSS JOIN c),
       |assigned AS (SELECT vec_id, cid AS cluster_id FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM assign_s)
       |  WHERE rn = 1),
       |b AS (SELECT vec_id,
       |             list_sum([CASE WHEN v[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w0,
       |             list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w1
       |      FROM e),
       |qb AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM b WHERE vec_id < $nQueries),
       |cand AS (SELECT p.qid, a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid),
       |h AS (SELECT cand.qid, cand.vec_id,
       |             bit_count(xor(b.w0, qb.qw0)) + bit_count(xor(b.w1, qb.qw1)) AS ham
       |      FROM cand JOIN b USING (vec_id) JOIN qb USING (qid)),
       |hr AS (SELECT qid, vec_id,
       |              row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS hrank
       |       FROM h),
       |s AS (SELECT hr.qid, hr.vec_id, list_cosine_similarity(e.v, q.qvec) AS score
       |      FROM hr JOIN e USING (vec_id) JOIN q USING (qid) WHERE hr.hrank <= $r),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** p8: SCHEMA EVOLUTION across parquet generations — the lakehouse fact
    * of life every long-lived corpus hits: generation 1 was written with
    * (doc_id, text, lang, source); generation 2 ADDED a `quality` column
    * and DROPPED `source`. The reader merges the generations with
    * `mergeSchema` — missing columns surface as NULL in either direction,
    * no rewrite of old files, no reader branching — and the aggregate
    * handles both (null-source counting for gen2 rows, quality stats over
    * the rows that have it). gen2's quality is a trivial deterministic
    * expression ON PURPOSE: the capability under test is the merged READ
    * semantics, which the oracle replays from the unified table via the
    * generation rule (even/odd doc_id). Quality sums ride as fixed-point
    * cents (the q12/q16 device). */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir)
    val base = tablePath(spark, "graft_corpus_generations")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .write.mode("overwrite").parquet(base + "/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("lang"),
        ((col("doc_id") % 100).cast("double") / 100.0).as("quality"))
      .write.mode("overwrite").parquet(base + "/gen=2")
    spark.read.option("mergeSchema", "true")
      .parquet(base + "/gen=1", base + "/gen=2")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("quality").isNotNull, 1L).otherwise(0L)).as("n_gen2"),
        sum(when(col("quality").isNotNull,
          floor(col("quality") * 100d + 0.5d).cast("long")).otherwise(0L)).as("q_cents"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_null_source"))
      .orderBy("lang")
  }

  val schemaEvolutionOracle: String =
    """SELECT lang, count(*)::BIGINT AS n_docs,
      |       sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_gen2,
      |       sum(CASE WHEN doc_id % 2 = 1
      |                THEN floor((doc_id % 100)::DOUBLE / 100.0 * 100 + 0.5)::BIGINT
      |                ELSE 0 END)::BIGINT AS q_cents,
      |       sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_null_source
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** p9: CO-LOCATED fact-fact join — the two big tables of the schema
    * (lineitem, orders) persisted bucketed on their JOIN key into catalog
    * tables, then joined with NO shuffle on either side: both scans come
    * out of storage already clustered on the key, so the sort-merge join
    * consumes the bucket spec directly (spec-asserted with broadcast
    * disabled: the only exchanges left are the final aggregate's and the
    * output sort's). This is the fact-fact counterpart of p2's
    * self-join colocation and THE layout decision that turns a daily
    * fact×fact reconciliation at 100 TB from two corpus shuffles into
    * zero. The oracle is the plain join — bucketing must be invisible. */
  def colocatedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    // the two bucketed-table builds are independent scans of different
    // tables into different catalog names → built concurrently (guide
    // §2.6, r18); the join below reads the same reloaded tables either way
    val Seq(li, o) = graft.Par.all(Seq(
      () => materializeBucketed(spark,
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
        "graft_fact_lineitem", 8, Seq("l_orderkey")),
      () => materializeBucketed(spark,
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
        "graft_fact_orders", 8, Seq("o_orderkey"))))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val colocatedJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |       round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** The corpus re-laid-out hive-partitioned by `lang` — CORPUS-side data
    * layout (every partitioned artifact so far is index-side). At 100 TB
    * the language directories make every lang-scoped curation job (t8's
    * sampler, t18's rebalancer, per-lang quality sweeps) a file-listing
    * prune instead of a full-corpus scan — the same economics p3 proved
    * for IVF probe lists, applied to the raw documents. Memoized per
    * (session, corpus) with a dir-fingerprinted name like every other
    * standing artifact. */
  private val langLayoutCache =
    new BoundedMemo[(SparkSession, String), DataFrame](4)(_ => ())

  private[operators] def langPartitionedCorpus(spark: SparkSession, dir: String): DataFrame =
    langLayoutCache.getOrElseUpdate((spark, dir)) {
      val path = tablePath(spark, "graft_corpus_by_lang_" +
        java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL))
      Sinks.writePartitioned(Tables.documents(spark, dir), path, "lang")
      spark.read.parquet(path)
    }

  /** p6: lang-pruned corpus stats off the partitioned layout — the filter
    * must land in `PartitionFilters` (directory pruning, spec-asserted),
    * never the row-level filter; results are layout-invariant, so the
    * oracle reads the original documents table. */
  def langLayoutStats(spark: SparkSession, dir: String,
                      langs: Seq[String] = Seq("de", "fr")): DataFrame = {
    graft.Graft.init(spark)
    langPartitionedCorpus(spark, dir)
      .filter(col("lang").isin(langs: _*))
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"), sum(col("n_tok")).as("sum_tok"))
      .orderBy("lang")
  }

  def langLayoutStatsOracle(langs: Seq[String] = Seq("de", "fr")): String = {
    val inList = langs.sorted.map(l => s"'$l'").mkString(", ")
    s"""SELECT lang, count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc,
       |       max(doc_id) AS max_doc,
       |       sum(len(string_split(text, ' ')))::BIGINT AS sum_tok
       |FROM documents WHERE lang IN ($inList) GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** 16-bit → even-position bit spread (the classic mask-shift ladder) —
    * built-in bitwise ops only, so the whole Morton key stays inside
    * WholeStageCodegen. */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (Z-order) interleave of two 16-bit dimensions. */
  private[operators] def morton(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The event log re-laid-out Z-ORDERED on (user_id, hour) — the
    * MULTI-dimensional layout decision hive partitioning (p6) can't make:
    * a directory tree prunes one column; sorting by one column prunes
    * that column and nothing else; range-partitioning by the MORTON
    * interleave gives every file a small rectangle in (user, hour) space,
    * so parquet min/max stats prune file/row-group reads for predicates
    * on EITHER dimension (Delta/Iceberg's OPTIMIZE ZORDER, built from
    * nothing but bitwise ops + repartitionByRange). Memoized per
    * (session, corpus); hours are rebased to the corpus min so both
    * dimensions fit 16 bits. Returns the reloaded frame + the rebase. */
  private val zorderCache =
    new BoundedMemo[(SparkSession, String), (DataFrame, Long)](4)(_ => ())

  private[graft] def zorderedEvents(spark: SparkSession, dir: String): (DataFrame, Long) =
    zorderCache.getOrElseUpdate((spark, dir)) {
      val ev = Tables.events(spark, dir)
        .withColumn("hour", expr("(ts div 1000000) div 3600000"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("hour"))
      // each dimension NORMALIZED to the full 16-bit range before the
      // interleave (4 driver scalars) — raw interleaving hands the wider
      // domain all the high Morton bits and the curve degenerates to a
      // one-column sort (measured: user-pruning fraction 0.88 raw vs
      // ~0.4 normalized); production z-order (Delta OPTIMIZE ZORDER)
      // range-normalizes for exactly this reason
      val b = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("hour")), max(col("hour"))).head()
      val (uLo, uHi, hLo, hHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      val path = tablePath(spark, "graft_events_zorder_" +
        java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL))
      ev.withColumn("hx", col("hour") - lit(hLo))
        .withColumn("u16",
          expr(s"((user_id - $uLo) * 65535) div ${math.max(uHi - uLo, 1L)}"))
        .withColumn("h16",
          expr(s"((hour - $hLo) * 65535) div ${math.max(hHi - hLo, 1L)}"))
        .withColumn("mz", morton(col("u16"), col("h16")))
        .repartitionByRange(16, col("mz"))
        .sortWithinPartitions(col("mz"))
        .drop("mz", "u16", "h16")
        .write.mode("overwrite").parquet(path)
      (spark.read.parquet(path), hLo)
    }

  /** p10: a two-dimensional slice (user range × hour window) served from
    * the Z-ordered layout. Results are layout-invariant (the oracle reads
    * the original log and re-derives the hour rebase itself), so the gate
    * proves the layout changes COST, never answers; the pruning geometry
    * — both dimensions' file-stat rectangles, and the contrast with a
    * one-column-sorted layout that cannot prune the second dimension —
    * is spec-asserted from the actual per-file min/max. */
  def zorderSlice(spark: SparkSession, dir: String,
                  users: (Long, Long) = (3L, 9L),
                  hx: (Long, Long) = (100L, 299L)): DataFrame = {
    graft.Graft.init(spark)
    val (z, _) = zorderedEvents(spark, dir)
    z.filter(col("user_id").between(users._1, users._2) &&
        col("hx").between(hx._1, hx._2))
      .withColumn("vc", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  def zorderSliceOracle(users: (Long, Long) = (3L, 9L),
                        hx: (Long, Long) = (100L, 299L)): String =
    s"""WITH e AS (SELECT event_type, user_id, value,
       |                  floor(epoch_ms(ts) / 3600000)::BIGINT AS hour FROM events),
       |m AS (SELECT min(hour) AS mh FROM e)
       |SELECT event_type, count(*) AS n,
       |       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS sum_cents,
       |       count(DISTINCT user_id) AS n_users
       |FROM e, m
       |WHERE user_id BETWEEN ${users._1} AND ${users._2}
       |  AND hour - mh BETWEEN ${hx._1} AND ${hx._2}
       |GROUP BY event_type ORDER BY event_type""".stripMargin
}
