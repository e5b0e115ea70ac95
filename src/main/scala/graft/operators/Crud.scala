package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's CRUD/service semantics re-expressed as deterministic
  * batch operators (reference: app/core/vector_db.py):
  *
  *  - update_chunk latest-write-wins (vector_db.py:220-236) → changelog
  *    merge via window row_number over (key, time desc)
  *  - delete_document cascade (vector_db.py:171-183)        → anti-join
  *  - get_chunk point lookup (vector_db.py:211)             → pushed-down
  *    IN filter (parquet row-group pruning at scale)
  *  - library stats (operations route)                      → grouped agg
  */
object Crud {

  /** c1: latest event per (user_id, event_type) — upsert semantics over a
    * changelog, ordering by (epoch-ms, event_id) for engine parity. */
  def upsertLatestWins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ms").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("last_event_id"),
        col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }

  val upsertLatestWinsOracle: String =
    """WITH e AS (SELECT user_id, event_type, event_id, value, epoch_ms(ts) AS ms FROM events),
      |r AS (SELECT user_id, event_type, event_id, value,
      |             row_number() OVER (PARTITION BY user_id, event_type
      |                                ORDER BY ms DESC, event_id DESC) AS rn
      |      FROM e)
      |SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** c6: point-in-time snapshot — the state c1 would have produced had the
    * changelog stopped at T (2024-01-16): latest event per (user, type)
    * among events at-or-before the cutoff. The cutoff lands on the RAW ns
    * timestamp column, so it reaches the parquet scan as a pushed
    * predicate — at 100 TB a snapshot reads only row groups whose ts-min
    * precedes T, i.e. time travel costs what the past costs, not the
    * whole log.
    *
    * Boundary semantics: the cutoff is MILLISECOND-INCLUSIVE — an event
    * whose ms equals the cutoff is included regardless of its sub-ms
    * component ([[Tables.eventsUpToMs]] states the bound in the column's
    * native physical type so it stays a PUSHED predicate). The oracle
    * states the same bound at ns precision (`epoch_ns`), so the two sides
    * agree exactly on the boundary instead of one truncating to ms and the
    * other not. */
  def snapshotAsOf(spark: SparkSession, dir: String, cutoffMs: Long = 1705363200000L): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ms").desc, col("event_id").desc)
    Tables.eventsUpToMs(spark, dir, cutoffMs)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("last_event_id"),
        col("value").as("last_value"))
      .orderBy("user_id", "event_type")
  }

  def snapshotAsOfOracle(cutoffMs: Long = 1705363200000L): String =
    s"""WITH e AS (SELECT user_id, event_type, event_id, value, epoch_ms(ts) AS ms
       |           FROM events WHERE epoch_ns(ts) <= ${cutoffMs * 1000000L + 999999L}),
       |r AS (SELECT user_id, event_type, event_id, value,
       |             row_number() OVER (PARTITION BY user_id, event_type
       |                                ORDER BY ms DESC, event_id DESC) AS rn
       |      FROM e)
       |SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
       |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** c10: snapshot DIFF — the CDC between two points in time: which
    * (user, type) keys' latest-wins state was born or changed in
    * (T1, T2], with old/new values side by side. This is what an
    * incremental consumer of c6 snapshots actually wants (ship the
    * delta, not the world), and the batch twin of the streaming CDC
    * upsert's per-batch emissions.
    *
    * Scale shape: ONE scan of events ≤ T2 (the cutoff pushed in the
    * column's native type, [[Tables.eventsUpToMs]] — at 100 TB the scan
    * reads only row groups predating T2), and ONE partial-agg groupBy:
    * both states come from the same pass via a conditional `max(struct)`
    * (the ≤T1 arm inside a `when`), so the diff costs one shuffle of
    * pre-combined per-key rows — no window, no self-join of two
    * snapshots. Ordering inside the struct is (ms, event_id) — exactly
    * c1/c6's latest-wins rule, so a c10 'changed' row is precisely a c6
    * state transition. Unchanged keys (no qualifying event in (T1, T2])
    * drop out. */
  def snapshotDiff(spark: SparkSession, dir: String,
                   t1Ms: Long = 1705363200000L,
                   t2Ms: Long = 1705708800000L): DataFrame = {
    val t1NsIncl = t1Ms * 1000000L + 999999L
    val st = struct(expr("ts div 1000000").as("ms"), col("event_id"), col("value"))
    Tables.eventsUpToMs(spark, dir, t2Ms)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max(st).as("new"),
        max(when(col("ts") <= t1NsIncl, st)).as("old"))
      .filter(col("old").isNull || col("old.event_id") =!= col("new.event_id"))
      .select(col("user_id"), col("event_type"),
        when(col("old").isNull, "added").otherwise("changed").as("change"),
        col("old.event_id").as("old_event_id"),
        col("new.event_id").as("new_event_id"),
        col("old.value").as("old_value"),
        col("new.value").as("new_value"))
      .orderBy("user_id", "event_type")
  }

  def snapshotDiffOracle(t1Ms: Long = 1705363200000L, t2Ms: Long = 1705708800000L): String =
    s"""WITH e AS (SELECT user_id, event_type, event_id, value,
       |                  epoch_ms(ts) AS ms, epoch_ns(ts) AS ns
       |           FROM events WHERE epoch_ns(ts) <= ${t2Ms * 1000000L + 999999L}),
       |n AS (SELECT user_id, event_type, event_id, value FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |                               ORDER BY ms DESC, event_id DESC) AS rn FROM e)
       |  WHERE rn = 1),
       |o AS (SELECT user_id, event_type, event_id, value FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |                               ORDER BY ms DESC, event_id DESC) AS rn
       |  FROM e WHERE ns <= ${t1Ms * 1000000L + 999999L})
       |  WHERE rn = 1)
       |SELECT n.user_id, n.event_type,
       |       CASE WHEN o.user_id IS NULL THEN 'added' ELSE 'changed' END AS change,
       |       o.event_id AS old_event_id, n.event_id AS new_event_id,
       |       o.value AS old_value, n.value AS new_value
       |FROM n LEFT JOIN o ON n.user_id = o.user_id AND n.event_type = o.event_type
       |WHERE o.user_id IS NULL OR o.event_id <> n.event_id
       |ORDER BY n.user_id, n.event_type""".stripMargin

  /** c2: delete documents (lang = 'de') and cascade to their embeddings;
    * report surviving chunks per label. */
  def deleteCascade(spark: SparkSession, dir: String): DataFrame = {
    val deleted = Tables.documents(spark, dir).filter(col("lang") === "de")
      .select(col("doc_id"))
    Tables.embeddings(spark, dir)
      .join(deleted, col("vec_id") === col("doc_id"), "left_anti")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_surviving"), min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
      .orderBy("label")
  }

  val deleteCascadeOracle: String =
    """SELECT label, count(*) AS n_surviving, min(vec_id) AS min_id, max(vec_id) AS max_id
      |FROM embeddings
      |WHERE vec_id NOT IN (SELECT doc_id FROM documents WHERE lang = 'de')
      |GROUP BY label ORDER BY label""".stripMargin

  /** c8: library-level delete cascade — the reference's `delete_library`
    * removes the library AND everything under it, two levels deep
    * (app/core/vector_db.py:171 + the library routes: library → documents
    * → chunks). Library ≡ `source`; chunks ≡ embeddings keyed by
    * vec_id = doc_id. One pass: the deleted library's doc-id set drives a
    * single anti-join on the chunk table (level 2), while level 1 is a
    * pushed scan predicate (`source <> X` prunes row groups — the doc
    * table is never re-joined against itself). Output = post-delete
    * per-library stats, proving both levels cascaded. */
  def libraryDeleteCascade(spark: SparkSession, dir: String, library: String = "src3"): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val deletedDocs = docs.filter(col("source") === library).select(col("doc_id"))
    val survivingChunks = Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(deletedDocs, col("vec_id") === col("doc_id"), "left_anti")
    docs.filter(col("source") =!= library)
      .join(survivingChunks, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        count(col("vec_id")).as("n_chunks"))
      .orderBy("source")
  }

  def libraryDeleteCascadeOracle(library: String = "src3"): String =
    s"""WITH del AS (SELECT doc_id FROM documents WHERE source = '$library'),
       |sc AS (SELECT vec_id FROM embeddings WHERE vec_id NOT IN (SELECT doc_id FROM del))
       |SELECT d.source, count(*) AS n_docs, sum(d.n_chars)::BIGINT AS total_chars,
       |       count(sc.vec_id) AS n_chunks
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.vec_id
       |WHERE d.source <> '$library'
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** c3: point lookup by id — the filter reaches the parquet scan as a
    * pushed predicate (row-group pruning at 100 TB). */
  def pointLookup(spark: SparkSession, dir: String, ids: Seq[Long] = Seq(5L, 42L, 123L, 456L)): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  def pointLookupOracle(ids: Seq[Long] = Seq(5L, 42L, 123L, 456L)): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id IN (${ids.mkString(", ")}) ORDER BY doc_id""".stripMargin

  /** c7: keyset-paginated listing — the reference's list_documents /
    * list_chunks surface (documents.py, chunks.py). The scale-correct page
    * is CURSOR-based (`doc_id > after ORDER BY doc_id LIMIT n`): the
    * predicate pushes to the scan and each page costs one pruned read,
    * where OFFSET pagination re-scans and discards everything before the
    * page — O(page²) total at 100 TB. */
  def listPage(spark: SparkSession, dir: String, after: Long = 200L, pageSize: Int = 25): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") > after)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
      .limit(pageSize)

  def listPageOracle(after: Long = 200L, pageSize: Int = 25): String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id > $after ORDER BY doc_id LIMIT $pageSize""".stripMargin

  /** c4: per-source library stats (doc counts, char totals, chunk counts —
    * the reference's /stats surface over the documents⊃chunks hierarchy). */
  def libraryStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"))
    docs
      .join(emb, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"),
        count(col("vec_id")).as("n_chunks"))
      .orderBy("source")
  }

  /** u1: update_chunk → index update → search (reference:
    * app/core/vector_db.py:220-236 updates a chunk's embedding and pushes it
    * into the live index; the next search sees the new vector). Batch
    * re-expression: a changelog where ids [0, nUpdates) receive replacement
    * embeddings (deterministically, the vectors of ids [100, 100+nUpdates)),
    * merged latest-write-wins by version, then a flat cosine kNN over the
    * MERGED corpus. Search results must reflect the updated vectors. */
  def upsertThenSearch(spark: SparkSession, dir: String, nUpdates: Int = 10,
                       k: Int = 10, nQueries: Int = 4): DataFrame = {
    graft.Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

    val base = emb.withColumn("version", lit(1L))
    val updates = emb
      .filter(col("vec_id") >= 100 && col("vec_id") < lit(100L + nUpdates))
      .select((col("vec_id") - 100).as("vec_id"), col("embedding"), lit(2L).as("version"))

    val w = Window.partitionBy(col("vec_id")).orderBy(col("version").desc)
    val merged = base.unionByName(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"))

    val queries = merged.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = merged.crossJoin(broadcast(queries))
      .withColumn("score", graft.Graft.cosine(col("embedding"), col("qvec")))
      .select(col("qid"), col("vec_id"), col("score"))
    Knn.topkPerQuery(scored, "cosine", k)
  }

  def upsertThenSearchOracle(nUpdates: Int = 10, k: Int = 10, nQueries: Int = 4): String =
    s"""WITH upd AS (SELECT vec_id - 100 AS vec_id, embedding FROM embeddings
       |             WHERE vec_id >= 100 AND vec_id < ${100 + nUpdates}),
       |merged AS (SELECT vec_id, embedding FROM embeddings
       |           WHERE vec_id NOT IN (SELECT vec_id FROM upd)
       |           UNION ALL SELECT vec_id, embedding FROM upd),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM merged WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, m.vec_id, list_cosine_similarity(m.embedding::DOUBLE[], q.qvec) AS score
       |      FROM merged m CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** c9: SCD-type-2 materialization of the changelog — every version of a
    * (user, event_type) key as a validity interval `[valid_from,
    * valid_to)`, NULL valid_to marking the current row. c1 answers "what
    * is the state now", c6 "what was it at T"; this is the table that
    * answers EVERY as-of question with a range predicate — the standard
    * lakehouse dimension-history shape. One window over the
    * high-cardinality (user, event_type) key (lead() carries the
    * successor's timestamp), so the cost is a single keyed shuffle+sort
    * of the changelog and no state beyond the sort. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ms"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("valid_to", lead(col("ms"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"),
        col("ms").as("valid_from"), col("valid_to"))
      .orderBy("event_id")
  }

  val scd2IntervalsOracle: String =
    """WITH e AS (SELECT user_id, event_type, event_id, value, epoch_ms(ts) AS ms FROM events)
      |SELECT user_id, event_type, event_id, value,
      |       ms AS valid_from,
      |       lead(ms) OVER (PARTITION BY user_id, event_type ORDER BY ms, event_id) AS valid_to
      |FROM e ORDER BY event_id""".stripMargin

  /** c11: SCD2 AS-OF dimension lookup — the classic warehouse temporal
    * join c9's table exists to serve: each purchase reads the version of
    * the same user's `view` dimension row that was valid at purchase
    * time (`valid_from ≤ t < valid_to`, open current row = NULL). The
    * dimension is MATERIALIZED bucketed by `user_id` (the serving
    * artifact, not an in-flight window), so the fact join clusters on
    * the bucket spec with zero dimension-side exchange; the containment
    * filter rides the equi-join and per-fact fanout is bounded by the
    * user's version count (versions PARTITION time — disjoint,
    * zero-length intervals from same-ms versions match nothing — so at
    * most one row survives per fact with no argmax needed). Purchases
    * before a user's first view drop out (inner join), identically in
    * both engines. */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val e = Tables.events(spark, dir).withColumn("ms", expr("ts div 1000000"))
    val dimBuilt = e.filter(col("event_type") === "view")
      .withColumn("valid_to", lead(col("ms"), 1).over(w))
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("value").as("view_value"), col("ms").as("valid_from"), col("valid_to"))
    val dim = Persist.materializeBucketed(spark, dimBuilt, "graft_dim_scd2", 8, Seq("user_id"))
    e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ms"))
      .join(dim, Seq("user_id"))
      .filter(col("ms") >= col("valid_from") &&
        (col("valid_to").isNull || col("ms") < col("valid_to")))
      .select(col("purchase_id"), col("user_id"), col("view_event_id"),
        col("view_value"), col("valid_from"))
      .orderBy("purchase_id")
  }

  val scd2LookupOracle: String =
    """WITH e AS (SELECT user_id, event_type, event_id, value, epoch_ms(ts) AS ms FROM events),
      |d AS (SELECT user_id, event_id AS view_event_id, value AS view_value, ms AS valid_from,
      |             lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS valid_to
      |      FROM e WHERE event_type = 'view'),
      |f AS (SELECT event_id AS purchase_id, user_id, ms FROM e WHERE event_type = 'purchase')
      |SELECT f.purchase_id, f.user_id, d.view_event_id, d.view_value, d.valid_from
      |FROM f JOIN d ON f.user_id = d.user_id
      |WHERE f.ms >= d.valid_from AND (d.valid_to IS NULL OR f.ms < d.valid_to)
      |ORDER BY purchase_id""".stripMargin

  val libraryStatsOracle: String =
    """SELECT d.source,
      |       count(*) AS n_docs,
      |       sum(d.n_chars)::BIGINT AS total_chars,
      |       sum(d.n_chars)::DOUBLE / count(*)::DOUBLE AS avg_chars,
      |       count(DISTINCT d.lang) AS n_langs,
      |       count(e.vec_id) AS n_chunks
      |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin
}
