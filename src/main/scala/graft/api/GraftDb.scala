package graft.api

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{Ivf, Knn, Lsh}

/** Programmatic facade mirroring the reference service's `VectorDB`
  * method surface (reference: app/core/vector_db.py:105-327 —
  * create/list/update/delete for libraries, documents and chunks;
  * `search` with `include_chunk`; `train_index`; per-library stats),
  * re-expressed as batch plans over APPEND-ONLY parquet changelogs.
  *
  * State model: where the reference mutates Mongo under an AsyncRWLock,
  * every mutation here appends an immutable row to a changelog and every
  * read derives the current state MERGE-ON-READ — latest-wins per chunk
  * (the c1 `max(struct(seq, …))` partial aggregate), document and library
  * tombstones masking only rows OLDER than the tombstone (so delete → re-
  * add behaves like the reference's sequential calls), cascades as
  * seq-aware joins (c2/c8). Writers never block readers and any past
  * state is reconstructible — the lakehouse answer to the reference's
  * lock discipline.
  *
  * Search dispatches on the library's declared `index_type` exactly like
  * the reference's index factory (app/core/indexing.py): `flat` = exact
  * scan + TopK partial agg; `ivf` = map-only nearest-centroid assignment
  * against the trained matrix ([[trainIndex]], app/core/vector_db.py:294)
  * with probe-and-rerank; `lsh` = SimHash bucket union + exact rerank.
  * All three serve the SAME merge-on-read snapshot, so an upsert is
  * visible to the next search with no rebuild step (u1 semantics).
  *
  * Scale notes: the changelog is the only growing artifact; [[compact]]
  * folds it to the live snapshot (the reference's rebuild-from-storage
  * analog, app/core/vector_db.py:272-292 — here it shrinks the log
  * instead of rebuilding RAM state). Snapshot derivation is one partial
  * agg + two broadcast tombstone joins; per-query work is the operators'
  * plans unchanged. Paths are plain `spark.read/write.parquet`, so `root`
  * can be any Hadoop-compatible URI; only the existence probe below
  * assumes a local path (tests).
  */
object GraftDb {
  /** One chunk-changelog record. `op` ∈ upsert | delete_chunk |
    * delete_doc (doc-level rows carry chunk_id = -1). */
  final case class ChunkOp(seq: Long, op: String, library_id: Long, doc_id: Long,
                           chunk_id: Long, text: String, embedding: Array[Float])

  /** One library-changelog record. `op` ∈ upsert | delete. */
  final case class LibOp(seq: Long, op: String, library_id: Long, name: String,
                         dims: Int, index_type: String)
}

final class GraftDb(spark: SparkSession, val root: String) {
  import GraftDb._
  import spark.implicits._

  Graft.init(spark)

  private val libPath = s"$root/libraries_log"
  private val chunkPath = s"$root/chunks_log"
  private def centroidPath(libId: Long) = s"$root/centroids/lib=$libId"

  /** One monotonic sequence shared by BOTH logs, restored from storage so
    * a new session continues where the last stopped (the reference's
    * rebuild-on-startup, minus the rebuild). */
  private var seq: Long = {
    def maxSeq(path: String): Long =
      if (!Files.exists(Paths.get(path))) -1L
      else spark.read.parquet(path).agg(max(col("seq"))).head().getLong(0)
    math.max(maxSeq(libPath), maxSeq(chunkPath)) + 1
  }
  private def nextSeq(): Long = { val s = seq; seq += 1; s }

  private def appendLib(rows: Seq[LibOp]): Unit =
    rows.toDF().write.mode("append").parquet(libPath)
  private def appendChunks(rows: Seq[ChunkOp]): Unit =
    rows.toDF().write.mode("append").parquet(chunkPath)

  private def libLog: DataFrame = spark.read.parquet(libPath)
  private def chunkLog: DataFrame =
    if (Files.exists(Paths.get(chunkPath))) spark.read.parquet(chunkPath)
    else Seq.empty[ChunkOp].toDF()

  // ---- library CRUD (vector_db.py:105-151) --------------------------------

  def createLibrary(libId: Long, name: String, dims: Int, indexType: String): Unit = {
    require(Seq("flat", "ivf", "lsh").contains(indexType), s"unknown index_type $indexType")
    appendLib(Seq(LibOp(nextSeq(), "upsert", libId, name, dims, indexType)))
  }
  /** update_library ≡ create: latest-wins on the same log. */
  def updateLibrary(libId: Long, name: String, dims: Int, indexType: String): Unit =
    createLibrary(libId, name, dims, indexType)
  def deleteLibrary(libId: Long): Unit =
    appendLib(Seq(LibOp(nextSeq(), "delete", libId, "", 0, "")))

  /** Live libraries: latest op per id, tombstones dropped. */
  def listLibraries(): DataFrame = libLog
    .groupBy(col("library_id"))
    .agg(max(struct(col("seq"), col("op"), col("name"), col("dims"), col("index_type"))).as("s"))
    .select(col("library_id"), col("s.op").as("op"), col("s.name").as("name"),
      col("s.dims").as("dims"), col("s.index_type").as("index_type"))
    .filter(col("op") === "upsert").drop("op")
    .orderBy("library_id")

  // ---- chunk / document CRUD (vector_db.py:153-247) -----------------------

  def upsertChunks(rows: Seq[(Long, Long, Long, String, Array[Float])]): Unit =
    appendChunks(rows.map { case (lib, doc, chunk, text, emb) =>
      ChunkOp(nextSeq(), "upsert", lib, doc, chunk, text, emb)
    })
  def addChunk(libId: Long, docId: Long, chunkId: Long, text: String,
               embedding: Array[Float]): Unit =
    upsertChunks(Seq((libId, docId, chunkId, text, embedding)))
  def updateChunk(libId: Long, docId: Long, chunkId: Long, text: String,
                  embedding: Array[Float]): Unit =
    upsertChunks(Seq((libId, docId, chunkId, text, embedding)))
  def deleteChunk(libId: Long, docId: Long, chunkId: Long): Unit =
    appendChunks(Seq(ChunkOp(nextSeq(), "delete_chunk", libId, docId, chunkId, "", Array.empty)))
  def deleteDocument(libId: Long, docId: Long): Unit =
    appendChunks(Seq(ChunkOp(nextSeq(), "delete_doc", libId, docId, -1L, "", Array.empty)))

  /** The live chunk snapshot, MERGE-ON-READ:
    * 1. latest op per (library, chunk) — one partial agg, survivors must
    *    be upserts (delete_chunk wins by seq and then drops out);
    * 2. a document tombstone masks chunks whose latest upsert is OLDER
    *    than it (delete_doc then re-add ⇒ the re-add survives, matching
    *    the reference's sequential semantics);
    * 3. a library tombstone does the same two levels up (c8 cascade), and
    *    the library must currently exist. */
  def chunks(): DataFrame = {
    val log = chunkLog
    val latest = log.filter(col("op").isin("upsert", "delete_chunk"))
      .groupBy(col("library_id"), col("chunk_id"))
      .agg(max(struct(col("seq"), col("op"), col("doc_id"), col("text"), col("embedding"))).as("s"))
      .select(col("library_id"), col("chunk_id"), col("s.seq").as("seq"),
        col("s.op").as("op"), col("s.doc_id").as("doc_id"),
        col("s.text").as("text"), col("s.embedding").as("embedding"))
      .filter(col("op") === "upsert").drop("op")
    val docTombs = log.filter(col("op") === "delete_doc")
      .groupBy(col("library_id"), col("doc_id")).agg(max(col("seq")).as("doc_tomb"))
    val libTombs = libLog.filter(col("op") === "delete")
      .groupBy(col("library_id")).agg(max(col("seq")).as("lib_tomb"))
    latest
      .join(broadcast(docTombs), Seq("library_id", "doc_id"), "left")
      .filter(col("doc_tomb").isNull || col("seq") > col("doc_tomb"))
      .join(broadcast(libTombs), Seq("library_id"), "left")
      .filter(col("lib_tomb").isNull || col("seq") > col("lib_tomb"))
      .join(broadcast(listLibraries().select(col("library_id"))), Seq("library_id"))
      .select(col("library_id"), col("doc_id"), col("chunk_id"), col("text"), col("embedding"))
  }

  def listChunks(libId: Long): DataFrame =
    chunks().filter(col("library_id") === libId).orderBy("chunk_id")
  def getChunk(libId: Long, chunkId: Long): DataFrame =
    chunks().filter(col("library_id") === libId && col("chunk_id") === chunkId)

  // ---- index training / maintenance (vector_db.py:272-326) ----------------

  /** train_index: k-means over the library's live vectors (the v8 recipe —
    * deterministic init from the K lowest chunk ids, quantized partial
    * sums), centroid matrix persisted as the library's index artifact. */
  def trainIndex(libId: Long, kCentroids: Int = 8, iters: Int = 3): Unit = {
    val emb = listChunks(libId)
      .select(col("chunk_id").as("vec_id"), col("embedding"))
    val init = emb.orderBy("vec_id").limit(kCentroids).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    require(init.length == kCentroids, s"library $libId has < $kCentroids vectors")
    val mat = Ivf.trainCentroids(spark, emb, iters, Some(init))
    mat.toSeq.map { case (cid, v) => (cid, v) }.toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidPath(libId))
  }

  private def trainedMat(libId: Long): Option[Array[(Long, Array[Double])]] =
    if (!Files.exists(Paths.get(centroidPath(libId)))) None
    else Some(spark.read.parquet(centroidPath(libId)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1))

  /** Fold BOTH changelogs to their live snapshots — the maintenance
    * analog of the reference's rebuild-from-storage: search results are
    * identical before and after (spec-proven); only the logs shrink.
    * Tombstones vanish because everything they masked does too — which is
    * also why both logs must fold together (a surviving library tombstone
    * would re-mask compacted chunk rows rebased to seq 0). Fully
    * distributed: snapshot → temp dir → rewrite, no driver collect;
    * single-writer maintenance window, like the reference's startup
    * rebuild. */
  def compact(): Unit = {
    val chunkTmp = s"$root/chunks_log_compacting"
    chunks().select(lit(0L).as("seq"), lit("upsert").as("op"), col("library_id"),
        col("doc_id"), col("chunk_id"), col("text"), col("embedding"))
      .write.mode("overwrite").parquet(chunkTmp)
    val libTmp = s"$root/libraries_log_compacting"
    listLibraries().select(lit(0L).as("seq"), lit("upsert").as("op"), col("library_id"),
        col("name"), col("dims"), col("index_type"))
      .write.mode("overwrite").parquet(libTmp)
    spark.read.parquet(chunkTmp).write.mode("overwrite").parquet(chunkPath)
    spark.read.parquet(libTmp).write.mode("overwrite").parquet(libPath)
  }

  // ---- search (vector_db.py:249-270) --------------------------------------

  /** kNN over one library, routed by its `index_type`; `includeChunk`
    * joins the hit payload back (search_with_payload / include_chunk);
    * `metadataFilter` is the reference's declared `metadata_filters`
    * (models.py:48) as a Column predicate over the snapshot columns —
    * applied BEFORE scoring, so filtered candidates never reach the
    * distance math (the v16 discipline). An `ivf` library that was never
    * trained serves exact flat results — the reference's `_ensure_index`
    * builds on first use; here "untrained" degrades to
    * correct-but-unaccelerated, never to an error. */
  def search(libId: Long, query: Array[Float], k: Int = 10,
             includeChunk: Boolean = false, nProbes: Int = 2,
             nTables: Int = 4, nBits: Int = 10, seed: Long = 1000L,
             metadataFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val lib = listLibraries().filter(col("library_id") === libId).collect()
    require(lib.nonEmpty, s"no such library $libId")
    val indexType = lib.head.getAs[String]("index_type")
    val base = listChunks(libId)
      .select(col("chunk_id").as("vec_id"), col("embedding"), col("doc_id"), col("text"))
    val snap = metadataFilter.fold(base)(base.filter)
    val emb = snap.select(col("vec_id"), col("embedding"))
    val queries = Seq((0L, query)).toDF("qid", "qvec")
    val hits = (indexType, trainedMat(libId)) match {
      case ("lsh", _) =>
        Lsh.searchIndex(Lsh.keyRows(emb, nTables, nBits, seed), emb, queries,
          nTables, nBits, seed, k)
      case ("ivf", Some(mat)) =>
        val centroids = mat.toSeq.map { case (cid, v) => (cid, v.map(_.toFloat)) }
          .toDF("cluster_id", "cvec")
        val probes = Knn.topkPerQuery(
          queries.crossJoin(broadcast(centroids))
            .withColumn("score", Graft.cosine(col("cvec"), col("qvec")))
            .select(col("qid"), col("cluster_id").as("vec_id"), col("score")),
          "cosine", nProbes).select(col("qid"), col("vec_id").as("cluster_id"))
        val assigned = Ivf.assignToMat(emb, mat).select(col("vec_id"), col("cluster_id"))
        val scored = assigned.join(broadcast(probes), Seq("cluster_id"))
          .select(col("qid"), col("vec_id"))
          .join(emb, Seq("vec_id"))
          .join(broadcast(queries), Seq("qid"))
          .withColumn("score", Graft.cosine(col("embedding"), col("qvec")))
          .select(col("qid"), col("vec_id"), col("score"))
        Knn.topkPerQuery(scored, "cosine", k)
      case _ => // flat, or ivf before training
        Knn.topkPerQuery(Knn.scoreAll(emb, queries, "cosine"), "cosine", k)
    }
    if (!includeChunk) hits.select(col("rank"), col("vec_id").as("chunk_id"), col("score"))
    else hits.join(broadcast(snap.select(col("vec_id"), col("doc_id"), col("text"))),
        Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id").as("chunk_id"), col("score"),
        col("doc_id"), col("text"))
      .orderBy("rank")
  }

  // ---- stats (vector_db.py stats surface) ---------------------------------

  def stats(libId: Long): DataFrame =
    listChunks(libId).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_chunks"),
      sum(length(col("text"))).as("n_chars"))
}
