package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftDb
import graft.sources.Tables

/** End-to-end lifecycle of the [[graft.api.GraftDb]] facade — the
  * reference service's e2e test shape (tests-mongo: CRUD + search per
  * index type + persistence/rebuild) driven against the batch facade:
  * every mutation is a changelog append, every read a merge-on-read
  * snapshot, search routed per library index_type. */
class GraftDbSpec extends GraftSuite {

  private def freshDb(): GraftDb =
    new GraftDb(spark, Files.createTempDirectory("graftdb").toString)

  /** Test vectors from the shared corpus (id, text, embedding). */
  private lazy val corpus: Array[(Long, String, Array[Float])] = {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(60).collect()
      .map(r => (r.getLong(0), texts.getOrElse(r.getLong(0), s"chunk ${r.getLong(0)}"),
        r.getSeq[Float](1).toArray))
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val (dot, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) { case ((d, x, y), (u, v)) =>
      (d + u.toDouble * v.toDouble, x + u.toDouble * u.toDouble, y + v.toDouble * v.toDouble)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("library CRUD: create, update latest-wins, delete hides, recreate revives") {
    val db = freshDb()
    db.createLibrary(1L, "alpha", 8, "flat")
    db.createLibrary(2L, "beta", 8, "lsh")
    db.updateLibrary(1L, "alpha2", 8, "flat")
    val libs = db.listLibraries().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(libs === Map(1L -> "alpha2", 2L -> "beta"))
    db.deleteLibrary(2L)
    assert(db.listLibraries().count() === 1)
    db.createLibrary(2L, "beta2", 8, "lsh")
    assert(db.listLibraries().count() === 2)
  }

  test("chunk lifecycle: upsert visible to search, update wins, deletes cascade, re-add survives") {
    val db = freshDb()
    db.createLibrary(1L, "lib", corpus.head._3.length, "flat")
    db.upsertChunks(corpus.take(20).map { case (id, text, emb) => (1L, id / 10, id, text, emb) })
    assert(db.stats(1L).head().getLong(1) === 20L)

    // flat search == driver-side exact kNN over the same snapshot
    val q = corpus(3)._3
    val got = db.search(1L, q, k = 5).collect().map(_.getLong(1))
    val want = corpus.take(20).map { case (id, _, emb) => id -> cosine(emb, q) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got.toSeq === want.toSeq, "flat search diverges from driver kNN")
    assert(got.head === corpus(3)._1, "self-hit must rank first")

    // upsert with a new embedding → next search sees it (u1, no rebuild)
    val moved = corpus(30)._3 // a vector far from q's neighborhood
    db.updateChunk(1L, corpus(3)._1 / 10, corpus(3)._1, "moved", moved)
    val after = db.search(1L, moved, k = 1).collect()
    assert(after.head.getLong(1) === corpus(3)._1, "updated embedding not searchable")

    // chunk delete
    db.deleteChunk(1L, corpus(5)._1 / 10, corpus(5)._1)
    assert(db.getChunk(1L, corpus(5)._1).count() === 0)
    assert(db.stats(1L).head().getLong(1) === 19L)

    // document cascade: doc 0 holds ids 0..9 → minus already-deleted 5
    db.deleteDocument(1L, 0L)
    assert(db.listChunks(1L).filter(col("doc_id") === 0L).count() === 0)
    // re-add after the cascade survives (tombstone masks only older rows)
    db.addChunk(1L, 0L, 7L, corpus(7)._2, corpus(7)._3)
    assert(db.getChunk(1L, 7L).count() === 1)

    // library cascade
    db.deleteLibrary(1L)
    assert(db.chunks().count() === 0)
  }

  test("ivf route: trained search finds the self-hit and compaction preserves results") {
    val db = freshDb()
    db.createLibrary(3L, "ivf-lib", corpus.head._3.length, "ivf")
    db.upsertChunks(corpus.take(40).map { case (id, text, emb) => (3L, id / 10, id, text, emb) })

    // untrained ivf serves exact flat results (reference _ensure_index)
    val q = corpus(11)._3
    val flat = db.search(3L, q, k = 5).collect().map(_.getLong(1))
    assert(flat.head === corpus(11)._1)

    db.trainIndex(3L, kCentroids = 4, iters = 2)
    val trained = db.search(3L, q, k = 5, nProbes = 2).collect().map(_.getLong(1))
    assert(trained.head === corpus(11)._1, "trained ivf must find the self-hit")
    // probes cover at least half the flat top-5 on this tiny corpus
    assert(trained.toSet.intersect(flat.toSet).size >= 3,
      s"ivf recall too low: flat=${flat.toSeq} trained=${trained.toSeq}")

    // delete + update, then compact: results identical, log strictly smaller
    db.deleteChunk(3L, corpus(12)._1 / 10, corpus(12)._1)
    db.updateChunk(3L, corpus(13)._1 / 10, corpus(13)._1, "upd", corpus(13)._3)
    val before = db.search(3L, q, k = 5, includeChunk = true)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val logBefore = spark.read.parquet(s"${db.root}/chunks_log").count()
    db.compact()
    val afterC = db.search(3L, q, k = 5, includeChunk = true)
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val logAfter = spark.read.parquet(s"${db.root}/chunks_log").count()
    assert(afterC.toSeq === before.toSeq, "compaction changed search results")
    assert(logAfter < logBefore, s"compaction did not shrink the log ($logBefore -> $logAfter)")
    assert(logAfter === db.chunks().count(), "compacted log is not exactly the snapshot")
  }

  test("lsh route: bucket search returns the self-hit first with payload") {
    val db = freshDb()
    db.createLibrary(4L, "lsh-lib", corpus.head._3.length, "lsh")
    db.upsertChunks(corpus.take(30).map { case (id, text, emb) => (4L, id / 10, id, text, emb) })
    val q = corpus(21)
    val hits = db.search(4L, q._3, k = 5, includeChunk = true).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getLong(1) === q._1, "lsh self-hit must rank first")
    assert(hits.head.getString(4) === q._2, "include_chunk payload mismatch")
  }

  test("metadata filter prunes candidates before scoring (metadata_filters semantics)") {
    val db = freshDb()
    db.createLibrary(5L, "filt", corpus.head._3.length, "flat")
    db.upsertChunks(corpus.take(20).map { case (id, text, emb) => (5L, id / 10, id, text, emb) })
    val q = corpus(2)._3
    // doc_id is the promoted metadata key here: restrict to document 1
    val hits = db.search(5L, q, k = 20, includeChunk = true,
      metadataFilter = Some(col("doc_id") === 1L)).collect()
    assert(hits.nonEmpty)
    assert(hits.forall(_.getLong(3) === 1L), "a filtered-out candidate surfaced")
    // filter-then-search == search-the-subset: exact same hit set
    val want = corpus.take(20).filter(_._1 / 10 == 1L)
      .map { case (id, _, emb) => id -> cosine(emb, q) }
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(hits.map(_.getLong(1)).toSeq === want.toSeq)
  }

  test("a new session over the same root continues the sequence (rebuild-on-startup)") {
    val root = Files.createTempDirectory("graftdb").toString
    val db1 = new GraftDb(spark, root)
    db1.createLibrary(1L, "lib", corpus.head._3.length, "flat")
    db1.addChunk(1L, 0L, 1L, "one", corpus(1)._3)
    val db2 = new GraftDb(spark, root) // fresh facade, same storage
    db2.deleteChunk(1L, 0L, 1L) // must sequence AFTER db1's upsert
    assert(db2.chunks().count() === 0, "restored sequence did not order after prior writes")
  }
}
