package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libs in this container); everything around it — binary schema, typed
  * Dataset pipeline, per-partition batch processing, output schema — is the
  * real shape a decode/feature-extract stage has at scale: `mapPartitions`
  * over a typed Dataset so each task amortizes (stub) codec setup across
  * its whole partition, exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte], source: String)
  case class DecodedMeta(doc_id: Long, n_bytes: Long, first_byte: Long,
                         fake_feature: Long, source: String)

  /** STUB decode: a real pipeline would decode image/audio bytes here
    * (e.g. JPEG → tensor). Deterministic fake: sum of payload bytes mod 256.
    */
  private def stubDecode(payload: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc += (payload(i) & 0xff); i += 1 }
    acc % 256L
  }

  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, frame_feature: Long)

  /** m2: frame sampling over opaque binary payloads — the video-pipeline
    * batch shape: each payload yields `nFrames` fixed-stride windows, each
    * "decoded" (STUB) to a feature row. One input row → N typed output
    * rows, all inside a single mapPartitions pass (no shuffle; the
    * explosion happens task-local exactly like a real frame extractor).
    */
  def frameSample(spark: SparkSession, dir: String, nFrames: Int = 4,
                  frameLen: Int = 16): DataFrame =
    framesOf(binaryDocs(spark, dir), nFrames, frameLen).toDF().orderBy("doc_id", "frame_idx")

  private def binaryDocs(spark: SparkSession, dir: String): Dataset[BinaryDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[BinaryDoc]
  }

  /** The frame-extraction pass shared by m2 and m3: one input row → N
    * typed frame rows, all inside a single mapPartitions pass (no shuffle;
    * the explosion is task-local exactly like a real frame extractor). */
  private def framesOf(binaries: Dataset[BinaryDoc], nFrames: Int,
                       frameLen: Int): Dataset[Frame] = {
    import binaries.sparkSession.implicits._
    binaries.mapPartitions { it =>
      it.flatMap { b =>
        val stride = math.max(1, b.payload.length / nFrames)
        (0 until nFrames).iterator.flatMap { f =>
          val off = f * stride
          if (off >= b.payload.length) None
          else {
            val end = math.min(off + frameLen, b.payload.length)
            // STUB decode: a real pipeline would decode the frame bytes
            // (e.g. JPEG frame → tensor); deterministic fake feature here
            var acc = 0L
            var i = off
            while (i < end) { acc = acc * 31 + (b.payload(i) & 0xff); i += 1 }
            Some(Frame(b.doc_id, f.toLong, off.toLong, acc & 0x7fffffffL))
          }
        }
      }
    }
  }

  /** m3: the multimodal pipeline END TO END — binary payload → frame
    * features (STUB decode, m2's pass) → per-media feature VECTOR → LSH
    * index → similar-media search. This is the video/image dedup-and-
    * retrieval flow of a training-data pipeline with the codec stubbed:
    * everything downstream of decode (the vectorization shuffle, the index
    * build, the bucket-join search) is the real 100 TB plan.
    *
    * The per-media vector is the frame features in frame order (dim =
    * nFrames), divided by Int.MaxValue purely to leave double range —
    * components are NOT bounded to [0,1]: the feature is a wrapping Long
    * hash, so after the divide a component can be anywhere in ±~4.3e9.
    * Cosine/LSH only need determinism, not boundedness; nothing may
    * assume unit-range components. One groupBy(doc_id) shuffle whose rows
    * are nFrames longs each; then the m3 index/search path IS v10's
    * (keyRows + searchIndex), proving the multimodal columns compose with
    * the vector stack unchanged. ORACLE-GATED ([[mediaSearchOracle]]): the
    * stub decode is deterministic integer math, so the whole post-decode
    * pipeline is replayed in DuckDB; also spec-gated by PipelineSpec
    * (deterministic, self-hit at rank 1 with score 1.0, hits within the
    * corpus). */
  def mediaSearch(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 4,
                  nFrames: Int = 4, frameLen: Int = 16,
                  nTables: Int = 4, nBits: Int = 8, seed: Long = 4000): DataFrame = {
    graft.Graft.init(spark)
    val frames = framesOf(binaryDocs(spark, dir), nFrames, frameLen).toDF()

    // per-media dense vector: frame features in frame order, shrunk by
    // 1/Int.MaxValue (range-keeping only — components are unbounded, the
    // wrapping Long hash spans far beyond ±Int.MaxValue)
    val vectors = frames
      .groupBy(col("doc_id").as("vec_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame_feature")))).as("fs"))
      .select(col("vec_id"),
        expr("transform(fs, x -> CAST(x.frame_feature AS DOUBLE) / 2147483647.0)").as("embedding"))
      .localCheckpoint() // feeds the index build, the rerank corpus, and queries

    val queries = vectors.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Lsh.searchIndex(Lsh.keyRows(vectors, nTables, nBits, seed), vectors, queries,
      nTables, nBits, seed, k)
  }

  /** DuckDB replay of [[mediaSearch]]'s post-decode pipeline. The frame
    * hash folds `acc = acc*31 + byte` with Long WRAPAROUND — DuckDB raises
    * on BIGINT overflow, so the fold runs in HUGEINT mod 2^64
    * (`list_reduce`), whose low 31 bits equal the Scala `acc &
    * 0x7fffffffL` of the wrapped two's-complement value. Byte access is
    * `unicode(substr(text, i, 1))`, valid because the gate corpora are
    * pure ASCII (UTF-8 byte == codepoint — asserted against all three SF
    * dirs); a non-ASCII corpus would need a BLOB-indexed byte fetch. The
    * LSH tail reuses [[Lsh.keysSql]] at dim = nFrames. */
  /** The frame-extraction replay shared by the m2 and m3 oracles: `d`
    * (ASCII text + length), `fr` (fixed-stride frame windows), `ff`
    * (the wrapping-Long polynomial feature per frame, via HUGEINT
    * mod 2^64 — see [[mediaSearchOracle]]'s scaladoc for why). */
  private def frameCtes(nFrames: Int, frameLen: Int): String =
    s"""d AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |fr AS (SELECT doc_id, f AS frame_idx, f * greatest(1, len // $nFrames) AS off, len, text
       |       FROM d, (SELECT unnest(generate_series(0, ${nFrames - 1})) AS f)
       |       WHERE f * greatest(1, len // $nFrames) < len),
       |ff AS (SELECT doc_id, frame_idx, off,
       |              CAST(list_reduce(list_prepend(0::HUGEINT,
       |                     [unicode(substr(text, i, 1))::HUGEINT
       |                      for i in generate_series(off + 1, least(off + $frameLen, len))]),
       |                   (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)
       |                   % 2147483648 AS BIGINT) AS feat
       |       FROM fr)""".stripMargin

  /** DuckDB replay of [[frameSample]] (m2): the shared frame CTEs,
    * projected to the typed frame rows. Expressible for the same reason
    * as m3: the stub decode is deterministic integer math over an ASCII
    * corpus (UTF-8 byte == codepoint). */
  def frameSampleOracle(nFrames: Int = 4, frameLen: Int = 16): String =
    s"""WITH ${frameCtes(nFrames, frameLen)}
       |SELECT doc_id, frame_idx::BIGINT AS frame_idx, off::BIGINT AS "offset",
       |       feat AS frame_feature
       |FROM ff ORDER BY doc_id, frame_idx""".stripMargin

  /** DuckDB replay of [[binaryMeta]] (m1): byte length, first byte, and
    * the byte-sum stub feature are exact integer functions of the ASCII
    * text the payload encodes (byte value == codepoint), so the whole
    * decode-metadata row replays in SQL. Empty payload: sum of the empty
    * list is NULL → 0, first_byte −1, matching the Scala guards. */
  def binaryMetaOracle(): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len, source FROM documents)
       |SELECT doc_id,
       |       len::BIGINT AS n_bytes,
       |       (CASE WHEN len > 0 THEN unicode(substr(text, 1, 1)) ELSE -1 END)::BIGINT AS first_byte,
       |       (COALESCE(list_aggregate([unicode(substr(text, i, 1))
       |                                 for i in generate_series(1, len)], 'sum'), 0)
       |        % 256)::BIGINT AS fake_feature,
       |       source
       |FROM d ORDER BY doc_id""".stripMargin

  def mediaSearchOracle(k: Int = 5, nQueries: Int = 4,
                        nFrames: Int = 4, frameLen: Int = 16,
                        nTables: Int = 4, nBits: Int = 8, seed: Long = 4000): String =
    s"""WITH ${frameCtes(nFrames, frameLen)},
       |vecs AS (SELECT doc_id AS vec_id, list(feat / 2147483647.0 ORDER BY frame_idx) AS v
       |         FROM ff GROUP BY doc_id),
       |q AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < $nQueries),
       |dk AS (${Lsh.keysSql("vecs", "vec_id", nTables, nBits, nFrames, seed)}),
       |qk AS (${Lsh.keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, nFrames, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(vecs.v, q.qv) AS score
       |           FROM cand JOIN vecs ON cand.vec_id = vecs.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** m4: media duplicate groups — the exact-fingerprint first pass of a
    * production media-dedup pipeline (m3 is the retrieval flow): binary
    * payload → stub-decoded frame-feature FINGERPRINT (m3's vector, dim =
    * nFrames) → group media sharing the identical fingerprint → emit
    * (doc, group representative, group size). ONE groupBy on the
    * fingerprint — linear in the corpus, no candidate generation at all,
    * which is why production systems run exact-hash dedup before any ANN
    * pass (the drift tail — near-but-not-identical media — is the d5/v11
    * cosine machinery, demonstrated on real embeddings).
    *
    * This replaced an LSH-banded near-dup join: random-hyperplane keys
    * over the low-dimensional (dim ≤ 16), positive-orthant, heavily
    * clustered fingerprints collided 3.1M candidate pairs out of 5 000
    * docs (dual-SF bench flagged it superlinear), capping hot buckets
    * silently dropped real pairs, and measurement showed 106 of the 107
    * true cos ≥ 0.999 pairs were IDENTICAL fingerprints anyway — the
    * honest operator here is the exact group-by. */
  def mediaDedupGroups(spark: SparkSession, dir: String,
                       nFrames: Int = 8, frameLen: Int = 16): DataFrame = {
    graft.Graft.init(spark)
    val frames = framesOf(binaryDocs(spark, dir), nFrames, frameLen).toDF()
    val prints = frames
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame_feature")))).as("fs"))
      .select(col("doc_id"),
        expr("transform(fs, x -> x.frame_feature)").as("fp"))
    prints
      .withColumn("rep_doc", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .withColumn("group_n", count(lit(1)).over(Window.partitionBy(col("fp"))).cast("long"))
      .filter(col("group_n") >= 2)
      .select(col("doc_id"), col("rep_doc"), col("group_n"))
      .orderBy("doc_id")
  }

  def mediaDedupGroupsOracle(nFrames: Int = 8, frameLen: Int = 16): String =
    s"""WITH ${frameCtes(nFrames, frameLen)},
       |fp AS (SELECT doc_id, list(feat ORDER BY frame_idx) AS fp FROM ff GROUP BY doc_id),
       |g AS (SELECT doc_id,
       |             min(doc_id) OVER (PARTITION BY fp) AS rep_doc,
       |             count(*) OVER (PARTITION BY fp) AS group_n
       |      FROM fp)
       |SELECT doc_id, rep_doc, group_n::BIGINT AS group_n FROM g
       |WHERE group_n >= 2 ORDER BY doc_id""".stripMargin

  /** m5: CROSS-MODAL retrieval — TEXT queries against the MEDIA corpus
    * through a shared embedding space (the CLIP serving shape with both
    * encoders stubbed): media bytes → frame features (m2's stub decode)
    * → content fingerprint → joint-space embedding via the v13 LCG stub
    * over the fingerprint hash; text queries → the same stub embedder
    * over the text hash (v13/v20's path). The two encoders are the
    * documented deterministic stand-ins; everything AROUND them is the
    * real 100 TB plan — map-only corpus-side encode (hash materialized
    * once, the f3 lesson: CollapseProject would otherwise re-evaluate
    * the md5 per vector element), broadcast query side, cosine TopK
    * partial agg. Swapping in real CLIP towers changes two expressions
    * and no plan shape. Oracle-gated: the full post-decode pipeline
    * replays in DuckDB (HUGEINT frame fold → fingerprint hash → LCG
    * expansion → cosine rank). */
  def crossModalSearch(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 4,
                       nFrames: Int = 8, frameLen: Int = 16): DataFrame = {
    graft.Graft.init(spark)
    val frames = framesOf(binaryDocs(spark, dir), nFrames, frameLen).toDF()
    val media = frames
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("frame_feature")))).as("fs"))
      .select(col("doc_id").as("vec_id"),
        (Dedup.h60(concat(lit("media:"),
          array_join(expr("transform(fs, x -> CAST(x.frame_feature AS STRING))"), ":")))
          % SearchText.P).as("h"))
      .localCheckpoint() // hash once — see scaladoc
      .select(col("vec_id"), SearchText.stubEmbedFromHash(col("h")).as("embedding"))
    val queries = Tables.documents(spark, dir).filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), SearchText.stubEmbed(col("text")).as("qvec"))
    Knn.topkPerQuery(Knn.scoreAll(media, queries, "cosine"), "cosine", k)
  }

  def crossModalSearchOracle(k: Int = 5, nQueries: Int = 4,
                             nFrames: Int = 8, frameLen: Int = 16): String =
    s"""WITH ${frameCtes(nFrames, frameLen)},
       |fp AS (SELECT doc_id, list(feat ORDER BY frame_idx) AS fp FROM ff GROUP BY doc_id),
       |mh AS (SELECT doc_id AS vec_id,
       |              CAST('0x' || substr(md5('media:' ||
       |                array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)), ':')), 1, 15)
       |                AS BIGINT) % ${SearchText.P} AS h
       |       FROM fp),
       |mv AS (SELECT vec_id, ${SearchText.stubEmbedFromHashSql("mh.h")} AS v FROM mh),
       |q AS (SELECT doc_id AS qid, ${SearchText.stubEmbedSql("text")} AS qv
       |      FROM documents WHERE doc_id < $nQueries),
       |s AS (SELECT q.qid, mv.vec_id, list_cosine_similarity(mv.v, q.qv) AS score
       |      FROM mv CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** m1: binary ingestion + per-partition decode → typed metadata. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binaries: Dataset[BinaryDoc] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[BinaryDoc]

    binaries.mapPartitions { it =>
      // per-partition: open the (stub) codec once, stream the batch through
      it.map { b =>
        DecodedMeta(
          doc_id = b.doc_id,
          n_bytes = b.payload.length.toLong,
          first_byte = if (b.payload.nonEmpty) (b.payload(0) & 0xff).toLong else -1L,
          fake_feature = stubDecode(b.payload),
          source = b.source)
      }
    }.toDF().orderBy("doc_id")
  }
}
