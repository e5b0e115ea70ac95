package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** f1: the end-to-end training-data curation pipeline — the composition the
  * library exists for, as ONE query: exact dedup (latest... lowest-id wins
  * per text hash) → quality filter (t2's score ≥ τ) → deterministic
  * hash-based train/val/test split (t6's rule) → per-(split, lang) corpus
  * stats. Each stage is the already-gated operator's logic, composed —
  * proving the operators chain without materialization between stages.
  *
  * Scale shape: the dedup window shuffles once on md5(text) (exact dedup's
  * minimum), everything after is per-row until the final partial-agg
  * groupBy. One pipeline = 2 shuffles at 100 TB, both on keys AQE can
  * re-balance.
  */
object Pipeline {

  /** f3 composite chunk key: vec_id = doc_id << ChunkBits | chunk_idx.
    * 20 bits ≈ 1M chunks/doc; overflow raises (see ingestPipeline). */
  val ChunkBits = 20
  val ChunkRadix: Long = 1L << ChunkBits

  /** The composite key with its loud overflow guard — a chunk_idx at or
    * past the radix raises instead of silently aliasing into the next
    * document's key space (the oracle replays the same packing, so a
    * silent collision would be invisible to the hash gate). */
  private[graft] def chunkKey(docId: org.apache.spark.sql.Column,
                              chunkIdx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(chunkIdx >= ChunkRadix,
      raise_error(format_string("f3: chunk_idx %s overflows the 20-bit chunk radix", chunkIdx)))
      .otherwise(shiftleft(docId, ChunkBits).bitwiseOR(chunkIdx))

  def trainingPipeline(spark: SparkSession, dir: String, minQuality: Double = 0.4): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir)

    // 1. exact dedup: keep the lowest doc_id per exact text
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")

    // 2. quality gate (t2's formula, single source in Text.qualityFrame)
    val scored = Text.qualityFrame(deduped).filter(col("quality") >= minQuality)

    // 3. t6's content-stable split
    val bucket = Dedup.h60(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    val split = scored.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))

    // 4. corpus stats per (split, lang)
    split.groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_toks"),
        round(avg(col("quality")), 4).as("avg_quality"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split", "lang")
  }

  /** f2: the near-dedup corpus — what MinHash dedup exists FOR: d7's
    * cluster labels applied back to the corpus, keeping each cluster's
    * representative (min doc_id) and every unclustered doc, with
    * per-source keep/drop accounting. One left join of the corpus against
    * the non-representative set — NO broadcast hint: the drop list is
    * proportional to the corpus's dup volume, so a high-dup-rate corpus
    * at 100 TB would OOM a forced broadcast; unhinted, AQE broadcasts it
    * at test scale (where it measures tiny) and a pathological corpus
    * degrades to a sort-merge join instead of a driver OOM. */
  def nearDedupCorpus(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val labels = Dedup.clusterLabelsFor(spark, dir, tau)
    val drops = labels.filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"), lit(true).as("dropped"))
    Tables.documents(spark, dir)
      .join(drops, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dropped"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .orderBy("source")
  }

  def nearDedupCorpusOracle(tau: Double = 0.5): String =
    s"""WITH lab AS (SELECT doc_id, cluster_id FROM (${Dedup.dupClustersOracle(tau)})),
       |drops AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
       |SELECT d.source, count(*) AS n_docs,
       |       sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |       sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped
       |FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** f3: the reference's INGEST flow (add_document → chunk → embed →
    * index → search, app/core/vector_db.py:118-168 + indexing.py) as one
    * batch pipeline: documents are token-window chunked (t9's frame),
    * every chunk is embedded (v13's deterministic stub — the Cohere call
    * stubbed with exact-integer LCG math so the end-to-end pipeline is
    * oracle-checkable), the chunk embeddings are LSH-keyed into an index,
    * and text queries come back as ranked CHUNKS (the reference's search
    * returns chunk objects). Chunk embeddings are localCheckpoint'd once —
    * the index build and the exact rerank both read them, and at 100 TB
    * that line is the persisted chunk-embedding table (p1's layout).
    * Every step is map-only or an equi/broadcast join; chunk identity
    * rides a single composite key (doc_id << 20 | chunk_idx — 20 bits
    * holds ~1M chunks/doc ≈ a 50M-token document at window 64/stride 48;
    * an overflow raises instead of silently aliasing into the next doc's
    * key space, which the oracle replay could never catch). */
  def ingestPipeline(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 4,
                     window: Int = 64, stride: Int = 48,
                     nTables: Int = 4, nBits: Int = 10, seed: Long = 7777): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir)
    // hash first, embed second, with a materialization between: without it
    // CollapseProject inlines the md5 into the 64-element embed lambda and
    // the chunk hash recomputes per ELEMENT (measured: the whole f3 cost)
    val hashed = Text.chunkFrame(docs, window, stride)
      .select(
        chunkKey(col("doc_id"), col("chunk_idx")).as("vec_id"),
        (Dedup.h60(array_join(col("cw"), " ")) % SearchText.P).as("h"))
      .localCheckpoint()
    val chunks = hashed
      .select(col("vec_id"), SearchText.stubEmbedFromHash(col("h")).as("embedding"))
      .localCheckpoint()

    val index = Lsh.keyRows(chunks, nTables, nBits, seed)
    val queries = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), SearchText.stubEmbed(col("text")).as("qvec"))

    Lsh.searchIndex(index, chunks, queries, nTables, nBits, seed, k)
      .select(col("qid"), col("rank"),
        shiftright(col("vec_id"), ChunkBits).as("doc_id"),
        col("vec_id").bitwiseAND(lit(ChunkRadix - 1)).as("chunk_idx"),
        col("score"))
      .orderBy("qid", "rank")
  }

  def ingestPipelineOracle(k: Int = 5, nQueries: Int = 4, window: Int = 64, stride: Int = 48,
                           nTables: Int = 4, nBits: Int = 10, seed: Long = 7777,
                           dim: Int = 64): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
       |                  len(string_split(text, ' '))::BIGINT AS n_tok
       |           FROM documents),
       |c AS (SELECT doc_id, w,
       |             CASE WHEN n_tok <= $window THEN 1
       |                  ELSE (n_tok - $window + ${stride - 1}) // $stride + 1 END AS n_chunks
       |      FROM w),
       |x AS (SELECT doc_id, w,
       |             unnest([i for i in generate_series(0, n_chunks - 1)]) AS chunk_idx
       |      FROM c),
       |ch AS (SELECT (doc_id << $ChunkBits) | chunk_idx AS vec_id,
       |              ${SearchText.stubEmbedSql(
                         s"array_to_string(w[(chunk_idx * $stride + 1):(chunk_idx * $stride + $window)], ' ')")} AS v
       |       FROM x),
       |q AS (SELECT doc_id AS qid, ${SearchText.stubEmbedSql("text")} AS qv
       |      FROM documents WHERE doc_id < $nQueries),
       |dk AS (${Lsh.keysSql("ch", "vec_id", nTables, nBits, dim, seed)}),
       |qk AS (${Lsh.keysSql("(SELECT qid AS vec_id, qv AS v FROM q) t", "vec_id", nTables, nBits, dim, seed)}),
       |cand AS (SELECT DISTINCT qk.id AS qid, dk.id AS vec_id
       |         FROM dk JOIN qk ON dk.table_id = qk.table_id AND dk.key = qk.key),
       |scored AS (SELECT cand.qid, cand.vec_id, list_cosine_similarity(ch.v, q.qv) AS score
       |           FROM cand JOIN ch ON cand.vec_id = ch.vec_id JOIN q ON cand.qid = q.qid),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM scored)
       |SELECT qid, rank, vec_id >> $ChunkBits AS doc_id, vec_id & ${ChunkRadix - 1} AS chunk_idx,
       |       round(score, 4) AS score
       |FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** The f4 kept-set: every unclustered doc plus each duplicate cluster's
    * highest-quality member (d11's argmax rule) — the corpus a release
    * actually ships after near-dedup. Exposed for the leakage-free spec:
    * because every d3 near-dup pair's endpoints share a cluster and only
    * one member survives, the kept set contains NO near-dup pair at all —
    * so cross-split leakage (d12) is structurally zero after this stage. */
  private[graft] def releaseKept(spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val labels = Dedup.clusterLabelsFor(spark, dir, tau)
    val quality = Text.qualityFrame(docs).select(col("doc_id"), col("quality"))
    // d11's keep-best argmax, reduced to the kept-id set (edge-sized)
    val best = labels.select(col("id").as("doc_id"), col("label"))
      .join(quality, Seq("doc_id"))
      .groupBy(col("label"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg"))).as("b"))
      .select((-col("b.neg")).as("doc_id"), lit(true).as("is_best"))
    val clustered = labels.select(col("id").as("doc_id"), lit(true).as("clustered"))
    // no broadcast hints: both sets scale with dup volume (f2's rule) —
    // AQE broadcasts them at runtime when they measure small
    docs
      .join(clustered, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .filter(col("clustered").isNull || col("is_best").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"))
  }

  /** f4: the RELEASE pipeline — what actually runs before a corpus ships:
    * near-dedup with keep-BEST-copy (d7's clusters × d11's quality
    * argmax, not f2's min-id), PII redaction of the survivors (t17's
    * chain), t6's content-stable split, and per-(split, lang) release
    * stats with the scrub accounting a data card reports. Composes four
    * gated operators in ONE plan: the label/best sets are edge-sized
    * broadcasts against a single corpus scan, redaction is map-only on
    * the kept rows, the split is a pure hash — so the whole pipeline
    * costs the dedup candidate pass plus one corpus scan and one final
    * partial-agg shuffle. A structural bonus falls out: the kept set
    * contains no near-dup pair (each pair collapsed to one member), so
    * d12-style cross-split leakage is ZERO by construction
    * (spec-asserted, [[releaseKept]]). */
  def releasePipeline(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    graft.Graft.init(spark)
    Text.piiRedactFrame(releaseKept(spark, dir, tau), carry = Seq("lang"))
      .withColumn("split", Text.splitLabel(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_email") + col("n_ip") + col("n_phone")).as("n_pii"),
        sum(col("n_chars_redacted")).as("n_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split", "lang")
  }

  def releasePipelineOracle(tau: Double = 0.5): String = {
    val (stages, last) = Text.piiStageCtes("kept")
    s"""WITH lab AS (SELECT doc_id, cluster_id FROM (${Dedup.dupClustersOracle(tau)})),
       |q AS (SELECT doc_id, quality FROM (${Text.qualityOracle})),
       |bst AS (SELECT kept_doc_id FROM (
       |  SELECT l.cluster_id, q.doc_id AS kept_doc_id,
       |         row_number() OVER (PARTITION BY l.cluster_id
       |                            ORDER BY q.quality DESC, q.doc_id) AS rn
       |  FROM lab l JOIN q ON l.doc_id = q.doc_id) WHERE rn = 1),
       |kept AS (SELECT d.doc_id, d.text, d.lang
       |         FROM documents d
       |         LEFT JOIN lab ON d.doc_id = lab.doc_id
       |         LEFT JOIN bst ON d.doc_id = bst.kept_doc_id
       |         WHERE lab.doc_id IS NULL OR bst.kept_doc_id IS NOT NULL),
       |$stages,
       |j AS (SELECT s.doc_id, k.lang,
       |             s.n_email + s.n_ip + s.n_phone AS n_pii,
       |             length(s.t)::BIGINT AS n_chars,
       |             ${Text.splitLabelSql("s.doc_id")} AS split
       |      FROM $last s JOIN kept k ON s.doc_id = k.doc_id)
       |SELECT split, lang, count(*)::BIGINT AS n_docs, sum(n_pii)::BIGINT AS n_pii,
       |       sum(n_chars)::BIGINT AS n_chars,
       |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM j GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }

  /** f5: the CURATED release — f4's near-dup keep-best rule composed with
    * d15's containment keep-longest screen, the two drop rules a real
    * release runs in sequence: collapse each near-dup cluster to its best
    * member, then ALSO drop any survivor still contained in a larger
    * survivor-or-not (quotes/wrappers that Jaccard-banding structurally
    * misses — see d14). Both drop sets join unhinted against ONE corpus
    * scan (AQE broadcasts them when they measure small — f2's rule), so
    * the composite costs the two candidate passes
    * (both served from session artifacts: the shingle table and the label
    * memo) plus a single scan and one partial-agg shuffle. Emits the
    * per-language accounting a data card reports: kept after near-dedup,
    * containment drops among them, and the final shipped count/id range. */
  def curatedRelease(spark: SparkSession, dir: String, tau: Double = 0.5,
                     ctau: Double = 0.4, dfCap: Long = 10): DataFrame = {
    graft.Graft.init(spark)
    val droppedC = Dedup.keepLongest(spark, dir, ctau, dfCap)
      .select(col("dropped").as("doc_id"), lit(true).as("contained"))
    releaseKept(spark, dir, tau)
      .join(droppedC, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_near_kept"),
        sum(when(col("contained"), 1L).otherwise(0L)).as("n_contained_dropped"),
        count(when(col("contained").isNull, lit(1))).as("n_final"),
        min(when(col("contained").isNull, col("doc_id"))).as("min_doc"),
        max(when(col("contained").isNull, col("doc_id"))).as("max_doc"))
      .orderBy("lang")
  }

  def curatedReleaseOracle(tau: Double = 0.5, ctau: Double = 0.4, dfCap: Long = 10): String =
    s"""WITH lab AS (SELECT doc_id, cluster_id FROM (${Dedup.dupClustersOracle(tau)})),
       |q AS (SELECT doc_id, quality FROM (${Text.qualityOracle})),
       |bst AS (SELECT kept_doc_id FROM (
       |  SELECT l.cluster_id, q.doc_id AS kept_doc_id,
       |         row_number() OVER (PARTITION BY l.cluster_id
       |                            ORDER BY q.quality DESC, q.doc_id) AS rn
       |  FROM lab l JOIN q ON l.doc_id = q.doc_id) WHERE rn = 1),
       |kept AS (SELECT d.doc_id, d.lang
       |         FROM documents d
       |         LEFT JOIN lab ON d.doc_id = lab.doc_id
       |         LEFT JOIN bst ON d.doc_id = bst.kept_doc_id
       |         WHERE lab.doc_id IS NULL OR bst.kept_doc_id IS NOT NULL),
       |drp AS (SELECT dropped AS doc_id FROM (${Dedup.keepLongestOracle(ctau, dfCap)})),
       |j AS (SELECT k.doc_id, k.lang, (d.doc_id IS NOT NULL) AS contained
       |      FROM kept k LEFT JOIN drp d ON k.doc_id = d.doc_id)
       |SELECT lang, count(*)::BIGINT AS n_near_kept,
       |       sum(CASE WHEN contained THEN 1 ELSE 0 END)::BIGINT AS n_contained_dropped,
       |       count(CASE WHEN NOT contained THEN 1 END)::BIGINT AS n_final,
       |       min(CASE WHEN NOT contained THEN doc_id END) AS min_doc,
       |       max(CASE WHEN NOT contained THEN doc_id END) AS max_doc
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** f6: the corpus DATASHEET — the per-source summary a data card
    * actually publishes, composed from four gated families in ONE plan:
    * document counts, exact-dup accounting (d1's rule), language spread,
    * token volume, mean quality (per-doc quality fixed-point-quantized
    * BEFORE the sum, so the aggregate is an exact long sum — never a
    * float reduction), and t21's length-outlier count (unhinted
    * join-back; AQE broadcasts it when small). One corpus scan feeds everything; the outlier
    * arm re-reads only because its per-lang stats need their own
    * aggregate. */
  def datasheet(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir)
    val q = Text.qualityFrame(docs).select(col("doc_id"), col("quality"))
    val outl = Text.lengthOutliers(spark, dir)
      .select(col("doc_id"), lit(1L).as("is_outlier"))
    docs.join(q, Seq("doc_id"))
      .join(outl, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        floor(sum(floor(col("quality") * 10000d + 0.5d).cast("long")).cast("double") /
          count(lit(1)).cast("double") + 0.5d).cast("long").as("mean_quality_q4"),
        sum(coalesce(col("is_outlier"), lit(0L))).as("n_len_outliers"))
      .orderBy("source")
  }

  def datasheetOracle: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${Text.qualityOracle})),
       |tt AS (SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
       |st AS (SELECT lang, count(*) AS nd, sum(n_tok) AS sm, sum(n_tok * n_tok) AS ss
       |       FROM tt GROUP BY lang),
       |o AS (SELECT tt.doc_id FROM tt JOIN st USING (lang)
       |      WHERE 4 * (tt.n_tok * st.nd - st.sm) * (tt.n_tok * st.nd - st.sm)
       |            > 9 * (st.nd * st.ss - st.sm * st.sm))
       |SELECT d.source, count(*) AS n_docs,
       |       (count(*) - count(DISTINCT md5(d.text)))::BIGINT AS n_dup_docs,
       |       count(DISTINCT d.lang) AS n_langs,
       |       sum(len(string_split(d.text, ' ')))::BIGINT AS n_tokens,
       |       floor(sum(floor(q.quality * 10000 + 0.5)::BIGINT)::DOUBLE /
       |             count(*)::DOUBLE + 0.5)::BIGINT AS mean_quality_q4,
       |       sum(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_len_outliers
       |FROM documents d JOIN q USING (doc_id) LEFT JOIN o USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** f7: SHARD EXPORT + MANIFEST — the publish step that ends every
    * curation run: the corpus written hash-sharded (shard =
    * h60('shard:'||doc_id) mod S — deterministic, layout-free, the t6
    * split rule applied to output placement), then the per-shard manifest
    * computed by RE-READING THE SHARD FILES, not the source table — so
    * the gate proves the round trip: what landed on disk, per shard, is
    * exactly what the oracle derives from the unified corpus. Manifest
    * columns are a consumer's integrity contract: doc/token/char counts
    * in exact integers plus an ORDER-INDEPENDENT checksum
    * (`bit_xor(h60(text))` — XOR commutes, so the checksum is stable
    * under any read order / partitioning, unlike a sum, which overflows,
    * or a hash-of-concat, which order-breaks). Scale shape: one map-only
    * assignment pass + the partitioned write + one partial agg over the
    * reread — the write IS the work; the manifest is free. */
  def shardManifest(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    graft.Graft.init(spark)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_release_shards"
    Tables.documents(spark, dir)
      .withColumn("shard",
        pmod(Dedup.h60(concat(lit("shard:"), col("doc_id").cast("string"))), lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // partition-column inference reads `shard` back as INT; re-cast so the
    // output schema matches the oracle's BIGINT
    spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))").as("checksum"))
      .orderBy("shard")
  }

  def shardManifestOracle(nShards: Int = 8): String =
    s"""SELECT CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % $nShards AS shard,
       |       count(*) AS n_docs,
       |       sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
       |       sum(n_chars)::BIGINT AS n_chars,
       |       bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))::BIGINT AS checksum
       |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin

  def trainingPipelineOracle(minQuality: Double = 0.4): String = {
    val allStops = Text.StopWords.values.flatten.toSeq.distinct.sorted
      .map(w => s"'$w'").mkString(", ")
    s"""WITH dedup AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM documents) WHERE rn = 1),
       |t AS (
       |  SELECT doc_id, lang, text,
       |         len(string_split(text, ' '))::BIGINT AS n_tok,
       |         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq,
       |         len(list_intersect(list_distinct(string_split(text, ' ')), [$allStops]))::BIGINT AS stop_hits
       |  FROM dedup),
       |m AS (
       |  SELECT doc_id, lang, n_tok,
       |         0.5 * (n_uniq::DOUBLE / n_tok::DOUBLE)
       |           + 0.3 * least((length(text)::DOUBLE / n_tok::DOUBLE) / 10.0, 1.0)
       |           + 0.2 * (stop_hits::DOUBLE / n_uniq::DOUBLE) AS quality
       |  FROM t),
       |f AS (SELECT * FROM m WHERE quality >= $minQuality),
       |s AS (
       |  SELECT *, CASE
       |    WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80 THEN 'train'
       |    WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90 THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM f)
       |SELECT split, lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_toks,
       |       round(avg(quality), 4) AS avg_quality,
       |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }

  /** f8: INCREMENTAL RELEASE maintenance — what a nightly delta actually
    * does to the shipped corpus, computed WITHOUT redoing base×base
    * dedup: the base release's band table and CC LABEL table are standing
    * bucketed artifacts (the previous release's outputs; built here once
    * per session so the query is self-contained — d6/d8's convention),
    * and the delta run (1) screens ONLY delta bands against the band
    * artifact (d8's probe) plus the tiny delta self-join, (2) re-clusters
    * by contracting `label-edges ∪ new-pairs` — the label edges carry
    * exactly the base connectivity, so the union CC equals a from-scratch
    * clustering of the whole corpus (what the oracle recomputes via
    * transitive closure) at O(|labels| + |delta work|) cost, (3) reports
    * the release DELTA per source: base/delta doc counts, kept-before,
    * kept-after, EVICTIONS (base docs the delta demoted — a delta doc
    * with a smaller id taking over as cluster representative under f2's
    * min-id rule), and kept delta docs. At 100 TB this is the difference
    * between re-deduping the corpus nightly and touching only the delta.
    * Label joins back to the corpus are unhinted (f2's rule). */
  /** The previous release's standing artifacts — band table + CC label
    * table — built once per (session, corpus, params): the single-JVM
    * analog of the persisted tables a production release leaves behind
    * (the d6 standing-shingle convention; without the memo every rep
    * re-prices the BASE release, which is exactly what f8 exists to
    * avoid). */
  private val relArtifactCache =
    new BoundedMemo[(SparkSession, String, Double, Int), (DataFrame, DataFrame)](4)(_ => ())

  def releaseDelta(spark: SparkSession, dir: String, tau: Double = 0.5,
                   mod: Int = 10): DataFrame = {
    graft.Graft.init(spark)
    val (shingles, sh) = Dedup.corpusShingles(spark, dir)
    val isDelta = (col("doc_id") % mod) === 0

    def rerank(cand: DataFrame): DataFrame = cand
      .join(shingles.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(shingles.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"))

    val (baseBands, baseLabels) =
      relArtifactCache.getOrElseUpdate((spark, dir, tau, mod)) {
        val bands = Persist.materializeBucketed(spark,
          Dedup.minhashBands(sh.filter(!isDelta)),
          "graft_idx_rel_bands", 8, Seq("band_key", "band_idx"))
        // standing label artifact: the PREVIOUS release's clustering
        // (base-only pairs from the band artifact's exchange-free self-join)
        val basePairs = rerank(bands.as("a")
          .join(bands.as("b"),
            col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct())
        val labels = Persist.materializeBucketed(spark,
          Dedup.connectedComponents(basePairs), "graft_idx_rel_labels", 8, Seq("id"))
        (bands, labels)
      }
    val deltaBands = Dedup.minhashBands(sh.filter(isDelta))

    // the delta's marginal work: probe the artifact + tiny delta self-join.
    // deltaBands is SF-proportional (1/mod of the corpus's band rows), so
    // it carries NO broadcast hint — AQE converts it at test scale and a
    // 100× corpus degrades to a shuffled hash join, never a driver OOM
    // (the f2 rule; the band artifact side is already bucketed)
    val newCand = baseBands.as("a")
      .join(deltaBands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .union(deltaBands.as("a")
        .join(deltaBands.as("b"),
          col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
      .distinct()
    val newPairs = rerank(newCand)

    // contract label-edges ∪ new-pairs: base connectivity rides the labels,
    // so this IS the full-corpus clustering at delta cost
    val labelEdges = baseLabels.filter(col("id") =!= col("label"))
      .select(col("id").as("doc_a"), col("label").as("doc_b"))
    val unionLabels = Dedup.connectedComponents(labelEdges.union(newPairs).distinct())

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .withColumn("is_delta", isDelta)
    val kb = baseLabels.select(col("id").as("doc_id"), col("label").as("lb"))
    val ka = unionLabels.select(col("id").as("doc_id"), col("label").as("la"))
    docs
      .join(kb, Seq("doc_id"), "left")
      .join(ka, Seq("doc_id"), "left")
      .withColumn("kept_before", col("lb").isNull || col("lb") === col("doc_id"))
      .withColumn("kept_after", col("la").isNull || col("la") === col("doc_id"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"),
        sum(when(!col("is_delta") && col("kept_before"), 1L).otherwise(0L)).as("n_kept_before"),
        sum(when(col("kept_after"), 1L).otherwise(0L)).as("n_kept_after"),
        sum(when(!col("is_delta") && col("kept_before") && !col("kept_after"), 1L)
          .otherwise(0L)).as("n_evicted"),
        sum(when(col("is_delta") && col("kept_after"), 1L).otherwise(0L)).as("n_delta_kept"))
      .orderBy("source")
  }

  /** f9: EPOCH MIXING — the data-mix step every LLM pretraining run
    * executes between curation and tokenization (the Pile / LLaMA recipe:
    * each source gets a target share of the token budget, sources below
    * their share are UPSAMPLED — seen for more than one epoch — and
    * sources above it are downsampled). t18 balances DOC counts down to
    * the smallest class; this is the production shape: TOKEN-denominated
    * targets, fractional epoch factors, and both directions at once.
    *
    * Mechanics, all exact integer / fixed-point so the query hash-gates:
    * per-source token mass S and the corpus total T reduce in one pass;
    * the target share is a deterministic weight over the source id
    * (`(n%4+1)·200` basis points — sums to exactly 10000 over the 20
    * sources, standing in for the mixture-weights config a real run
    * reads); the epoch factor r = T·share/S is carried in Q4 fixed point;
    * every document emits `floor(r)` copies plus one more iff
    * `h60('mix:'||doc_id) % 10⁴ < frac(r)` — per-DOCUMENT deterministic
    * Bernoulli, the same device as t6's split, so the realized token
    * share concentrates on the target without any RNG state. Emission is
    * a map-side `explode(sequence(1, n_copies))` — no shuffle until the
    * accounting agg.
    *
    * Scale shape: two scans of a 3-column projection (one to price the
    * mix, one to emit), a 20-row rate table broadcast back (hinted — a
    * group-by over the fixed `source` domain, audit-provably bounded),
    * and two partial aggs. No window, no driver state; at 100 TB the
    * emitted stream feeds the tokenizer directly. Overflow-safe to
    * ~9·10¹⁴ corpus tokens (T·10⁴ must stay under 2⁶³). */
  def epochMix(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val perSrc = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("target_bp",
        (substring(col("source"), 4, 10).cast("long") % 4L + 1L) * 200L)
    val total = d.agg(sum(col("n_tok")).as("t_tokens"))
    val rates = perSrc.crossJoin(broadcast(total))
      .withColumn("rate_q4",
        expr("(t_tokens * target_bp div 10000) * 10000 div n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_bp"), col("rate_q4"))
    val emitted = d.join(broadcast(rates.select(col("source"), col("rate_q4"))), Seq("source"))
      .withColumn("n_copies",
        expr("rate_q4 div 10000") +
          when(Dedup.h60(concat(lit("mix:"), col("doc_id").cast("string"))) % 10000L
            < col("rate_q4") % 10000L, 1L).otherwise(0L))
      // sequence(1, 0) counts DOWN in Spark — guard the zero-copy docs out
      .filter(col("n_copies") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("n_copies"))))
    val eSrc = emitted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_emitted_docs"), sum(col("n_tok")).as("n_emitted_tokens"))
    val eTot = eSrc.agg(sum(col("n_emitted_tokens")).as("e_total"))
    rates.join(eSrc, Seq("source"), "left")
      .crossJoin(broadcast(eTot))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("target_bp"),
        col("rate_q4"),
        coalesce(col("n_emitted_docs"), lit(0L)).as("n_emitted_docs"),
        coalesce(col("n_emitted_tokens"), lit(0L)).as("n_emitted_tokens"),
        expr("coalesce(n_emitted_tokens, 0) * 10000 div e_total").as("achieved_bp"))
      .orderBy("source")
  }

  /** DuckDB replay of [[epochMix]] — same fixed-point arithmetic, same
    * h60 Bernoulli, emission via `unnest(generate_series(1, n))` (empty
    * when n = 0, matching the Spark-side guard). */
  def epochMixOracle(): String =
    s"""WITH d AS (SELECT doc_id, source,
       |                  len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
       |ps AS (SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       |              (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 200 AS target_bp
       |       FROM d GROUP BY source),
       |tt AS (SELECT sum(n_tok)::BIGINT AS t_tokens FROM d),
       |r AS (SELECT ps.source, ps.n_docs, ps.n_tokens, ps.target_bp,
       |             ((tt.t_tokens * ps.target_bp) // 10000) * 10000 // ps.n_tokens AS rate_q4
       |      FROM ps, tt),
       |nc AS (SELECT d.source, d.doc_id, d.n_tok,
       |              r.rate_q4 // 10000 +
       |              CASE WHEN CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
       |                        % 10000 < r.rate_q4 % 10000 THEN 1 ELSE 0 END AS n_copies
       |       FROM d JOIN r USING (source)),
       |em AS (SELECT source, n_tok, unnest(generate_series(1, n_copies)) AS epoch FROM nc),
       |es AS (SELECT source, count(*)::BIGINT AS n_emitted_docs,
       |              sum(n_tok)::BIGINT AS n_emitted_tokens FROM em GROUP BY source),
       |et AS (SELECT sum(n_emitted_tokens)::BIGINT AS e_total FROM es)
       |SELECT r.source, r.n_docs, r.n_tokens, r.target_bp, r.rate_q4,
       |       coalesce(es.n_emitted_docs, 0)::BIGINT AS n_emitted_docs,
       |       coalesce(es.n_emitted_tokens, 0)::BIGINT AS n_emitted_tokens,
       |       (coalesce(es.n_emitted_tokens, 0) * 10000) // et.e_total AS achieved_bp
       |FROM r LEFT JOIN es USING (source), et ORDER BY source""".stripMargin

  /** From-scratch DuckDB replay: both clusterings via transitive closure
    * (base-only pairs ≡ full pair set restricted to base endpoints — band
    * membership is per-doc, so restriction commutes with candidate
    * generation). */
  def releaseDeltaOracle(tau: Double = 0.5, mod: Int = 10): String =
    s"""WITH RECURSIVE allp AS (SELECT doc_a, doc_b FROM (${Dedup.minhashLshOracle(tau)})),
       |bp AS (SELECT doc_a, doc_b FROM allp WHERE doc_a % $mod <> 0 AND doc_b % $mod <> 0),
       |ea AS (SELECT doc_a AS src, doc_b AS dst FROM allp
       |       UNION SELECT doc_b, doc_a FROM allp),
       |reacha(src, dst) AS (
       |  SELECT src, dst FROM ea
       |  UNION
       |  SELECT r.src, e.dst FROM reacha r JOIN ea e ON r.dst = e.src),
       |laba AS (SELECT src AS doc_id, least(src, min(dst)) AS la FROM reacha GROUP BY src),
       |eb AS (SELECT doc_a AS src, doc_b AS dst FROM bp
       |       UNION SELECT doc_b, doc_a FROM bp),
       |reachb(src, dst) AS (
       |  SELECT src, dst FROM eb
       |  UNION
       |  SELECT r.src, e.dst FROM reachb r JOIN eb e ON r.dst = e.src),
       |labb AS (SELECT src AS doc_id, least(src, min(dst)) AS lb FROM reachb GROUP BY src),
       |d AS (SELECT doc_id, source, doc_id % $mod = 0 AS is_delta FROM documents),
       |k AS (SELECT d.doc_id, d.source, d.is_delta,
       |             (lb.doc_id IS NULL OR lb.lb = d.doc_id) AS kept_before,
       |             (la.doc_id IS NULL OR la.la = d.doc_id) AS kept_after
       |      FROM d LEFT JOIN labb lb ON lb.doc_id = d.doc_id
       |             LEFT JOIN laba la ON la.doc_id = d.doc_id)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN NOT is_delta THEN 1 ELSE 0 END)::BIGINT AS n_base,
       |       sum(CASE WHEN is_delta THEN 1 ELSE 0 END)::BIGINT AS n_delta,
       |       sum(CASE WHEN NOT is_delta AND kept_before THEN 1 ELSE 0 END)::BIGINT AS n_kept_before,
       |       sum(CASE WHEN kept_after THEN 1 ELSE 0 END)::BIGINT AS n_kept_after,
       |       sum(CASE WHEN NOT is_delta AND kept_before AND NOT kept_after THEN 1 ELSE 0 END)::BIGINT AS n_evicted,
       |       sum(CASE WHEN is_delta AND kept_after THEN 1 ELSE 0 END)::BIGINT AS n_delta_kept
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** f10: CURRICULUM PHASES — the data-ORDERING step between curation and
    * training (curriculum learning: schedule low-quality/easy data early,
    * highest-quality data for the final phase; the complement of f9's
    * WHO-gets-sampled mix, this decides WHEN data is seen). Documents are
    * assigned to 4 phases by the EXACT corpus quality quartiles, and the
    * output is the training-schedule artifact: per phase, document count,
    * token budget, exact fixed-point token share, and the quality bounds.
    *
    * The thresholds use t22's bounded-histogram quantile machinery: the
    * 4-dp quality score has a ≤~11k-value domain at ANY corpus size, so
    * one partial-agg groupBy + a driver walk yields the three
    * quantile_cont values exactly (q9-verified bit-parity formula); phase
    * assignment is then a map-only CASE against three broadcast literals
    * and the schedule is one partial agg. At 100 TB: two scans (histogram
    * + assignment — deliberately no corpus cache), one ≤11k-row shuffle,
    * 4 rows out. */
  def curriculumPhases(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    def scored: DataFrame = Text.qualityFrame(Tables.documents(spark, dir))
      .withColumn("q4", expr("cast(floor(quality * 10000 + 0.5) as bigint)"))
      .select(col("doc_id"), col("n_tok"), col("q4"))
    val hist: Array[(Long, Long)] = scored.groupBy(col("q4"))
      .agg(count(lit(1)).as("n")).orderBy("q4")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    require(n > 0, "empty corpus - curriculum undefined")
    def valueAt(pos: Long): Long = {
      var c = 0L
      hist.collectFirst { case (v, cnt) if { c += cnt; c > pos } => v }.get
    }
    def quantile(p: Double): Double = {
      val h = (n - 1).toDouble * p
      val lo = math.floor(h).toLong
      val hi = math.ceil(h).toLong
      if (lo == hi) valueAt(lo).toDouble
      else {
        val frac = h - lo
        valueAt(lo).toDouble * (1.0 - frac) + valueAt(hi).toDouble * frac
      }
    }
    val (t25, t50, t75) = (quantile(0.25), quantile(0.5), quantile(0.75))
    val phased = scored.withColumn("phase",
      when(col("q4").cast("double") < t25, 0L)
        .when(col("q4").cast("double") < t50, 1L)
        .when(col("q4").cast("double") < t75, 2L)
        .otherwise(3L))
    val totals = phased.agg(sum(col("n_tok")).as("total_toks"))
    phased.groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("q4")).as("min_q4"), max(col("q4")).as("max_q4"))
      .crossJoin(broadcast(totals)) // 1-row total: bounded by construction
      .select(col("phase"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 10000 div total_toks").as("token_share_q4"),
        col("min_q4"), col("max_q4"))
      .orderBy("phase")
  }

  def curriculumPhasesOracle(): String = {
    val allStops = Text.StopWords.values.flatten.toSeq.distinct.sorted
      .map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         len(string_split(text, ' '))::BIGINT AS n_tok,
       |         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq,
       |         len(list_intersect(list_distinct(string_split(text, ' ')), [$allStops]))::BIGINT AS stop_hits
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_tok,
       |         floor((0.5 * (n_uniq::DOUBLE / n_tok::DOUBLE)
       |              + 0.3 * least((length(text)::DOUBLE / n_tok::DOUBLE) / 10.0, 1.0)
       |              + 0.2 * (stop_hits::DOUBLE / n_uniq::DOUBLE)) * 10000 + 0.5)::BIGINT AS q4
       |  FROM t),
       |b AS (SELECT quantile_cont(q4, 0.25) AS t25, quantile_cont(q4, 0.5) AS t50,
       |             quantile_cont(q4, 0.75) AS t75 FROM q),
       |ph AS (SELECT doc_id, n_tok, q4,
       |              CASE WHEN q4::DOUBLE < b.t25 THEN 0
       |                   WHEN q4::DOUBLE < b.t50 THEN 1
       |                   WHEN q4::DOUBLE < b.t75 THEN 2 ELSE 3 END::BIGINT AS phase
       |       FROM q, b),
       |tot AS (SELECT sum(n_tok)::BIGINT AS tt FROM q)
       |SELECT phase, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       |       (sum(n_tok)::BIGINT * 10000) // tot.tt AS token_share_q4,
       |       min(q4) AS min_q4, max(q4) AS max_q4
       |FROM ph, tot GROUP BY phase, tot.tt ORDER BY phase""".stripMargin
  }

  /** f11: the per-source DATA CARD — the release-notes table every
    * published dataset ships (docs, tokens, language spread, quality
    * spread incl. the exact median): the summary a consumer reads before
    * training and the row a curation run appends to its changelog. ONE
    * corpus tokenize (t2's quality formula, single-sourced from
    * [[Text.qualityFrame]]) feeds both passes off a checkpointed
    * projection: the card aggregate (count/sum/distinct-lang/min/max —
    * all partial-agg) and the per-source exact median via the bounded
    * (source × q4-domain) histogram + the t22/q9 driver walk ≡ DuckDB's
    * per-group quantile_cont. Medians come back as a |sources|-row
    * broadcast join. Output bounded by the source domain at any corpus
    * size. */
  def sourceCard(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val scored = Text.qualityFrame(Tables.documents(spark, dir))
      .select(col("source"), col("lang"), col("n_tok"),
        expr("cast(floor(quality * 10000 + 0.5) as bigint)").as("q4"))
      .localCheckpoint() // histogram pass + card aggregate share one scan
    val bySource = scored.groupBy(col("source"), col("q4"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    val medRows = bySource.toSeq.map { case (src, rows) =>
      val h = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val n = h.map(_._2).sum
      def valueAt(pos: Long): Long = {
        var c = 0L
        h.collectFirst { case (v, cnt) if { c += cnt; c > pos } => v }.get
      }
      val hh = (n - 1).toDouble * 0.5
      val (lo, hi) = (math.floor(hh).toLong, math.ceil(hh).toLong)
      val med = if (lo == hi) valueAt(lo).toDouble
        else valueAt(lo).toDouble * (1.0 - (hh - lo)) + valueAt(hi).toDouble * (hh - lo)
      (src, med)
    }
    import spark.implicits._
    val meds = medRows.toDF("source", "med")
      .select(col("source"), round(col("med"), 4).as("p50_q4"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("q4")).as("min_q4"), max(col("q4")).as("max_q4"))
      .join(broadcast(meds), Seq("source")) // |sources|-row side: bounded
      .orderBy("source")
  }

  /** f12: TOKEN-BUDGET WATERFILL — the allocation solver between f9's
    * "sample at these rates" and f11's "here is what each source holds":
    * given a global token budget (90% of the corpus here, derived
    * exactly — high enough that the near-uniform test sources split into
    * BOTH regimes: the smallest taken whole, the rest capped), allocate it across sources by WATER-FILLING — every
    * source gets min(available, L) for the unique integer level L that
    * spends the budget — the standard answer when target weights are
    * "as uniform as the data allows" rather than f9's fixed mixture
    * (small sources are taken whole, large ones capped at the common
    * level, no source starved by a proportional rule). The cut is found
    * CLOSED-FORM on the avail-sorted prefix sums (for each candidate
    * "first k sources taken whole": L = (B − P_k) div (n − k), valid
    * iff a_k ≤ L < a_{k+1} — exactly one row passes), so both engines
    * compute the identical exact-integer level with no iteration and no
    * float. The whole solve runs on the SOURCE table — one corpus-scan
    * token count, then window ops over a source-domain-bounded relation
    * (~dozens of rows at any corpus size); the unspent remainder
    * (B − Σ alloc < n, by construction) is reported, not silently
    * redistributed. */
  def budgetWaterfill(spark: SparkSession, dir: String,
                      budgetNum: Long = 9L, budgetDen: Long = 10L): DataFrame = {
    val byAvail = Window.orderBy(col("avail"), col("source"))
    val src = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("avail"))
    // source-domain-bounded from here on: unpartitioned windows over ~20
    // rows are deliberate (the WindowExec warning does not apply)
    val ord = src
      .withColumn("rn", row_number().over(byAvail))
      .withColumn("pfx_prev",
        sum(col("avail")).over(byAvail.rowsBetween(Window.unboundedPreceding, 0))
          - col("avail"))
      .withColumn("a_prev", lag(col("avail"), 1).over(byAvail))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total", sum(col("avail")).over(Window.partitionBy()))
      .withColumn("budget", expr(s"total * $budgetNum div $budgetDen"))
    val level = ord
      .withColumn("lk", expr("(budget - pfx_prev) div (n - rn + 1)"))
      .withColumn("valid",
        (col("a_prev").isNull || col("a_prev") <= col("lk")) && col("lk") < col("avail"))
      .select(
        when(max(when(col("valid"), col("lk"))).isNull, max(col("avail")))
          .otherwise(max(when(col("valid"), col("lk")))).as("level"),
        first(col("budget")).as("budget"))
    src.crossJoin(broadcast(level)) // 1-row level: bounded by construction
      .select(col("source"), col("avail"),
        least(col("avail"), col("level")).as("alloc"),
        col("level"), col("budget"),
        expr("least(avail, level) * 10000 div avail").as("fill_q4"))
      .orderBy("source")
  }

  def budgetWaterfillOracle(budgetNum: Long = 9L, budgetDen: Long = 10L): String =
    s"""WITH src AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS avail
       |             FROM documents GROUP BY source),
       |g AS (SELECT sum(avail)::BIGINT AS total,
       |             (sum(avail) * $budgetNum // $budgetDen)::BIGINT AS budget,
       |             count(*)::BIGINT AS n FROM src),
       |ord AS (SELECT source, avail,
       |               row_number() OVER (ORDER BY avail, source) AS rn,
       |               (sum(avail) OVER (ORDER BY avail, source ROWS UNBOUNDED PRECEDING)
       |                 - avail)::BIGINT AS pfx_prev,
       |               lag(avail) OVER (ORDER BY avail, source) AS a_prev
       |        FROM src),
       |lv AS (SELECT ((g.budget - o.pfx_prev) // (g.n - o.rn + 1))::BIGINT AS lk,
       |              (o.a_prev IS NULL OR o.a_prev <= (g.budget - o.pfx_prev) // (g.n - o.rn + 1))
       |                AND (g.budget - o.pfx_prev) // (g.n - o.rn + 1) < o.avail AS valid
       |       FROM ord o, g),
       |level AS (SELECT coalesce(max(CASE WHEN valid THEN lk END),
       |                          (SELECT max(avail) FROM src))::BIGINT AS level FROM lv)
       |SELECT s.source, s.avail,
       |       least(s.avail, level.level)::BIGINT AS alloc,
       |       level.level, g.budget,
       |       (least(s.avail, level.level) * 10000 // s.avail)::BIGINT AS fill_q4
       |FROM src s, level, g ORDER BY s.source""".stripMargin

  def sourceCardOracle(): String = {
    val allStops = Text.StopWords.values.flatten.toSeq.distinct.sorted
      .map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT source, lang, text,
       |         len(string_split(text, ' '))::BIGINT AS n_tok,
       |         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq,
       |         len(list_intersect(list_distinct(string_split(text, ' ')), [$allStops]))::BIGINT AS stop_hits
       |  FROM documents),
       |q AS (
       |  SELECT source, lang, n_tok,
       |         floor((0.5 * (n_uniq::DOUBLE / n_tok::DOUBLE)
       |              + 0.3 * least((length(text)::DOUBLE / n_tok::DOUBLE) / 10.0, 1.0)
       |              + 0.2 * (stop_hits::DOUBLE / n_uniq::DOUBLE)) * 10000 + 0.5)::BIGINT AS q4
       |  FROM t)
       |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       |       count(DISTINCT lang)::BIGINT AS n_langs,
       |       min(q4) AS min_q4, max(q4) AS max_q4,
       |       round(quantile_cont(q4, 0.5), 4) AS p50_q4
       |FROM q GROUP BY source ORDER BY source""".stripMargin
  }
}
