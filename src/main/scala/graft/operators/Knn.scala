package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.sources.Tables

/** Flat (exact) kNN — the Spark re-expression of the reference's FlatIndex
  * linear scan (reference: app/core/indexes/flat.py:42-70).
  *
  * Plan shape (scale-first):
  *   scan(embeddings)  ──BroadcastNestedLoopJoin── broadcast(queries)
  *     → codegen'd score Expression (graft.functions.VectorExpressions)
  *     → partial TopK aggregate per partition (k rows/group survive)
  *     → final TopK merge (shuffle moves O(Q·k) rows, not O(n·Q))
  *
  * The Q query vectors are a broadcast dimension; the n-row embedding table
  * is never shuffled. At 100 TB this is one scan + a k-row-per-group
  * reduction — the same shape a 1000-executor cluster wants.
  */
object Knn {

  /** metric ∈ {cosine, l2, dot, manhattan}; returns (qid, rank, vec_id, score). */
  def flatSearch(spark: SparkSession, dir: String, metric: String,
                 k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    topkPerQuery(scoreAll(emb, queries, metric), metric, k)
  }

  /** The EXTERNALIZED query workload: production searches arrive as their
    * own (tiny, broadcast) table — a query log, an eval set — not as a
    * corpus prefix, which is what every other search here uses as its
    * test convention (`vec_id < Q`). The workload is derived by a pure
    * content hash (~2% of vectors, the t8/t18 sampling rule), WRITTEN as
    * its own parquet artifact and read back, so consumers plan against
    * exactly what a real external workload file gives them: a scan of an
    * unknown-content table, broadcast into the search — no correlation
    * with corpus layout, no prefix pushdown to lean on. The DuckDB
    * oracle re-derives the same set from the hash rule. */
  def queryTable(spark: SparkSession, dir: String, mod: Long = 50L): DataFrame = {
    Graft.init(spark)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_query_workload"
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .filter(Dedup.h60(concat(lit("qry:"), col("vec_id").cast("string"))) % mod === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** The workload table as an oracle CTE body (same hash rule). */
  /** The workload membership predicate alone (same hash rule), for oracles
    * that must filter an existing CTE rather than re-scan `embeddings`. */
  private[operators] def workloadPredSql(mod: Long = 50L): String =
    s"(CAST('0x' || substr(md5('qry:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)) % $mod = 0"

  private[operators] def queryTableSql(mod: Long = 50L): String =
    "SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings " +
      s"WHERE ${workloadPredSql(mod)}"

  /** v26: flat kNN served for the external query workload table. */
  def workloadSearch(spark: SparkSession, dir: String, metric: String = "cosine",
                     k: Int = 10): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    topkPerQuery(scoreAll(emb, queryTable(spark, dir), metric), metric, k)
  }

  def workloadSearchOracle(k: Int = 10): String =
    s"""WITH q AS (${queryTableSql()}),
       |s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v16: metadata-filtered kNN — the reference's `metadata_filters` search
    * parameter (declared at app/core/models.py:48 and on every index
    * `search` signature, e.g. flat.py:46; left TODO there — implemented for
    * real here). The filter restricts CANDIDATES, not queries, and is
    * applied before scoring so it reaches the parquet scan as a pushed
    * predicate: at 100 TB a label-filtered search reads only the row groups
    * whose stats overlap the filter, never the full corpus. */
  def filteredSearch(spark: SparkSession, dir: String, labels: Seq[Int] = Seq(2, 5),
                     metric: String = "cosine", k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val all = Tables.embeddings(spark, dir)
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val candidates = all.filter(col("label").isin(labels: _*))
      .select(col("vec_id"), col("embedding"))
    topkPerQuery(scoreAll(candidates, queries, metric), metric, k)
  }

  def filteredSearchOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10, nQueries: Int = 8): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q WHERE e.label IN (${labels.mkString(", ")})),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v43: the INDEX DECISION TABLE — the engine's family ladder priced
    * on one row per family: recall@k against the exact flat truth next
    * to the CANDIDATE-STAGE artifact bytes per vector, the two numbers
    * an operator weighs when choosing what to deploy (flat 256 B =
    * 64×f32 and recall 1 by definition — the anchor row that also
    * proves the overlap machinery; SQ8 72 B = 64×i8 + f64 scale; binary
    * 16 B = two sign words; LSH keys 32 B = 4 tables × i64; IVF lists
    * 256 B — its lever is PRUNING, the bytes column deliberately shows
    * compression ≠ pruning). Each arm is that family's gated search
    * plan unchanged; overlap is a join against the ≤ Q·k flat hit set;
    * recall is fixed-point over exact integer counts. The oracle
    * composes each family's EXISTING oracle verbatim as an independent
    * derived table — no logic duplicated, which is the point: the
    * frontier is an audited VIEW over gated components, not a new
    * measurement. (Rerank stages of binary/LSH touch raw floats for
    * Q·r rows — the table prices the scan stage, where the corpus-sized
    * cost lives.) */
  def indexFrontier(spark: SparkSession, dir: String, k: Int = 10,
                    nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val denom = (k * nQueries).toDouble
    // The six frame CONSTRUCTIONS (truth checkpoint + five family arms)
    // are independent, and several run eager driver-blocking work while
    // building — the flat truth's localCheckpoint, sq8's artifact write,
    // ivf's centroid collect. Built serially, each pays its build jobs
    // while 31 cores idle; a small pool overlaps them (guide §2.6
    // thread-pooled actions — 3 in flight) with every per-arm PLAN
    // unchanged: the same frames feed the same ≤Q·k overlap joins.
    val Seq(flat, binaryH, flatH, ivfH, lshH, sq8H) = graft.Par.all(Seq(
      () => flatSearch(spark, dir, "cosine", k, nQueries)
        .select(col("qid"), col("vec_id")).localCheckpoint(),
      () => binaryHammingSearch(spark, dir, k, nQueries = nQueries),
      () => flatSearch(spark, dir, "cosine", k, nQueries),
      () => Ivf.search(spark, dir, k, nQueries),
      () => Lsh.search(spark, dir, k, nQueries),
      () => sq8Search(spark, dir, k, nQueries)))
    val arms = Seq(("binary", 16L, binaryH), ("flat", 256L, flatH),
      ("ivf", 256L, ivfH), ("lsh", 32L, lshH), ("sq8", 72L, sq8H))
    def arm(name: String, bytes: Long, hits: DataFrame): DataFrame =
      hits.select(col("qid"), col("vec_id"))
        .join(broadcast(flat), Seq("qid", "vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(name).as("family"), lit(bytes).as("bytes_per_vec"), col("n_hits"),
          floor(col("n_hits").cast("double") / denom * 10000d + 0.5d)
            .cast("long").as("recall_q4"))
    arms.map { case (n, b, h) => arm(n, b, h) }.reduce(_ unionAll _).orderBy("family")
  }

  def indexFrontierOracle(k: Int = 10, nQueries: Int = 8): String = {
    val flatSql = oracleFlat("cosine", k, nQueries)
    def arm(name: String, bytes: Long, armSql: String): String =
      s"""SELECT '$name' AS family, ${bytes}::BIGINT AS bytes_per_vec,
         |       count(*)::BIGINT AS n_hits,
         |       floor(count(*)::DOUBLE / ${(k * nQueries).toDouble} * 10000 + 0.5)::BIGINT AS recall_q4
         |FROM ($armSql) a JOIN ($flatSql) f USING (qid, vec_id)""".stripMargin
    Seq(
      arm("binary", 16L, binaryHammingSearchOracle(k, nQueries = nQueries)),
      arm("flat", 256L, flatSql),
      arm("ivf", 256L, Ivf.searchOracle(k, nQueries)),
      arm("lsh", 32L, Lsh.searchOracle(k, nQueries)),
      arm("sq8", 72L, sq8SearchOracle(k, nQueries))
    ).mkString("", "\nUNION ALL\n", "\nORDER BY family")
  }

  /** v42: metadata filter × external WORKLOAD — the cross of the two
    * orthogonal serving conventions (v16's filter-before-score × v26's
    * queries-as-their-own-table), the cell a production serving tier
    * actually runs: a batch of external queries against a
    * metadata-restricted candidate slice. The filter restricts
    * candidates only (never the workload) and reaches the parquet scan
    * pushed; the workload broadcasts over the filtered scan. */
  def workloadFilteredSearch(spark: SparkSession, dir: String,
                             labels: Seq[Int] = Seq(2, 5), metric: String = "cosine",
                             k: Int = 10): DataFrame = {
    Graft.init(spark)
    val candidates = Tables.embeddings(spark, dir)
      .filter(col("label").isin(labels: _*))
      .select(col("vec_id"), col("embedding"))
    topkPerQuery(scoreAll(candidates, queryTable(spark, dir), metric), metric, k)
  }

  def workloadFilteredSearchOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10): String =
    s"""WITH q AS (${queryTableSql()}),
       |s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q WHERE e.label IN (${labels.mkString(", ")})),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v17: kNN over int8 scalar-quantized vectors — the 100 TB storage
    * lever: float32 → symmetric per-vector int8 (`q_i = floor(x_i·s + ½)`,
    * `s = 127/max|x|`) is a 4× footprint/scan-IO cut; the index artifact
    * would persist `(q tinyint[], scale)` instead of the float array.
    * Encode is a map-only projection (one pass, build-time); search
    * dequantizes once into a projected column and scores with the
    * codegen'd cosine — the hot loop stays in whole-stage codegen, only
    * the build-side transform runs as a (catalyst-native) HOF. All
    * arithmetic is double with explicit floor(x+0.5) rounding, so DuckDB
    * reproduces the quantization grid bit-for-bit. */
  def sq8Search(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // Encode ONCE and materialize as array<tinyint> — the build phase of
    // the index, like p1-p3. The encode is the codegen'd [[graft.functions
    // .Sq8Encode]] kernel: one fused two-pass loop per row. (Round-2 used a
    // chained-HOF formulation; ProjectCollapse inlined the maxabs subtree
    // into every later lambda and re-evaluated it per ELEMENT — 6.9 s vs
    // 0.4 s at sf0.1. A zero vector encodes to NULL = no quantizable
    // signal; the filter drops those, matching the oracle's maxabs > 0.)
    val enc = emb
      .select(col("vec_id"), Graft.sq8Encode(col("embedding")).as("qcode"))
      .filter(col("qcode").isNotNull)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_sq8"
    enc.write.mode("overwrite").parquet(path)

    // Search the materialized codes. Cosine is scale-invariant, so the
    // codes rank EXACTLY like the dequantized vectors — no dequantize pass,
    // no scale column needed at query time (only L2/dot would need it).
    val codes = spark.read.parquet(path)
      .select(col("vec_id"), expr("transform(qcode, c -> CAST(c AS DOUBLE))").as("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    topkPerQuery(scoreAll(codes, queries, "cosine"), "cosine", k)
  }

  def sq8SearchOracle(k: Int = 10, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |m AS (SELECT vec_id, v, list_max([abs(x) for x in v]) AS maxabs FROM e),
       |z AS (SELECT vec_id, [floor(x * (127.0 / maxabs) + 0.5) for x in v] AS q
       |      FROM m WHERE maxabs > 0),
       |qs AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |s AS (SELECT qs.qid, z.vec_id, list_cosine_similarity(z.q, qs.qvec) AS score
       |      FROM z CROSS JOIN qs),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v35: 1-bit binary quantization + Hamming candidate scan + exact
    * rerank — the FAISS `IndexBinaryFlat`(+refine) shape, and the last rung
    * of the quantization ladder here (SQ8 4×, PQ ~32×, binary 32× with
    * integer-only scan math). Each 64-dim float vector packs to two 32-bit
    * sign words (`bit i = x_i > 0`); candidate generation scans ONLY those
    * two BIGINT columns — at 100 TB that is a 32× I/O cut over the float
    * scan, and the per-pair work is two XOR+popcount instructions, all
    * inside whole-stage codegen (no float math until the rerank). Top-`r`
    * by Hamming per query (TopK partial agg — r rows/query cross the
    * shuffle), then [[exactRefine]] re-scores the Q·r survivors against the
    * raw vectors for the exact cosine top-k, the same refine join v18b/v19
    * use. Two 32-bit words, not one 64-bit word: bit 63 would need
    * `1<<63`, which overflows DuckDB's checked BIGINT arithmetic — 32-bit
    * words keep the pack a plain integer sum in both engines.
    * (reference: the binary-quantized analog of app/core/indexes/flat.py's
    * linear scan; candidate/refine split as in ivf.py's probe+rescore.) */
  def binaryHammingSearch(spark: SparkSession, dir: String, k: Int = 10,
                          r: Int = 40, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val packed = emb.select(col("vec_id"),
      signWordExpr("embedding", 0).as("w0"), signWordExpr("embedding", 1).as("w1"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = packed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
    // negated Hamming so "largest first" ranks nearest; ties → smaller id
    // in both the TopK buffer and the oracle's (ham, vec_id) row_number.
    val approx = packed.crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
    exactRefine(approx, emb, queries, "cosine", r, k)
  }

  /** v16g: metadata filter on the BINARY family — completes the
    * filter × index-family matrix over the new index (flat v16, IVF
    * v16b, LSH v16c, free-form v16d/e, trained v16f). The label
    * predicate restricts CANDIDATES (never queries, the family
    * convention) and sits under the pack projection, so it reaches the
    * parquet scan as a pushed filter — at 100 TB a label-filtered binary
    * search reads only matching row groups AND only their sign words. */
  def filteredBinarySearch(spark: SparkSession, dir: String, labels: Seq[Int] = Seq(2, 5),
                           k: Int = 10, r: Int = 40, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val all = Tables.embeddings(spark, dir)
    val emb = all.select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = queries.select(col("qid"),
      signWordExpr("qvec", 0).as("qw0"), signWordExpr("qvec", 1).as("qw1"))
    val packedCand = all.filter(col("label").isin(labels: _*))
      .select(col("vec_id"),
        signWordExpr("embedding", 0).as("w0"), signWordExpr("embedding", 1).as("w1"))
    val approx = packedCand.crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
    exactRefine(approx, emb, queries, "cosine", r, k)
  }

  def filteredBinarySearchOracle(labels: Seq[Int] = Seq(2, 5), k: Int = 10,
                                 r: Int = 40, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id,
       |             list_sum([CASE WHEN v[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w0,
       |             list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w1
       |      FROM e),
       |pc AS (SELECT p.* FROM p JOIN embeddings raw ON p.vec_id = raw.vec_id
       |       WHERE raw.label IN (${labels.mkString(", ")})),
       |q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM p WHERE vec_id < $nQueries),
       |h AS (SELECT q.qid, pc.vec_id,
       |             bit_count(xor(pc.w0, q.qw0)) + bit_count(xor(pc.w1, q.qw1)) AS ham
       |      FROM pc CROSS JOIN q),
       |c AS (SELECT qid, vec_id,
       |             row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS hrank
       |      FROM h),
       |qs AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |s AS (SELECT c.qid, c.vec_id, list_cosine_similarity(e.v, qs.qvec) AS score
       |      FROM c JOIN e USING (vec_id) JOIN qs USING (qid) WHERE c.hrank <= $r),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v39: v35 served for the EXTERNAL query workload table (the v26–v33
    * convention, kept complete for the binary family): query sign-words
    * are computed from the workload's raw float vectors — exactly what an
    * external query file provides — and the corpus-side plan is v35's
    * unchanged. */
  def workloadBinarySearch(spark: SparkSession, dir: String, k: Int = 10,
                           r: Int = 40): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = queryTable(spark, dir)
    val qwords = queries.select(col("qid"),
      signWordExpr("qvec", 0).as("qw0"), signWordExpr("qvec", 1).as("qw1"))
    val packed = emb.select(col("vec_id"),
      signWordExpr("embedding", 0).as("w0"), signWordExpr("embedding", 1).as("w1"))
    val approx = packed.crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
    exactRefine(approx, emb, queries, "cosine", r, k)
  }

  def workloadBinarySearchOracle(k: Int = 10, r: Int = 40): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id,
       |             list_sum([CASE WHEN v[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w0,
       |             list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w1
       |      FROM e),
       |q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM p WHERE ${workloadPredSql()}),
       |h AS (SELECT q.qid, p.vec_id,
       |             bit_count(xor(p.w0, q.qw0)) + bit_count(xor(p.w1, q.qw1)) AS ham
       |      FROM p CROSS JOIN q),
       |c AS (SELECT qid, vec_id,
       |             row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS hrank
       |      FROM h),
       |qs AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE ${workloadPredSql()}),
       |s AS (SELECT c.qid, c.vec_id, list_cosine_similarity(e.v, qs.qvec) AS score
       |      FROM c JOIN e USING (vec_id) JOIN qs USING (qid) WHERE c.hrank <= $r),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** v40: the refine-depth TUNING CURVE for the binary index — v34's
    * nprobe sweep applied to the binary family's one knob: recall@k of
    * (Hamming top-`r` → exact rerank) against flat exact top-k, for
    * r ∈ {10, 20, 40, 80}. Pack once (checkpointed — all four arms share
    * it); each arm costs one TopK pass over the packed words, never a
    * re-pack. Recall is monotone in `r` by construction (candidate sets
    * nest — spec-asserted), and the curve itself hash-gates because the
    * hit overlap is exact integers. This is the measurement a production
    * store runs to pick `r`: the knee of this curve is the whole
    * latency/recall tradeoff of binary-with-refine. */
  def refineSweep(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8,
                  rList: Seq[Int] = Seq(10, 20, 40, 80)): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val packed = emb.select(col("vec_id"),
        signWordExpr("embedding", 0).as("w0"), signWordExpr("embedding", 1).as("w1"))
      .localCheckpoint() // four arms share the pack
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qwords = packed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
    val approx = packed.crossJoin(broadcast(qwords))
      .withColumn("score",
        -(expr("bit_count(w0 ^ qw0) + bit_count(w1 ^ qw1)").cast("double")))
    val exact = flatSearch(spark, dir, "cosine", k, nQueries)
      .select(col("qid"), col("vec_id"))
    val denom = (nQueries * k).toLong
    rList.sorted.map { r =>
      val got = exactRefine(approx, emb, queries, "cosine", r, k)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      exact.join(got, Seq("qid", "vec_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(lit(r.toLong).as("refine"), col("hits"),
          lit(denom).as("n_considered"),
          floor(col("hits").cast("double") / lit(denom.toDouble) * 10000d + 0.5d)
            .cast("long").as("recall_q4"))
    }.reduce(_ unionByName _).orderBy("refine")
  }

  def refineSweepOracle(k: Int = 10, nQueries: Int = 8,
                        rList: Seq[Int] = Seq(10, 20, 40, 80)): String =
    rList.sorted.map { r =>
      s"""SELECT $r::BIGINT AS refine, sum(hit)::BIGINT AS hits,
         |       ${nQueries * k}::BIGINT AS n_considered,
         |       floor(sum(hit)::DOUBLE / ${(nQueries * k).toDouble} * 10000 + 0.5)::BIGINT AS recall_q4
         |FROM (
         |  SELECT x.qid, x.vec_id, CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM (${oracleFlat("cosine", k, nQueries)}) x
         |  LEFT JOIN (${binaryHammingSearchOracle(k, r, nQueries)}) a
         |    ON x.qid = a.qid AND x.vec_id = a.vec_id) h""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY refine")

  /** 32-bit sign word `w` of an `array<float>` column: bit i set iff
    * element `32·w + i` (0-based) is > 0; elements past the array end
    * contribute 0 (element_at → NULL → CASE else). Distinct powers of two
    * summed = bitwise OR, and every partial sum < 2³² — no overflow in
    * either engine's checked arithmetic. */
  private[graft] def signWordExpr(embCol: String, w: Int): org.apache.spark.sql.Column = expr(
    s"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
      s"(CASE WHEN element_at($embCol, ${w * 32} + i + 1) > CAST(0.0 AS FLOAT) " +
      s"THEN shiftleft(1L, i) ELSE 0L END))")

  def binaryHammingSearchOracle(k: Int = 10, r: Int = 40, nQueries: Int = 8): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id,
       |             list_sum([CASE WHEN v[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w0,
       |             list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END
       |                       for i in generate_series(0, 31)])::BIGINT AS w1
       |      FROM e),
       |q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM p WHERE vec_id < $nQueries),
       |h AS (SELECT q.qid, p.vec_id,
       |             bit_count(xor(p.w0, q.qw0)) + bit_count(xor(p.w1, q.qw1)) AS ham
       |      FROM p CROSS JOIN q),
       |c AS (SELECT qid, vec_id,
       |             row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS hrank
       |      FROM h),
       |qs AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < $nQueries),
       |s AS (SELECT c.qid, c.vec_id, list_cosine_similarity(e.v, qs.qvec) AS score
       |      FROM c JOIN e USING (vec_id) JOIN qs USING (qid) WHERE c.hrank <= $r),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** kNN join: every vector in `data` (id < limit) gets its top-k neighbors
    * from the full table, excluding itself. */
  def knnJoin(spark: SparkSession, dir: String, metric: String = "cosine",
              k: Int = 5, limit: Int = 200): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < limit)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = scoreAll(emb, queries, metric).filter(col("vec_id") =!= col("qid"))
    topkPerQuery(scored, metric, k)
  }

  /** Score column for `embedding` vs `qvec` under `metric`. */
  private[graft] def metricCol(metric: String): org.apache.spark.sql.Column = metric match {
    case "cosine" => Graft.cosine(col("embedding"), col("qvec"))
    case "l2" => Graft.l2(col("embedding"), col("qvec"))
    case "dot" => Graft.dot(col("embedding"), col("qvec"))
    case "manhattan" => Graft.manhattan(col("embedding"), col("qvec"))
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** Cross-score `data` rows against broadcast `queries`. */
  private[graft] def scoreAll(data: DataFrame, queries: DataFrame, metric: String): DataFrame =
    data.crossJoin(broadcast(queries)).withColumn("score", metricCol(metric))

  /** v22: Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    * — diversified retrieval: greedily pick the candidate maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`, the standard answer to
    * near-duplicate hits crowding a result page (or a RAG context window).
    *
    * Split by cost: candidate generation is the DISTRIBUTED part (the v1
    * top-C TopK partial agg over the corpus, then one C×C-per-query join
    * for the candidate–candidate similarities); the greedy selection is
    * inherently sequential in k, so it runs on the driver over the
    * collected Q×C rels + Q×C² sims — BOUNDED state (≤ Q·C² doubles,
    * independent of corpus size), the same class as the centroid
    * collects. rel and sim are rounded to 4dp BEFORE selection so both
    * engines run the greedy on bit-identical inputs (ties → lowest
    * vec_id); the DuckDB oracle unrolls the k picks as CTEs, the v8
    * Lloyd's-unroll recipe. */
  def mmrRerank(spark: SparkSession, dir: String, k: Int = 10, c: Int = 32,
                lam: Double = 0.7, nQueries: Int = 8): DataFrame = {
    Graft.init(spark)
    val pen = 1.0 - lam
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // top-C candidates (rel already rounded 4dp by topkPerQuery);
    // referenced three times below — materialize once
    val cand = topkPerQuery(scoreAll(emb, queries, "cosine"), "cosine", c)
      .select(col("qid"), col("vec_id"), col("score").as("rel"))
      .localCheckpoint()
    val ce = cand.join(emb, Seq("vec_id"))
    val sims = ce.select(col("qid"), col("vec_id").as("a"), col("embedding").as("ea"))
      .join(ce.select(col("qid"), col("vec_id").as("b"), col("embedding").as("eb")), Seq("qid"))
      .filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        round(Graft.cosine(col("ea"), col("eb")), 4).as("s"))

    val relByQ = cand.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("rel")))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(t => (t._2, t._3)).sortBy(_._1) }
    val simByQ = sims.collect()
      .map(r => ((r.getAs[Long]("qid"), r.getAs[Long]("a"), r.getAs[Long]("b")), r.getAs[Double]("s")))
      .toMap

    val picks = relByQ.toSeq.sortBy(_._1).flatMap { case (qid, cands) =>
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      (1 to math.min(k, cands.size)).map { rank =>
        var bestVec = -1L
        var bestMmr = Double.NegativeInfinity
        cands.foreach { case (vec, rel) =>
          if (!selected.contains(vec)) {
            val mmr =
              if (selected.isEmpty) lam * rel
              else lam * rel - pen * selected.map(s => simByQ((qid, vec, s))).max
            if (mmr > bestMmr) { bestMmr = mmr; bestVec = vec } // ties → first in vec-asc order
          }
        }
        selected += bestVec
        (qid, rank.toLong, bestVec, bestMmr)
      }
    }
    import spark.implicits._
    picks.toDF("qid", "rank", "vec_id", "mmr_raw")
      .select(col("qid"), col("rank"), col("vec_id"), round(col("mmr_raw"), 4).as("mmr"))
      .orderBy("qid", "rank")
  }

  def mmrRerankOracle(k: Int = 10, c: Int = 32, lam: Double = 0.7, nQueries: Int = 8): String = {
    val pen = 1.0 - lam
    val iters = (2 to k).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT c.qid, c.vec_id, $lam * c.rel - $pen * max(s.s) AS mmr
         |  FROM cand c
         |  JOIN sims s ON s.qid = c.qid AND s.a = c.vec_id
         |  JOIN acc${i - 1} p ON p.qid = s.qid AND p.vec_id = s.b
         |  LEFT JOIN acc${i - 1} x ON x.qid = c.qid AND x.vec_id = c.vec_id
         |  WHERE x.vec_id IS NULL
         |  GROUP BY c.qid, c.vec_id, c.rel),
         |sel$i AS (SELECT qid, vec_id, mmr, ${i}::BIGINT AS rank FROM (
         |  SELECT qid, vec_id, mmr,
         |         row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rn FROM m$i)
         |  WHERE rn = 1),
         |acc$i AS (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |sc AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |       FROM embeddings e CROSS JOIN q),
       |cand AS MATERIALIZED (SELECT qid, vec_id, round(score, 4) AS rel FROM (
       |  SELECT qid, vec_id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn FROM sc)
       |  WHERE rn <= $c),
       |sims AS MATERIALIZED (
       |  SELECT a.qid, a.vec_id AS a, b.vec_id AS b,
       |         round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |sel1 AS (SELECT qid, vec_id, $lam * rel AS mmr, 1::BIGINT AS rank FROM (
       |  SELECT qid, vec_id, rel,
       |         row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn FROM cand)
       |  WHERE rn = 1),
       |acc1 AS (SELECT * FROM sel1),
       |$iters
       |SELECT qid, rank, vec_id, round(mmr, 4) AS mmr FROM acc$k ORDER BY qid, rank""".stripMargin
  }

  /** Exact re-rank of an approximate scorer's output (the FAISS
    * IndexRefineFlat shape, shared by v18b and v19): keep the approx top
    * `refine` ids per query, re-score them against the RAW vectors, ship
    * the exact top-k. Costs a Q×refine broadcast point-lookup — the
    * compressed scan did the corpus pass. */
  private[graft] def exactRefine(approx: DataFrame, emb: DataFrame, queries: DataFrame,
                                 metric: String, refine: Int, k: Int): DataFrame = {
    val cand = topkPerQuery(approx, metric, refine).select(col("qid"), col("vec_id"))
    val exact = cand
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("vec_id"), metricCol(metric).as("score"))
    topkPerQuery(exact, metric, k)
  }

  /** smallestFirst for distance metrics, largest for similarities. */
  private[graft] def smallestFirst(metric: String): Boolean = metric match {
    case "l2" | "manhattan" => true
    case _ => false
  }

  /** Reduce scored rows (qid, vec_id, score) to ranked top-k per query. */
  private[graft] def topkPerQuery(scored: DataFrame, metric: String, k: Int,
                                      idCol: String = "vec_id", outId: String = "vec_id"): DataFrame = {
    scored
      .groupBy(col("qid"))
      .agg(Graft.topk(col("score"), col(idCol), lit(k), lit(smallestFirst(metric))).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(
        col("qid"),
        (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as(outId),
        round(col("r.score"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  /** v46: kNN MAJORITY-VOTE CLASSIFICATION — the vector engine serving as
    * a weak labeler: each query point takes the label its k nearest
    * (cosine) neighbors vote for, the workhorse of auto-labeling /
    * label-propagation passes over a training corpus (classify unlabeled
    * docs by their embedded neighbors; audit existing labels by whether
    * the neighborhood agrees). Self-match is EXCLUDED — voting for your
    * own label is the classic leak that makes every eval perfect.
    * Plan: the v1 scan-and-TopK partial-agg shape (corpus never
    * shuffled), then the Q·k winner rows broadcast back into one more
    * corpus scan to pick up neighbor labels, and the vote is a Q·L-row
    * aggregate — everything after the scan is bounded by queries ×
    * labels, not the corpus. Ties break deterministically: most votes,
    * then smallest label. `top_rank` (the best rank among the winning
    * label's voters) rides along as extra hash surface. */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 10,
                  nQueries: Int = 16): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = scoreAll(emb.select(col("vec_id"), col("embedding")), queries, "cosine")
      .filter(col("vec_id") =!= col("qid"))
    val top = topkPerQuery(scored, "cosine", k)
    val votes = emb.select(col("vec_id"), col("label"))
      .join(broadcast(top.select(col("qid"), col("rank"), col("vec_id"))), Seq("vec_id"))
      .groupBy(col("qid"), col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("top_rank"))
    val byVotes = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("n_votes").desc, col("label").asc)
    votes.withColumn("rn", row_number().over(byVotes)).filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("n_votes"), col("top_rank"))
      .orderBy("qid")
  }

  def knnClassifyOracle(k: Int = 10, nQueries: Int = 16): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM s),
       |t AS (SELECT qid, vec_id, rank FROM r WHERE rank <= $k),
       |v AS (SELECT t.qid, e.label::BIGINT AS label, count(*)::BIGINT AS n_votes,
       |             min(t.rank)::BIGINT AS top_rank
       |      FROM t JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
       |w AS (SELECT qid, label, n_votes, top_rank,
       |             row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS rn
       |      FROM v)
       |SELECT qid, label AS pred_label, n_votes, top_rank FROM w WHERE rn = 1 ORDER BY qid""".stripMargin

  /** Oracle SQL (DuckDB) mirroring [[flatSearch]] / [[knnJoin]]. */
  def oracleFlat(metric: String, k: Int = 10, nQueries: Int = 8,
                 excludeSelf: Boolean = false): String = {
    val (scoreExpr, ord) = metric match {
      case "cosine" => ("list_cosine_similarity(e.embedding::DOUBLE[], q.qvec)", "DESC")
      case "l2" => ("list_distance(e.embedding::DOUBLE[], q.qvec)", "ASC")
      case "dot" => ("list_inner_product(e.embedding::DOUBLE[], q.qvec)", "DESC")
      case "manhattan" =>
        ("list_sum([abs(e.embedding[i]::DOUBLE - q.qvec[i]) for i in generate_series(1, len(q.qvec))])::DOUBLE", "ASC")
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
    val selfFilter = if (excludeSelf) "WHERE e.vec_id <> q.qid" else ""
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id, $scoreExpr AS score FROM embeddings e CROSS JOIN q $selfFilter),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score $ord, vec_id) AS rank
       |      FROM s)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** v52: HARD-NEGATIVE MINING — the contrastive-training data step a
    * similarity stack exists to feed: for each query doc, the top-k most
    * similar docs that are NOT the doc itself and NOT its near-duplicates
    * (d7's CC cluster-mates). Plain kNN mines FALSE negatives — a near-dup
    * ranked #1 is the same content, and training against it as a negative
    * teaches the encoder to separate identical text; excluding the
    * cluster makes the mined set hard-but-genuinely-different, the
    * in-batch-negatives recipe every embedding finetune uses. Exclusion
    * is a doc-keyed LEFT join against the MEMOIZED label table (one
    * edge-sized read, the d25/d26 convention) with the query panel's ≤Q
    * labels broadcast — the scoring plan stays v1's single corpus scan.
    * At 100 TB the label table is the already-maintained dedup artifact;
    * the marginal cost of mining negatives over plain search is one
    * small join. */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 10,
                    nQueries: Int = 8, tau: Double = 0.5): DataFrame = {
    Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val labels = Dedup.clusterLabelsFor(spark, dir, tau)
    val qLabels = labels.select(col("id").as("qid"), col("label").as("qlab"))
      .filter(col("qid") < nQueries)
    val scored = scoreAll(emb, queries, "cosine")
      .filter(col("vec_id") =!= col("qid"))
      .join(labels.select(col("id").as("vec_id"), col("label").as("dlab")),
        Seq("vec_id"), "left")
      .join(broadcast(qLabels), Seq("qid"), "left")
      .filter(col("dlab").isNull || col("qlab").isNull || col("dlab") =!= col("qlab"))
      .select(col("qid"), col("vec_id"), col("score"))
    topkPerQuery(scored, "cosine", k)
  }

  def hardNegativesOracle(k: Int = 10, nQueries: Int = 8, tau: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM (${Dedup.minhashLshOracle(tau)})),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS id, least(src, min(dst)) AS label FROM reach GROUP BY src),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT q.qid, e.vec_id,
       |             list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
       |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
       |fs AS (SELECT s.qid, s.vec_id, s.score
       |       FROM s LEFT JOIN lab dl ON s.vec_id = dl.id
       |              LEFT JOIN lab ql ON s.qid = ql.id
       |       WHERE dl.label IS NULL OR ql.label IS NULL OR dl.label <> ql.label),
       |r AS (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM fs)
       |SELECT qid, rank, vec_id, round(score, 4) AS score FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
}
