package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text analysis for pipeline curation: language ID, quality scoring,
  * token counting, order-aware fingerprinting, global n-gram stats.
  *
  * All single-scan, shuffle-free per-document transforms (t1, t2, t3, t4)
  * or one partial-aggregated groupBy (t5) — shapes that hold unchanged at
  * 100 TB. Hashes use the same portable h60 as [[Dedup]].
  */
object Text {

  val StopWords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** t1: predicted language = arg-max stopword overlap (ties → lang asc).
    *
    * MAP-ONLY argmax: the four language arms are scored per row and the
    * winner picked by `sort_array` over 4 structs keyed `(-score, lang)` —
    * struct ordering is lexicographic by field position, so element 0 is
    * max-score with ties broken lang-ascending. The round-1..6 formulation
    * exploded the arms and ranked them with a `row_number` window
    * partitioned by doc_id — a full corpus shuffle (4N rows hashed, sorted,
    * filtered back to N) to compare 4 values that were sitting in the same
    * row. At 100 TB that shuffle was the whole cost; this plan touches the
    * corpus once in the scan task and shuffles nothing. */
  /** Per-language (−score, lang) structs over a distinct-token column —
    * shared by t1's argmax and t26's margin (sort ascending ⇒ index 0 is
    * the winner, index 1 the runner-up; ties break to the smaller lang
    * name, mirroring the oracle's `ORDER BY score DESC, lang`). */
  private def langArms: Seq[Column] =
    StopWords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (-size(array_intersect(col("toks"), array(words.map(lit): _*)))).cast("long").as("neg"),
        lit(lang).as("lang"))
    }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    // no fanOut (r17, measured): the stopword arms are array_intersect
    // over short distinct-token lists — the shuffle cost exceeded the
    // single-core compute at sf0.1 (0.40→0.43 fanned; reverted)
    Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("best", sort_array(array(langArms: _*))(0))
      .select(col("doc_id"), col("best.lang").as("pred_lang"),
        (-col("best.neg")).cast("long").as("score"))
      .orderBy("doc_id")
  }

  /** t26: language-ID CONFIDENCE margin — the screen that decides which
    * docs trust their cheap n-gram language call and which route to a
    * heavier model or get dropped (CLD/fastText deployments threshold on
    * exactly this): margin = top1 − top2 stopword-hit score, exact
    * integers end to end, `confident` at margin ≥ `minMargin` (default 1: the synthetic word-salad corpus tops out at margin 1 — margin 0 IS the ambiguous class here, 22% of docs; a natural corpus would raise the bar). Same
    * one-scan map-only shape as t1 — the runner-up falls out of the
    * already-sorted arm array at index 1 for free. */
  def langIdMargin(spark: SparkSession, dir: String, minMargin: Long = 1L): DataFrame = {
    // no fanOut — same measured call as t1, see [[langId]]
    Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("sorted", sort_array(array(langArms: _*)))
      .select(col("doc_id"),
        col("sorted")(0).getField("lang").as("pred_lang"),
        (-col("sorted")(0).getField("neg")).cast("long").as("score"),
        (col("sorted")(1).getField("neg") - col("sorted")(0).getField("neg"))
          .cast("long").as("margin"))
      .withColumn("confident", col("margin") >= minMargin)
      .orderBy("doc_id")
  }

  def langIdMarginOracle(minMargin: Long = 1L): String = {
    val arms = StopWords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"SELECT doc_id, '$lang' AS lang, len(list_intersect(toks, [$list]))::BIGINT AS score FROM t"
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
       |s AS ($arms),
       |r AS (SELECT doc_id, lang, score,
       |             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM s)
       |SELECT a.doc_id, a.lang AS pred_lang, a.score,
       |       (a.score - b.score)::BIGINT AS margin,
       |       (a.score - b.score) >= $minMargin AS confident
       |FROM r a JOIN r b ON a.doc_id = b.doc_id AND b.rn = 2
       |WHERE a.rn = 1 ORDER BY a.doc_id""".stripMargin
  }

  val langIdOracle: String = {
    val arms = StopWords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"SELECT doc_id, '$lang' AS lang, len(list_intersect(toks, [$list]))::BIGINT AS score FROM t"
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
       |s AS ($arms),
       |r AS (SELECT doc_id, lang, score,
       |             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM s)
       |SELECT doc_id, lang AS pred_lang, score FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** t2: quality metrics + a weighted score. Tokenizes ONCE (`w`, then
    * `uw = array_distinct(w)`) and reuses the attributes — the round-1
    * formulation repeated `split(text,' ')` in four expressions, which
    * whole-stage codegen does not always CSE away once array_intersect &
    * friends enter the tree (same lesson as the d3/t4/t5 shingle rewrite). */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    qualityFrame(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        col("n_tok"),
        col("n_uniq"),
        col("u_raw").as("uniq_ratio"),
        col("c_raw").as("chars_per_tok"),
        col("s_raw").as("stop_ratio"),
        col("quality"))
      .orderBy("doc_id")
  }

  /** The quality metrics over any documents frame, keeping the input
    * columns — the single source of the formula, shared by t2 and the f1
    * composite pipeline. Tokenizes ONCE and reuses the projected arrays. */
  private[graft] def qualityFrame(docs: DataFrame): DataFrame = {
    // NO fanOut here (r17, measured): the quality math is one split + two
    // array ops per doc — too cheap to pay a shuffle for; fanning this
    // out cost +2.1 s summed across its consumers (t2/f1/f10/f11) at
    // sf0.1. The md5-per-token operators keep it (t4/t13/t15, d10).
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("uw", array_distinct(col("w")))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_uniq", size(col("uw")).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(col("uw"),
          array(StopWords.values.flatten.toSeq.distinct.sorted.map(lit): _*))).cast("long"))
      // raw (unrounded) ratios feed the quality formula — rounding
      // intermediates would park sums exactly on round-half boundaries,
      // where Spark and DuckDB round() disagree
      .withColumn("u_raw", col("n_uniq").cast("double") / col("n_tok").cast("double"))
      .withColumn("c_raw", length(col("text")).cast("double") / col("n_tok").cast("double"))
      .withColumn("s_raw", col("stop_hits").cast("double") / col("n_uniq").cast("double"))
      .withColumn("quality",
        lit(0.5) * col("u_raw") + lit(0.3) * least(col("c_raw") / 10.0, lit(1.0))
          + lit(0.2) * col("s_raw"))
      .drop("w", "uw")
  }

  val qualityOracle: String = {
    val allStops = StopWords.values.flatten.toSeq.distinct.sorted.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         len(string_split(text, ' '))::BIGINT AS n_tok,
       |         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq,
       |         len(list_intersect(list_distinct(string_split(text, ' ')), [$allStops]))::BIGINT AS stop_hits
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, n_tok, n_uniq,
       |         n_uniq::DOUBLE / n_tok::DOUBLE AS u_raw,
       |         length(text)::DOUBLE / n_tok::DOUBLE AS c_raw,
       |         stop_hits::DOUBLE / n_uniq::DOUBLE AS s_raw
       |  FROM t)
       |SELECT doc_id, n_tok, n_uniq,
       |       u_raw AS uniq_ratio,
       |       c_raw AS chars_per_tok,
       |       s_raw AS stop_ratio,
       |       0.5 * u_raw + 0.3 * least(c_raw / 10.0, 1.0) + 0.2 * s_raw AS quality
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** t3: whitespace + BPE-ish regex token counts. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)")).cast("long").as("re_tokens"),
        col("n_chars"))
      .withColumn("chars_per_tok", col("n_chars").cast("double") / col("ws_tokens").cast("double"))
      .orderBy("doc_id")
  }

  val tokenCountOracle: String =
    """SELECT doc_id,
      |       len(string_split(text, ' '))::BIGINT AS ws_tokens,
      |       len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS re_tokens,
      |       n_chars,
      |       n_chars::DOUBLE / len(string_split(text, ' '))::DOUBLE AS chars_per_tok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t4: order-aware polynomial fingerprint
    * f = Σ_i (h60(tok_i) mod P) · ((A·i + B) mod P) mod P  (i is 1-based;
    * position mix is linear so the arithmetic stays exact in int64). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val P = Dedup.P
    val (a, b) = (1103515245L % P, 12345L)
    // explode + partial-agg sum instead of a HOF fold: the per-token md5
    // then runs codegen'd (HOF lambdas are interpreted), the modular sum is
    // commutative-exact, and the shuffle carries one partial per doc.
    // fanOut (r17, guide §2.5): the one-row-group corpus otherwise runs
    // the per-token md5 on a single core; int64 sums are order-independent,
    // so partitioning cannot move the fingerprint.
    Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "t")))
      .select(col("doc_id"),
        ((Dedup.h60(col("t")) % P) * ((lit(a) * (col("i") + 1L) + b) % P) % P).as("term"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % P).as("fingerprint"))
      .orderBy("doc_id")
  }

  val fingerprintOracle: String = {
    val P = Dedup.P
    val (a, b) = (1103515245L % P, 12345L)
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |SELECT doc_id,
       |       list_sum([ (CAST('0x' || substr(md5(w[i]), 1, 15) AS BIGINT) % $P)
       |                  * (($a * i + $b) % $P) % $P
       |                  for i in generate_series(1, len(w)) ])::BIGINT % $P AS fingerprint
       |FROM w ORDER BY doc_id""".stripMargin
  }

  /** The t6 split-assignment rule for any doc-id column — 80/10/10 on
    * `h60("split:" + id) mod 100`. A PURE function of the id (no join, no
    * RNG state), which is what lets d12 project split labels straight onto
    * an edge list. Single source shared by t6 and d12; [[splitLabelSql]]
    * is its DuckDB twin. */
  private[graft] def splitLabel(docId: Column): Column = {
    val bucket = Dedup.h60(concat(lit("split:"), docId.cast("string"))) % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  private[graft] def splitLabelSql(idExpr: String): String = {
    val bucket =
      s"CAST('0x' || substr(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 15) AS BIGINT) % 100"
    s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"
  }

  /** t6: deterministic train/val/test split by content-stable hash —
    * 80/10/10 on `h60("split:" + doc_id) mod 100`. Hash-based assignment
    * is the scale-correct split: reproducible under any partitioning,
    * stable across reruns and appends, no global sort or RNG state. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("split", splitLabel(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("split", "lang")
  }

  val datasetSplitOracle: String =
    """WITH b AS (
      |  SELECT *, CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |s AS (SELECT lang, doc_id,
      |             CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |      FROM b)
      |SELECT split, lang, count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin

  /** t5: global top-20 bigrams (count desc, bigram asc — fully ordered). */
  def topNgrams(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("w")) // tokenize once, then index
      .select(explode(expr(
        "CASE WHEN size(w) < 2 THEN array() ELSE transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) END")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(topN)
  }

  def topNgramsOracle(topN: Int = 20): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |b AS (SELECT unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)]) AS bigram FROM w)
       |SELECT bigram, count(*) AS cnt FROM b GROUP BY bigram
       |ORDER BY cnt DESC, bigram LIMIT $topN""".stripMargin

  /** t7: per-document top-k terms by TF-IDF (tf · ln(N/df)). One tokenize
    * pass feeds the tf aggregate; df comes from the persisted
    * [[vocabIndex]] artifact. The term join carries NO broadcast hint —
    * word vocabularies are heavy-tailed and unbounded (t20's design note,
    * the same artifact), so at 100 TB the join clusters on the artifact's
    * `term` bucket spec with no artifact-side exchange, while at test
    * scale AQE freely converts the small side to broadcast. N arrives as
    * a broadcast 1-row aggregate, never a driver-side count. Ranks on the
    * raw double (exact ties break by term in both engines); only the
    * OUTPUT is rounded. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df comes from the persisted vocabulary-stats artifact ([[vocabIndex]])
    // — the production shape this query's earlier in-flight df aggregate
    // only approximated (and the reason deriving df from tf was rejected:
    // column pruning rewrites the shared subtree so AQE never reuses the
    // exchange, while df-as-window-over-term concentrates every doc
    // containing a stopword into one partition — skew at scale).
    val dfreq = vocabIndex(spark, dir)
    val nDf = docs.agg(count(lit(1)).as("n"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", col("tf") * log(col("n").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(byDoc).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("tfidf"), 4).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsOracle(k: Int = 3): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |s AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n::DOUBLE / df.df::DOUBLE) AS tfidf
       |      FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT doc_id, term, tfidf,
       |             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
       |      FROM s)
       |SELECT doc_id, rank, term, round(tfidf, 4) AS tfidf
       |FROM r WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** The PERSISTED word-vocabulary-stats table — (term, document
    * frequency), bucketed+sorted by `term` — the artifact t7's comment
    * promised ("in a production corpus df comes from a persisted
    * vocabulary-stats table") and the word-level analog of
    * [[Dedup.shingleIndex]]. Word vocabularies are heavy-tailed and
    * unbounded (unlike t19's charset²-capped char-bigram table), so at
    * 100 TB this is a real table, not a broadcast dim: bucketing by
    * `term` means every term-keyed consumer (t7's tf·idf join, t20's
    * familiarity join) reads it pre-clustered on the join key with zero
    * artifact-side exchange. Built once per (session, corpus); the name
    * carries a corpus-dir fingerprint so the bench's dual-SF pass can
    * never cross-read. */
  private val vocabIndexCache =
    new BoundedMemo[(SparkSession, String), DataFrame](4)(_ => ())

  private[operators] def vocabIndex(spark: SparkSession, dir: String): DataFrame =
    vocabIndexCache.getOrElseUpdate((spark, dir)) {
      val table = "graft_idx_vocab_" +
        java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
      val tok = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      Persist.materializeBucketed(spark,
        tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df")),
        table, 8, Seq("term"))
    }

  /** t20: WORD-level familiarity — t19's cheap-LM quality signal moved
    * from character bigrams to the word vocabulary: each document scores
    * the mean corpus document-frequency of its distinct terms (normalized
    * by corpus size → (0, 1]), so domain-jargon/gibberish/wrong-corpus
    * documents surface as unfamiliar. Exactly t19's exact-integer recipe
    * (df sums and counts; one rounded division at the output), but the df
    * side is the persisted [[vocabIndex]] artifact rather than an
    * in-flight aggregate — the term join carries NO broadcast hint on
    * purpose: the artifact is bucketed by `term`, so at scale the join
    * clusters on the bucket spec with no artifact-side exchange, while at
    * test scale AQE freely converts the small side to broadcast. */
  def wordFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val dt = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
    dt.join(vocabIndex(spark, dir), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("df_sum"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      // fixed-point 4-dp quantization, NOT round(): the corpus lands a doc
      // exactly on a .xxxx5 representation edge where the two engines'
      // decimal-rounding paths disagree by 1 ulp (the v20 lesson —
      // floor(x·10⁴+0.5) is the same IEEE sequence in both engines)
      .select(col("doc_id"), col("n_terms"),
        floor(col("df_sum").cast("double") /
          (col("n_terms") * col("n_docs")).cast("double") * 10000d + 0.5d)
          .cast("long").as("familiarity_q4"))
      .orderBy("doc_id")
  }

  val wordFamiliarityOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |dt AS (SELECT DISTINCT doc_id, term FROM tok),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT dt.doc_id, count(*) AS n_terms, sum(df.df)::BIGINT AS df_sum
      |      FROM dt JOIN df USING (term) GROUP BY dt.doc_id)
      |SELECT doc_id, n_terms::BIGINT AS n_terms,
      |       floor(df_sum::DOUBLE / (n_terms * n.n_docs)::DOUBLE * 10000 + 0.5)::BIGINT AS familiarity_q4
      |FROM s CROSS JOIN n ORDER BY doc_id""".stripMargin

  /** t8: deterministic per-language stratified sample — keep a document iff
    * `h60("sample:" + doc_id) mod 1000 < rate(lang)` (permille rates;
    * over-represented `en` down-sampled to rebalance the corpus). Hash-
    * gated sampling is the scale-correct sampler: map-only (a pushed-down
    * filter, zero shuffles before the output sort), exactly reproducible
    * under any partitioning, and append-stable — re-running after new data
    * arrives never flips a previous keep/drop decision, unlike `RAND()` or
    * `TABLESAMPLE`. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       rates: Map[String, Int] = Map(
                         "en" -> 300, "de" -> 600, "es" -> 600, "fr" -> 600, "zh" -> 600)): DataFrame = {
    val bucket = Dedup.h60(concat(lit("sample:"), col("doc_id").cast("string"))) % 1000
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0): Column) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  /** t9: fixed-window token chunking with overlap — the reference's
    * Document ⊃ Chunk data model (models.py Chunk) as a batch operator:
    * `window`-token windows every `stride` tokens (tail window may be
    * short; a doc shorter than one window is one chunk). Map-only: one
    * tokenize, one explode — no shuffle before the output sort. Emits the
    * chunk's portable h60 fingerprint rather than the text itself (the
    * downstream embed/index steps key on it; at 100 TB the chunk text
    * stays columnar-compressed in place, only ids and hashes move). */
  def chunkText(spark: SparkSession, dir: String, window: Int = 64, stride: Int = 48): DataFrame = {
    chunkFrame(Tables.documents(spark, dir), window, stride)
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("cw")).cast("long").as("chunk_tok"),
        Dedup.h60(array_join(col("cw"), " ")).as("chunk_h"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** (doc_id, chunk_idx, cw): the token windows of every document —
    * shared by t9 and the f3 ingest pipeline. */
  private[graft] def chunkFrame(docs: DataFrame, window: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_chunks", expr(
        s"CASE WHEN n_tok <= $window THEN 1L ELSE ((n_tok - $window + ${stride - 1}) div $stride) + 1 END"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .withColumn("cw", slice(col("w"), (col("chunk_idx") * stride + 1).cast("int"), lit(window)))
      .select(col("doc_id"), col("chunk_idx"), col("cw"))

  def chunkTextOracle(window: Int = 64, stride: Int = 48): String =
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
       |s AS (SELECT doc_id, chunk_idx,
       |             w[(chunk_idx * $stride + 1):(chunk_idx * $stride + $window)] AS cw
       |      FROM x)
       |SELECT doc_id, chunk_idx, len(cw)::BIGINT AS chunk_tok,
       |       CAST('0x' || substr(md5(array_to_string(cw, ' ')), 1, 15) AS BIGINT) AS chunk_h
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  /** t10: text normalization — the canonical pre-dedup/pre-tokenize clean
    * pass of an ingestion pipeline: lowercase, collapse whitespace runs to
    * one space, trim. Map-only (the normalization sits directly on the
    * scan; zero shuffles before the output sort). Emits the normalized
    * fingerprint + before/after lengths rather than the full text — at
    * 100 TB the cleaned text is written alongside as a column, only ids
    * and hashes move through the report. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("norm")).cast("long").as("n_chars_norm"),
        substring(col("norm"), 1, 40).as("prefix"),
        Dedup.h60(col("norm")).as("norm_h"))
      .orderBy("doc_id")

  val normalizeTextOracle: String =
    """WITH n AS (SELECT doc_id, text,
      |                  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |           FROM documents)
      |SELECT doc_id, length(text)::BIGINT AS n_chars_raw,
      |       length(norm)::BIGINT AS n_chars_norm,
      |       substr(norm, 1, 40) AS prefix,
      |       CAST('0x' || substr(md5(norm), 1, 15) AS BIGINT) AS norm_h
      |FROM n ORDER BY doc_id""".stripMargin

  /** The t17 scrub patterns, applied IN ORDER (email first — an address
    * contains dotted-digit runs the later patterns would shred; then IPv4,
    * whose dotted quads a phone pattern could partially eat; phone last).
    * Regex subset chosen to mean the same thing in Java regex (Spark) and
    * RE2 (DuckDB): character classes, bounded repetition, `\b` — no
    * lookaround, no backreferences. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** t17: PII redaction — the scrub pass every shareable training corpus
    * runs before anything else sees the text: emails, IPv4s and phone
    * numbers replaced by typed placeholder tokens, with per-doc counts of
    * what each stage removed. Map-only on the scan (zero shuffles before
    * the output sort); each stage counts its matches on the text AS IT
    * ENTERS that stage, so the counts sum to exactly the replacements made
    * and the whole chain replays as CTEs in the oracle. Emits the redacted
    * fingerprint + counts (t10's convention — ids and hashes move, not
    * text). The synthetic corpus contains no PII, so here the oracle gate
    * proves the two regex dialects agree that the rewrite is the identity;
    * the redaction semantics themselves are spec-gated on PII-laden docs
    * (`PiiSpec`). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactFrame(Tables.documents(spark, dir))

  /** The staged redaction chain over any (doc_id, text) frame — shared by
    * t17 (reference corpus), t17b (the PII-laden live corpus) and f4 (the
    * release pipeline, which carries `lang` through via `carry`). */
  private[graft] def piiRedactFrame(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val staged = PiiPatterns.foldLeft(docs.withColumn("t", col("text"))) {
      case (df, (name, pat, tok)) =>
        df.withColumn(s"n_$name", size(regexp_extract_all(col("t"), lit(pat), lit(0))).cast("long"))
          .withColumn("t", regexp_replace(col("t"), pat, tok))
    }
    staged.select(
      col("doc_id") +: PiiPatterns.map { case (n, _, _) => col(s"n_$n") } ++:
        carry.map(col) :+
        length(col("t")).cast("long").as("n_chars_redacted") :+
        Dedup.h60(col("t")).as("redacted_h"): _*)
      .orderBy("doc_id")
  }

  /** The staged-CTE oracle replay of [[piiRedactFrame]] over `src` (a table
    * name or CTE with (doc_id, text)); `withPrefix` lets callers prepend
    * their own corpus-defining CTEs to the WITH chain. */
  /** The redaction stage CTEs over `src` (one per pattern: count on the
    * incoming text, then rewrite) → (ctesText, lastCteName). Composable
    * into any larger WITH chain (f4's release pipeline). */
  private[operators] def piiStageCtes(src: String): (String, String) = {
    val stages = PiiPatterns.zipWithIndex.map { case ((name, pat, tok), i) =>
      val prev = if (i == 0) src else s"s${i - 1}"
      val prevCol = if (i == 0) "text" else "t"
      val carried = PiiPatterns.take(i).map { case (n, _, _) => s"n_$n, " }.mkString
      s"""s$i AS (SELECT doc_id, $carried
         |  len(regexp_extract_all($prevCol, '$pat'))::BIGINT AS n_$name,
         |  regexp_replace($prevCol, '$pat', '$tok', 'g') AS t FROM $prev)""".stripMargin
    }
    (stages.mkString(",\n"), s"s${PiiPatterns.size - 1}")
  }

  private def piiRedactOracleFrom(src: String, withPrefix: String = ""): String = {
    val (stages, last) = piiStageCtes(src)
    val ns = PiiPatterns.map { case (n, _, _) => s"n_$n" }.mkString(", ")
    s"""WITH $withPrefix$stages
       |SELECT doc_id, $ns, length(t)::BIGINT AS n_chars_redacted,
       |       CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS redacted_h
       |FROM $last ORDER BY doc_id""".stripMargin
  }

  val piiRedactOracle: String = piiRedactOracleFrom("documents")

  /** Size of the t17b synthetic PII corpus. */
  val PiiCorpusN: Long = 200L

  /** The t17b corpus: `PiiCorpusN` tickets whose text embeds synthetic
    * emails / IPv4s / phone numbers (both separators) by pure INTEGER
    * arithmetic on the row id — deterministic, engine-portable, and
    * replayable as a `generate_series` CTE by the DuckDB oracle. Roughly a
    * third of each kind is withheld (and every tenth doc carries a second
    * email) so the redaction counts vary per row: 0s, 1s and 2s all occur,
    * which is what makes the t17b gate non-vacuous. */
  private[graft] def piiCorpus(spark: SparkSession, n: Long = PiiCorpusN): DataFrame = {
    val i = col("id")
    def s(c: Column): Column = c.cast("string")
    def sep: Column = when(i % 2 === 0, "-").otherwise(".")
    val email = when(i % 3 =!= 2,
      concat(lit("user"), s(i), lit(".x"), s(i % 7), lit("@mail"), s(i % 5),
        lit(".example.com"))).otherwise("nobody")
    val cc = when(i % 10 === 0,
      concat(lit(" cc r"), s(i), lit("@a"), s(i % 3), lit(".net"))).otherwise("")
    val ip = when(i % 4 =!= 3,
      concat(lit("10."), s((i * 7) % 256), lit("."), s((i * 13) % 256), lit("."),
        s((i * 29) % 251))).otherwise("local")
    val phone = when(i % 5 =!= 4,
      concat(s(i % 900 + 100), sep, s((i * 3) % 800 + 200), sep, s((i * 17) % 9000 + 1000)))
      .otherwise("n/a")
    val text = concat(lit("Ticket "), s(i), lit(": contact "), email, cc,
      lit(" host "), ip, lit(" dial "), phone, lit(" end"))
    spark.range(0, n).select(
      col("id").as("doc_id"), text.as("text"),
      when(i % 2 === 0, "en").otherwise("de").as("lang"),
      lit("pii").as("source"), length(text).cast("long").as("n_chars"))
  }

  /** t17b: PII redaction gated on a corpus that actually CONTAINS PII —
    * t17's green row on the reference corpus only proves the two regex
    * dialects agree the rewrite is the identity (it has no PII to scrub).
    * Here the deterministic [[piiCorpus]] is written as JSON Lines (the
    * reference's ingest wire format), re-ingested through
    * [[Tables.documentsFromJson]]'s explicit-schema FAILFAST reader, and
    * scrubbed with the UNCHANGED [[piiRedactFrame]] chain — so the hash
    * the driver gates covers real replacements (nonzero n_email / n_ip /
    * n_phone on most rows) plus the full JSONL ingest plumbing. The
    * oracle regenerates the same corpus from `generate_series` and
    * replays the same chain: corpus construction and redaction are BOTH
    * independently recomputed, nothing flows Spark→oracle. Map-only on
    * the ingested scan, like t17. */
  def piiRedactLive(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_pii_jsonl"
    piiCorpus(spark).coalesce(1).write.mode("overwrite").json(path)
    piiRedactFrame(Tables.documentsFromJson(spark, path))
  }

  val piiRedactLiveOracle: String = {
    def s(x: String) = s"CAST($x AS VARCHAR)"
    val sep = "(CASE WHEN i % 2 = 0 THEN '-' ELSE '.' END)"
    val corpus =
      s"""pii AS (SELECT i AS doc_id,
         |  'Ticket ' || ${s("i")} || ': contact ' ||
         |  CASE WHEN i % 3 <> 2 THEN 'user' || ${s("i")} || '.x' || ${s("i % 7")} ||
         |       '@mail' || ${s("i % 5")} || '.example.com' ELSE 'nobody' END ||
         |  CASE WHEN i % 10 = 0 THEN ' cc r' || ${s("i")} || '@a' || ${s("i % 3")} ||
         |       '.net' ELSE '' END ||
         |  ' host ' ||
         |  CASE WHEN i % 4 <> 3 THEN '10.' || ${s("(i * 7) % 256")} || '.' ||
         |       ${s("(i * 13) % 256")} || '.' || ${s("(i * 29) % 251")} ELSE 'local' END ||
         |  ' dial ' ||
         |  CASE WHEN i % 5 <> 4 THEN ${s("i % 900 + 100")} || $sep ||
         |       ${s("(i * 3) % 800 + 200")} || $sep || ${s("(i * 17) % 9000 + 1000")}
         |       ELSE 'n/a' END ||
         |  ' end' AS text
         |FROM generate_series(0, ${PiiCorpusN - 1}) t(i)),
         |""".stripMargin
    piiRedactOracleFrom("pii", corpus)
  }

  /** t18: mixture rebalancing — downsample every language to the SMALLEST
    * language's size, the data-mixing step that turns a skewed crawl into
    * a balanced multilingual training mixture (this corpus is ~42% `en`;
    * the op cuts `en` ~3×, a real rebalance — `source` would be a no-op
    * here, it is uniform by construction). The acceptance test is pure
    * integer hashing: keep doc ⟺ `h60("mix:" + doc_id) mod n_lang <
    * n_target` — expected keep rate n_target/n_lang per language with NO
    * RNG state, reproducible under any partitioning and append-stable for
    * languages whose count hasn't changed (t6/t8/t14's design rule:
    * sampling decisions are pure functions of content). Two passes: a
    * per-language count agg (bounded by #langs — broadcast back), then a
    * map-only accept filter folded into one grouped report. At 100 TB the
    * counts come from table stats; the corpus sees one scan. Counts are
    * exact integers, so the report hash-gates; the kept-set SIZE is
    * hash-binomial around n_target, not exactly n_target — documented
    * behavior of threshold sampling, identical in both engines. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val target = counts.agg(min(col("n_docs")).as("n_target"))
    val rated = counts.crossJoin(broadcast(target))
    docs
      .join(broadcast(rated), Seq("lang"))
      .withColumn("keep",
        Dedup.h60(concat(lit("mix:"), col("doc_id").cast("string"))) % col("n_docs")
          < col("n_target"))
      .groupBy(col("lang"), col("n_docs"), col("n_target"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("keep"), col("doc_id"))).as("min_kept"),
        max(when(col("keep"), col("doc_id"))).as("max_kept"))
      .orderBy("lang")
  }

  val mixtureSampleOracle: String =
    """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT min(n_docs) AS n_target FROM c),
      |k AS (SELECT d.lang, d.doc_id, c.n_docs, t.n_target,
      |             (CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      |                % c.n_docs) < t.n_target AS keep
      |      FROM documents d JOIN c USING (lang) CROSS JOIN t)
      |SELECT lang, n_docs, n_target,
      |       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
      |       min(CASE WHEN keep THEN doc_id END) AS min_kept,
      |       max(CASE WHEN keep THEN doc_id END) AS max_kept
      |FROM k GROUP BY lang, n_docs, n_target ORDER BY lang""".stripMargin

  /** t19: character-bigram FAMILIARITY — the cheap language-model proxy
    * of CCNet-style quality filtering: gibberish, encoding mojibake and
    * non-linguistic blobs are exactly the documents whose character
    * patterns are RARE corpus-wide, so each doc is scored by the mean
    * corpus document-frequency of its distinct char bigrams (normalized
    * by corpus size → (0, 1]). A true LM perplexity needs log-sums whose
    * libm results are not bit-portable across engines; the frequency
    * form keeps the discriminating signal in EXACT integers (df sums /
    * counts), so it hash-gates with one rounded division.
    *
    * Scale shape: the bigram vocabulary is bounded by charset² — a few
    * thousand rows for any corpus size — so the df table is a TRUE
    * broadcast dim at 100 TB (unlike word vocabularies); the corpus
    * sees one explode scan and one doc-keyed partial agg. */
  def bigramFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // materialize the char-explode ONCE: both the df aggregate and the
    // score join consume it with different downstream partitionings, so
    // nothing dedups the subtree otherwise and the corpus-sized explode
    // runs twice (the d3/d4/t11 lesson; measured 1.9× on t19 at sf0.1).
    // The doc_id repartition gives the one-file test corpus parallel
    // explode tasks (the corpusShingles precedent).
    val bi = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "CASE WHEN length(text) < 2 THEN array() " +
            "ELSE transform(sequence(1, length(text) - 1), i -> substr(text, i, 2)) END"))).as("bg"))
      .localCheckpoint()
    val dfTab = bi.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    bi.join(broadcast(dfTab), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("df_sum"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("df_sum").cast("double") /
          (col("n_bigrams") * col("n_docs")).cast("double"), 4).as("familiarity"))
      .orderBy("doc_id")
  }

  val bigramFamiliarityOracle: String =
    """WITH b AS (SELECT doc_id,
      |                  unnest(list_distinct([substr(text, i, 2)
      |                                        for i in generate_series(1, length(text) - 1)])) AS bg
      |           FROM documents),
      |df AS (SELECT bg, count(*) AS df FROM b GROUP BY bg),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT b.doc_id, count(*) AS n_bigrams, sum(df.df)::BIGINT AS df_sum
      |      FROM b JOIN df USING (bg) GROUP BY b.doc_id)
      |SELECT doc_id, n_bigrams::BIGINT AS n_bigrams,
      |       round(df_sum::DOUBLE / (n_bigrams * n.n_docs)::DOUBLE, 4) AS familiarity
      |FROM s CROSS JOIN n ORDER BY doc_id""".stripMargin

  /** t11: BM25 top-k retrieval (Robertson/Spärck Jones; the ranking the
    * reference's text search approximates with embedding cosine). Fully
    * relational: tf is a partial-agg groupBy over tokens FILTERED to the
    * query terms (the filter rides the explode, so the shuffle carries
    * only query-term hits, not the corpus token stream); df and N are
    * broadcast scalars derived from that same tiny tf table; dl is one
    * map-only scan (at 100 TB it comes from the persisted doc-stats table
    * t3 maintains). Per-term scores pivot to columns and sum in FIXED
    * lexicographic term order — the one float-summation in the query is a
    * 3-term scalar add both engines execute in the same IEEE order, which
    * is what keeps BM25 hash-gateable (same recipe as t7's tf-idf).
    * avgdl is exact-integer sum(dl)/n, not a float `avg`. */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("merge", "spark", "window"),
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sorted = terms.sorted
    val docs = Tables.documents(spark, dir)
    // tf is referenced twice downstream (df AND the score join) with
    // different partitionings, so nothing dedupes the subtree — without
    // the checkpoint the corpus explode+filter runs twice (the d3/d4
    // lesson). dl is also double-referenced (stats + join) but is a
    // map-only size(split) projection: duplicating that scan is cheaper
    // than a materialization job at any scale where the scan is columnar
    // (at 100 TB both lines come from the persisted doc-stats/postings
    // tables t3/t7 would maintain).
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).as("n"))
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(sorted: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))

    val idf = log(lit(1.0) + (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val sc = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(broadcast(dfreq), Seq("term"))
      .withColumn("sc", sc)

    val total = sorted.map(t => coalesce(max(when(col("term") === t, col("sc"))), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy(col("doc_id")).agg(total.as("score"))
      .select(col("doc_id"), round(col("score"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  def bm25TopKOracle(terms: Seq[String] = Seq("merge", "spark", "window"),
                     k: Int = 10, k1: Double = 1.2, b: Double = 0.75): String = {
    val sorted = terms.sorted
    val inList = sorted.map(t => s"'$t'").mkString(", ")
    val arms = sorted
      .map(t => s"coalesce(max(CASE WHEN term = '$t' THEN sc END), 0)")
      .mkString(" +\n             ")
    s"""WITH dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
       |stats AS (SELECT sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl, count(*)::BIGINT AS n FROM dl),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
       |       WHERE term IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY 1),
       |s AS (SELECT tf.doc_id, tf.term,
       |             ln(1.0 + (stats.n::DOUBLE - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5)) *
       |             (tf.tf::DOUBLE * ${k1 + 1.0}) /
       |             (tf.tf::DOUBLE + $k1 * (${1.0 - b} + $b * dl.dl::DOUBLE / stats.avgdl)) AS sc
       |      FROM tf JOIN dl USING (doc_id) CROSS JOIN stats JOIN df USING (term)),
       |p AS (SELECT doc_id, $arms AS score FROM s GROUP BY doc_id)
       |SELECT doc_id, round(score, 4) AS bm25 FROM p
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** t12: distinct-shingle cardinality via the K-minimum-values sketch
    * ([[graft.functions.KmvAgg]]) — vocabulary sizing without a
    * corpus-wide `count(DISTINCT)`. The aggregate ships at most k longs
    * per partition (bounded sorted-set buffer with map-side partials), so
    * the shuffle is O(partitions·k) where the exact distinct would move
    * every unique shingle hash; estimate = (k-1)·|space|/kth_min. The
    * estimator is pure integer state + ONE double division, so the sketch
    * itself is hash-gated: DuckDB replays it as DISTINCT-ORDER-LIMIT
    * (affordable at oracle scale, which is exactly the asymmetry that
    * makes a sketch worth having at 100 TB). Accuracy vs exact is
    * spec-gated (KmvSpec: |est−exact|/exact within 2/√k). */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 128): DataFrame = {
    graft.Graft.init(spark)
    val sh = Dedup.corpusShingles(spark, dir)._2
    val mins = sh.agg(call_function("graft_kmv", col("h"), lit(k)).as("mins"))
    mins.select(
      size(col("mins")).cast("long").as("k"),
      element_at(col("mins"), k).as("kth"),
      when(size(col("mins")) < k, size(col("mins")).cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * lit(Dedup.P.toDouble) / element_at(col("mins"), k).cast("double"), 4))
        .as("est_distinct"))
  }

  def kmvDistinctOracle(k: Int = 128): String =
    s"""WITH ${Dedup.shingleSqlCte},
       |mins AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT $k),
       |st AS (SELECT max(h) AS kth, count(*) AS n FROM mins)
       |SELECT n::BIGINT AS k, kth,
       |       CASE WHEN n < $k THEN n::DOUBLE
       |            ELSE round(${(k - 1).toDouble} * ${Dedup.P.toDouble} / kth::DOUBLE, 4) END AS est_distinct
       |FROM st""".stripMargin

  /** q14: MERGEABLE cardinality — per-source KMV sketches union-merged
    * into a corpus-wide distinct estimate, the property that makes
    * sketches the 100 TB answer at all: every partition/source/day keeps
    * its own k-long summary and the global estimate comes from merging
    * summaries, never re-scanning data. Merge = k smallest of the
    * concatenated min-sets, which is EXACTLY the sketch of the union (a
    * KMV identity, not an approximation) — so the __union row here must
    * equal t12's one-shot corpus sketch bit for bit (spec-asserted). Per
    * source: one partial-agg groupBy whose shuffle carries ≤k longs per
    * (partition, source); the merge aggregates S·k rows. The same shape
    * federates estimates across 1000 daily corpora without touching one. */
  def kmvBySource(spark: SparkSession, dir: String, k: Int = 128): DataFrame = {
    graft.Graft.init(spark)
    val sh = Dedup.corpusShingles(spark, dir)._2
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val per = sh.join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("mins"))
    val union = per.select(explode(col("mins")).as("h"))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("mins"))
      .withColumn("source", lit("__union"))
    per.unionByName(union)
      .select(col("source"),
        size(col("mins")).cast("long").as("k"),
        element_at(col("mins"), k).as("kth"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Dedup.P.toDouble) /
            element_at(col("mins"), k).cast("double"), 4))
          .as("est_distinct"))
      .orderBy("source")
  }

  def kmvBySourceOracle(k: Int = 128): String =
    s"""WITH ${Dedup.shingleSqlCte},
       |src AS (SELECT DISTINCT d.source, h.h FROM h JOIN documents d USING (doc_id)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM src),
       |per AS (SELECT source, count(*) AS n, max(h) AS kth FROM r WHERE rn <= $k GROUP BY source),
       |m AS (SELECT DISTINCT h FROM r WHERE rn <= $k),
       |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM m),
       |uni AS (SELECT '__union' AS source, count(*) AS n, max(h) AS kth FROM mr WHERE rn <= $k),
       |s AS (SELECT * FROM per UNION ALL SELECT * FROM uni)
       |SELECT source, n::BIGINT AS k, kth,
       |       CASE WHEN n < $k THEN n::DOUBLE
       |            ELSE round(${(k - 1).toDouble} * ${Dedup.P.toDouble} / kth::DOUBLE, 4) END AS est_distinct
       |FROM s ORDER BY source""".stripMargin

  /** t21: LENGTH-OUTLIER screen in EXACT integers — flag documents whose
    * token count sits more than 1.5σ from their language's mean, with the
    * z-test cross-multiplied into pure BIGINT arithmetic so it hash-gates
    * with no floats at all: `|x−μ| > 1.5σ  ⟺  4(x·N−S)² > 9(N·SS−S²)`
    * where S=Σx, SS=Σx² per lang. (2σ is vacuous on this corpus — token
    * counts are near-uniform and a uniform's max deviation is 1.73σ;
    * 1.5σ catches the tails, measured 63 flags at sf0.001.) Shape: one
    * tokenize-count scan, a 5-row stats aggregate broadcast back, a
    * map-only integer predicate — the outlier screen stays two scans at
    * any corpus size, and the magnitudes fit long exactly (x·N ≤ ~1e9
    * squared ≤ ~1e18 at 100 TB per-lang partitions). */
  def lengthOutliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val stats = t.groupBy(col("lang"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("sm"),
        sum(col("n_tok") * col("n_tok")).as("ss"))
    val dev = col("n_tok") * col("nd") - col("sm")
    t.join(broadcast(stats), Seq("lang"))
      .filter(lit(4L) * dev * dev > lit(9L) * (col("nd") * col("ss") - col("sm") * col("sm")))
      .select(col("doc_id"), col("lang"), col("n_tok"))
      .orderBy("doc_id")
  }

  val lengthOutliersOracle: String =
    """WITH t AS (SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      |s AS (SELECT lang, count(*) AS nd, sum(n_tok) AS sm, sum(n_tok * n_tok) AS ss
      |      FROM t GROUP BY lang)
      |SELECT t.doc_id, t.lang, t.n_tok
      |FROM t JOIN s USING (lang)
      |WHERE 4 * (t.n_tok * s.nd - s.sm) * (t.n_tok * s.nd - s.sm)
      |      > 9 * (s.nd * s.ss - s.sm * s.sm)
      |ORDER BY doc_id""".stripMargin

  /** t22: QUALITY-BAND filter — keep only documents whose t2 quality
    * score falls inside the corpus's exact [p25, p75] interquartile band
    * (the perplexity-band/quality-band cut every LLM curation pipeline
    * applies: drop the junk tail AND the degenerate too-clean head).
    *
    * The thresholds are EXACT corpus quantiles computed from a BOUNDED
    * frequency histogram, not a sort: quality quantizes to 4-dp fixed
    * point (the v20 device), whose DOMAIN is ≤ ~11k distinct values
    * whatever the corpus size — one partial-agg groupBy folds 100 TB into
    * a ≤11k-row table, and the driver walks cumulative counts to the two
    * bracketing values of each quantile position (h = q·(n−1), then the
    * same `lo·(1−frac) + hi·frac` two-term sum DuckDB's quantile_cont
    * computes — the q9-verified bit-parity formula, exact here because
    * the inputs are small integers). Pass 2 re-scans with a map-only
    * band predicate and aggregates per-lang stats in exact integers.
    * Shape at 100 TB: two scans, one ≤11k-row shuffle, O(domain) driver
    * state — where a sort-based percentile would shuffle the corpus.
    * (The rescan recomputes the score rather than caching the corpus —
    * deliberate: a 100 TB cache is eviction churn, and the score is one
    * codegen'd projection.) */
  def qualityBand(spark: SparkSession, dir: String,
                  pLo: Double = 0.25, pHi: Double = 0.75): DataFrame = {
    graft.Graft.init(spark)
    def scored: DataFrame = qualityFrame(Tables.documents(spark, dir))
      .withColumn("q4", expr("cast(floor(quality * 10000 + 0.5) as bigint)"))
    val hist: Array[(Long, Long)] = scored.groupBy(col("q4"))
      .agg(count(lit(1)).as("n")).orderBy("q4")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    require(n > 0, "empty corpus — quality band undefined")
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
    val (tLo, tHi) = (quantile(pLo), quantile(pHi))
    scored.filter(col("q4").cast("double") >= tLo && col("q4").cast("double") <= tHi)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("q4")).as("sum_q4"),
        min(col("q4")).as("min_q4"), max(col("q4")).as("max_q4"))
      .orderBy("lang")
  }

  def qualityBandOracle(pLo: Double = 0.25, pHi: Double = 0.75): String = {
    val allStops = StopWords.values.flatten.toSeq.distinct.sorted.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang, text,
       |         len(string_split(text, ' '))::BIGINT AS n_tok,
       |         len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq,
       |         len(list_intersect(list_distinct(string_split(text, ' ')), [$allStops]))::BIGINT AS stop_hits
       |  FROM documents),
       |q AS (
       |  SELECT lang,
       |         floor((0.5 * (n_uniq::DOUBLE / n_tok::DOUBLE)
       |              + 0.3 * least((length(text)::DOUBLE / n_tok::DOUBLE) / 10.0, 1.0)
       |              + 0.2 * (stop_hits::DOUBLE / n_uniq::DOUBLE)) * 10000 + 0.5)::BIGINT AS q4
       |  FROM t),
       |b AS (SELECT quantile_cont(q4, $pLo) AS lo, quantile_cont(q4, $pHi) AS hi FROM q)
       |SELECT lang, count(*) AS n_kept, sum(q4)::BIGINT AS sum_q4,
       |       min(q4) AS min_q4, max(q4) AS max_q4
       |FROM q, b WHERE q4::DOUBLE >= lo AND q4::DOUBLE <= hi
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** t13: count-min sketch term frequencies (Cormode & Muthukrishnan
    * 2005) — the frequency companion to t12's cardinality sketch. The
    * sketch state is d×w counters (here 4×256 longs) REGARDLESS of
    * vocabulary size: one partial-agg groupBy folds the token stream into
    * the registers, so the shuffle carries at most d·w cells per
    * partition where an exact per-term count moves the whole vocabulary.
    * Estimates overestimate only (est ≥ true, est ≤ true + εN w.h.p.) —
    * spec-bounded in `SketchSpec`. Register sums are order-independent
    * integer math off the shared md5 hash, so unlike Misra–Gries (whose
    * summary depends on arrival order) the whole sketch is
    * hash-gateable: the oracle rebuilds the identical registers. The
    * probe terms include an absent one — its nonzero estimate IS the
    * collision overcount the ε-bound prices in. */
  def cmsTermCounts(spark: SparkSession, dir: String,
                    terms: Seq[String] = Seq("data", "join", "scan", "the", "zzz_absent"),
                    depth: Int = 4, width: Int = 256): DataFrame = {
    val sorted = terms.sorted
    def idxCol(r: Column, t: Column): Column =
      Dedup.h60(concat(lit("cms"), r.cast("string"), lit(":"), t)) % width
    // fanOut (r17, guide §2.5): depth× per-token md5 otherwise runs on one
    // core (one-row-group corpus); CMS counters are integer sums — order-
    // independent, so partitioning cannot move an estimate
    val tok = Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(split(col("text"), " ")).as("t"))
    val arms = tok.select(explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), idxCol(lit(r), col("t")).as("idx"))): _*)).as("a"))
      .select(col("a.r"), col("a.idx"))
    val reg = arms.groupBy(col("r"), col("idx")).agg(count(lit(1)).as("c"))

    import spark.implicits._
    val probes = sorted.flatMap(t => (0 until depth).map(r => (t, r))).toDF("term", "r")
      .withColumn("idx", idxCol(col("r"), col("term")))
    val est = probes.join(reg, Seq("r", "idx"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
    val exact = tok.filter(col("t").isin(sorted: _*))
      .groupBy(col("t").as("term")).agg(count(lit(1)).as("true_count"))
    est.join(exact.withColumnRenamed("t", "term"), Seq("term"), "left")
      .select(col("term"), col("est_count"), coalesce(col("true_count"), lit(0L)).as("true_count"))
      .orderBy("term")
  }

  def cmsTermCountsOracle(terms: Seq[String] = Seq("data", "join", "scan", "the", "zzz_absent"),
                          depth: Int = 4, width: Int = 256): String = {
    val termList = terms.sorted.map(t => s"('$t')").mkString(", ")
    val rList = (0 until depth).map(r => s"($r)").mkString(", ")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
       |arms AS (SELECT rr.r,
       |                CAST('0x' || substr(md5('cms' || rr.r || ':' || tok.t), 1, 15) AS BIGINT) % $width AS idx
       |         FROM tok CROSS JOIN (VALUES $rList) AS rr(r)),
       |reg AS (SELECT r, idx, count(*) AS c FROM arms GROUP BY 1, 2),
       |probes AS (SELECT qt.term, rr.r,
       |                  CAST('0x' || substr(md5('cms' || rr.r || ':' || qt.term), 1, 15) AS BIGINT) % $width AS idx
       |           FROM (VALUES $termList) AS qt(term) CROSS JOIN (VALUES $rList) AS rr(r)),
       |est AS (SELECT p.term, min(coalesce(reg.c, 0))::BIGINT AS est_count
       |        FROM probes p LEFT JOIN reg ON reg.r = p.r AND reg.idx = p.idx
       |        GROUP BY p.term),
       |ex AS (SELECT t AS term, count(*) AS true_count FROM tok
       |       WHERE t IN (${terms.sorted.map(t => s"'$t'").mkString(", ")}) GROUP BY 1)
       |SELECT est.term, est.est_count, coalesce(ex.true_count, 0)::BIGINT AS true_count
       |FROM est LEFT JOIN ex ON est.term = ex.term ORDER BY est.term""".stripMargin
  }

  /** t14: weighted sampling without replacement (Efraimidis–Spirakis
    * 2006) — sample documents ∝ weight (here `n_chars`: favor long
    * documents) by ranking on `key = ln(u)/w` with the content-stable
    * hash as the uniform variate `u ∈ (0, 1]`, and keeping the k largest
    * keys. The t8 philosophy applied to weighted draws: map-only key
    * computation, a TakeOrdered top-k (O(k) per partition, no shuffle of
    * the corpus), exactly reproducible under any partitioning, and
    * append-stable — new data never flips an old draw, it only competes
    * for the k slots. `RAND()`-based weighted samplers have none of
    * those properties. Keys are rounded to 10dp before the cut (they sit
    * in the 1e-3..1e-6 band — 4dp would collapse them; 10dp clears the
    * ln() last-ulp band), ties → doc_id. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val u = (Dedup.h60(concat(lit("wsample:"), col("doc_id").cast("string"))) + 1L)
      .cast("double") / lit(1.152921504606846976e18) // 2^60, exact
    val key = round(log(u) / col("n_chars").cast("double"), 10)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), key.as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  def weightedSampleOracle(k: Int = 50): String =
    s"""WITH b AS (
       |  SELECT doc_id, lang, n_chars,
       |         round(ln((CAST('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1)::DOUBLE
       |                  / 1152921504606846976.0) / n_chars::DOUBLE, 10) AS skey
       |  FROM documents)
       |SELECT doc_id, lang, n_chars, skey FROM b
       |ORDER BY skey DESC, doc_id LIMIT $k""".stripMargin

  def stratifiedSampleOracle(rates: Map[String, Int] = Map(
      "en" -> 300, "de" -> 600, "es" -> 600, "fr" -> 600, "zh" -> 600)): String = {
    val arms = rates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |         CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000 AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, bucket FROM b
       |WHERE bucket < CASE lang $arms ELSE 0 END
       |ORDER BY doc_id""".stripMargin
  }

  /** t15: repetition-based quality rules (the Gopher §A1.1 family, adapted
    * to a newline-free corpus): per document, the duplicate-token fraction
    * (1 − distinct/total) and the fraction of token slots covered by the
    * single most frequent bigram (2·count/total). Highly repetitive
    * machine-generated or boilerplate text scores high on both; real
    * pipelines drop documents past a threshold before training.
    *
    * Scale shape: ONE corpus scan, one tokenization. The per-doc token
    * totals need no explode at all — `size(w)` and
    * `size(array_distinct(w))` are in-row array ops — so they ride along
    * the bigram explode as constant columns and survive the two partial
    * aggregates via `first` (every row of a (doc_id, ·) group carries the
    * same value). Shuffles are keyed on (doc_id, bigram) then doc_id,
    * both high-cardinality; a two-branch groupBy+join formulation would
    * scan and tokenize the corpus twice (executed-plan audit: the shared
    * subtree is NOT reused across join sides). The `repetitive` verdict
    * compares EXACT integers (cross-multiplied thresholds: top bigram
    * covering > 20 % of token slots, or < 40 % distinct), so no float
    * boundary can flip it; the reported fractions divide the same
    * integers in IEEE double on both engines and round at 4 dp. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    // fanOut (r17, guide §2.5): tokenize + bigram-explode otherwise run on
    // one core (one-row-group corpus); counts/max are order-independent
    Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w")) // tokenize once
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        explode(expr(
          "CASE WHEN size(w) < 2 THEN array() ELSE transform(sequence(1, size(w) - 1), " +
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) END")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"),
        first(col("n_tokens")).as("n_tokens"), first(col("n_distinct")).as("n_distinct"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_n"),
        first(col("n_tokens")).as("n_tokens"), first(col("n_distinct")).as("n_distinct"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_bigram_n"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"), 4)
          .as("dup_token_frac"),
        round((col("top_bigram_n") * 2L).cast("double") / col("n_tokens").cast("double"), 4)
          .as("top_bigram_frac"),
        (col("top_bigram_n") * 10L > col("n_tokens") ||
          col("n_distinct") * 5L < col("n_tokens") * 2L).cast("long").as("repetitive"))
      .orderBy("doc_id")
  }

  val repetitionScoreOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS tok FROM w),
      |ts AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
      |       FROM tok GROUP BY doc_id),
      |bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)]) AS bigram
      |       FROM w),
      |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
      |tb AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY doc_id)
      |SELECT ts.doc_id, ts.n_tokens, ts.n_distinct, tb.top_bigram_n,
      |       round(1.0 - ts.n_distinct::DOUBLE / ts.n_tokens::DOUBLE, 4) AS dup_token_frac,
      |       round((tb.top_bigram_n * 2)::DOUBLE / ts.n_tokens::DOUBLE, 4) AS top_bigram_frac,
      |       (CASE WHEN tb.top_bigram_n * 10 > ts.n_tokens
      |                  OR ts.n_distinct * 5 < ts.n_tokens * 2 THEN 1 ELSE 0 END)::BIGINT AS repetitive
      |FROM ts JOIN tb USING (doc_id) ORDER BY doc_id""".stripMargin

  /** t16: sequence packing — the LLM-pretraining concat-and-chunk step:
    * documents are laid out in doc_id order as one token stream and cut
    * into fixed `chunkTokens`-token training chunks; each document is
    * assigned to the chunk its START offset falls in. The offsets are a
    * GLOBAL prefix sum, which a naive `Window.orderBy(doc_id)` computes
    * in one task over the whole corpus — instead this is the classic
    * two-level distributed prefix sum: per-doc token counts reduce into
    * coarse doc_id buckets (corpus/`bucketDocs` rows), the exclusive
    * running total over that TINY table is the only unpartitioned window
    * (bounded: one row per bucket, tunable; a third level would make it
    * O(corpus/G²)), and the in-bucket exclusive sum windows over the
    * high-cardinality bucket key. Bucket offsets join back UNHINTED —
    * the offsets table is corpus/`bucketDocs` rows, i.e. SF-proportional,
    * so AQE broadcasts it while it fits and degrades to a shuffled join
    * on `bucket` (both sides already hash by it) when it doesn't. All
    * integer math — hash-gates exactly. */
  def sequencePack(spark: SparkSession, dir: String, chunkTokens: Long = 512L,
                   bucketDocs: Long = 100L): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"doc_id div $bucketDocs"))
    val bucketOffsets = d.groupBy(col("bucket")).agg(sum(col("n_tok")).as("bsum"))
      .withColumn("boff", coalesce(sum(col("bsum")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boff"))
    d.withColumn("ioff", coalesce(sum(col("n_tok")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(bucketOffsets, Seq("bucket"))
      .withColumn("chunk_id", expr(s"(boff + ioff) div $chunkTokens"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("chunk_id")
  }

  def sequencePackOracle(chunkTokens: Long = 512L): String =
    s"""WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
       |o AS (SELECT doc_id, n_tok,
       |             coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
       |      FROM d)
       |SELECT off // $chunkTokens AS chunk_id, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM o GROUP BY 1 ORDER BY chunk_id""".stripMargin

  /** t23: unigram-LM NEGATIVE-LOG-LIKELIHOOD quality filter — the
    * perplexity screen of the CCNet/CC-style pipelines (Wenzek et al.
    * 2020): score each doc by the mean −ln p(term) under a unigram model
    * trained on the corpus itself; high-NLL (unfamiliar, high-perplexity)
    * docs are dropped. Differs from t19/t20's familiarity (linear mean of
    * document frequencies): this is the LOG-space likelihood the
    * perplexity literature actually uses, so rare terms are penalized
    * multiplicatively, not additively.
    *
    * Hash-stability discipline: a cross-partition sum of doubles is
    * order-nondeterministic, so each term's log-prob is quantized to a
    * 6-dp fixed-point LONG first (`floor(ln(cnt/T)·10⁶ + ½)` — per-value
    * libm parity, the t14 precedent) and the per-doc reduction is an
    * exact integer sum; the final mean divides two exact longs with the
    * same IEEE ops in both engines (4-dp output).
    *
    * Shape (3 shuffles, scale-safe): tokens collapse to (doc, term, tf)
    * pairs FIRST — the model join then moves |D·V| rows, not |tokens|,
    * and per-pair multiplicity is 1 so a hot stopword key skews the join
    * no further than its distinct-doc count (AQE broadcasts the ≤|V|-row
    * model at test scale; at 100 TB it clusters on term with skew-split).
    * Vocab aggregate → broadcast total → map-side quantize; doc-keyed
    * partial agg closes. */
  def logprobFilter(spark: SparkSession, dir: String, keepNllQ4: Long = 34500L): DataFrame = {
    graft.Graft.init(spark)
    val tok = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dt = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // two consumers: the vocab aggregate and the score join
    val vocab = dt.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("t"))
    val model = vocab.crossJoin(broadcast(total))
      .select(col("term"),
        floor(log(col("cnt").cast("double") / col("t").cast("double")) * 1e6 + 0.5)
          .cast("long").as("lq"))
    dt.join(model, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("lq") * col("tf")).as("sum_q6"))
      .select(col("doc_id"), col("n_tokens"),
        floor(-col("sum_q6").cast("double") / col("n_tokens").cast("double") / 100.0 + 0.5)
          .cast("long").as("nll_q4"))
      .withColumn("keep", col("nll_q4") <= keepNllQ4)
      .orderBy("doc_id")
  }

  def logprobFilterOracle(keepNllQ4: Long = 34500L): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |dt AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |v AS (SELECT term, sum(tf)::BIGINT AS cnt FROM dt GROUP BY 1),
       |tot AS (SELECT sum(cnt)::BIGINT AS t FROM v),
       |m AS (SELECT term, floor(ln(cnt::DOUBLE / t::DOUBLE) * 1000000 + 0.5)::BIGINT AS lq
       |      FROM v CROSS JOIN tot),
       |d AS (SELECT dt.doc_id, sum(dt.tf)::BIGINT AS n_tokens,
       |             sum(m.lq * dt.tf)::BIGINT AS sum_q6
       |      FROM dt JOIN m USING (term) GROUP BY 1)
       |SELECT doc_id, n_tokens,
       |       floor(-(sum_q6::DOUBLE) / n_tokens::DOUBLE / 100.0 + 0.5)::BIGINT AS nll_q4,
       |       floor(-(sum_q6::DOUBLE) / n_tokens::DOUBLE / 100.0 + 0.5)::BIGINT <= $keepNllQ4 AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  /** t28: BIGRAM-LM perplexity scoring — t23's unigram NLL upgraded to the
    * next model class a curation stack actually deploys (CCNet's quality
    * buckets come from a real LM; the bigram interpolation is the cheapest
    * model that sees word ORDER, separating fluent prose from bag-of-words
    * gibberish that unigram NLL scores identically). Per bigram token
    * p(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/T (Jelinek–Mercer
    * interpolation; every scored bigram is observed, so the backoff term
    * handles skew, not zeros), per-doc NLL = −Σ ln p / n_bigrams.
    *
    * Determinism (the t23 recipe): all counts exact integers; each
    * bigram's ln(p) computed per-VALUE from the same double expression
    * shape in both engines (libm-ln parity) and quantized q6 BEFORE the
    * per-doc reduction — an exact integer sum; output q4. Shape: one
    * tokenize pass, bigrams via lead() over a doc-partitioned window
    * (doc_id is high-cardinality — corpus-spread), bigram/unigram count
    * tables key-partitioned by gram (the standard LM-count shuffle), the
    * doc×model join co-keyed on the bigram. At 100 TB every shuffle is
    * gram- or doc-keyed; the model is a table, never driver state.
    * Single-token docs have no bigrams and drop out (both engines). */
  def bigramLm(spark: SparkSession, dir: String, lambda: Double = 0.7): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    // fan the doc scan out BEFORE both token explodes (r18): the test
    // corpus is one row group, so the posexplode (and the unigram explode
    // below) ran on one core of 32 — and the bigram window is partitioned
    // by the same doc_id key at the same partition count, so the lead()
    // reuses the fan-out exchange instead of adding one (guide §2.4).
    // Sound here: every downstream aggregate is exact integer counts and
    // the per-bigram ln() is per-VALUE — nothing depends on row order.
    val docsF = Tables.fanOut(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), col("doc_id"))
    val bg = docsF
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
      .localCheckpoint() // two consumers: bigram counts, doc-bigram tf
    val tok = docsF
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val c1 = tok.groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val total = c1.agg(sum(col("c1")).as("t"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val model = c2
      .join(c1.select(col("term").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(c1.select(col("term").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(total)) // 1-row total: bounded by construction
      .select(col("w1"), col("w2"),
        floor(log(lit(lambda) * (col("c2").cast("double") / col("c1a").cast("double")) +
          lit(1.0 - lambda) * (col("c1b").cast("double") / col("t").cast("double"))) * 1e6 + 0.5)
          .cast("long").as("lq"))
    bg.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
      .join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("lq") * col("tf")).as("sum_q6"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(-col("sum_q6").cast("double") / col("n_bigrams").cast("double") / 100.0 + 0.5)
          .cast("long").as("nll_q4"))
      .orderBy("doc_id")
  }

  def bigramLmOracle(lambda: Double = 0.7): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, unnest([struct_pack(w1 := w[i], w2 := w[i+1])
       |                              for i in generate_series(1, len(w) - 1)], recursive := true)
       |       FROM w),
       |tok AS (SELECT doc_id, unnest(w) AS term FROM w),
       |c1 AS (SELECT term, count(*)::BIGINT AS c1 FROM tok GROUP BY 1),
       |tot AS (SELECT sum(c1)::BIGINT AS t FROM c1),
       |c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2),
       |m AS (SELECT c2.w1, c2.w2,
       |             floor(ln($lambda * (c2.c2::DOUBLE / ua.c1::DOUBLE)
       |                      + ${1.0 - lambda} * (ub.c1::DOUBLE / tot.t::DOUBLE)) * 1000000 + 0.5)::BIGINT AS lq
       |      FROM c2 JOIN c1 ua ON c2.w1 = ua.term
       |              JOIN c1 ub ON c2.w2 = ub.term
       |              CROSS JOIN tot),
       |db AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf FROM bg GROUP BY 1, 2, 3),
       |d AS (SELECT db.doc_id, sum(db.tf)::BIGINT AS n_bigrams,
       |             sum(m.lq * db.tf)::BIGINT AS sum_q6
       |      FROM db JOIN m ON db.w1 = m.w1 AND db.w2 = m.w2 GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |       floor(-(sum_q6::DOUBLE) / n_bigrams::DOUBLE / 100.0 + 0.5)::BIGINT AS nll_q4
       |FROM d ORDER BY doc_id""".stripMargin

  /** t25: TERM-DISTRIBUTION DRIFT between two corpus slices — the
    * domain-shift monitor a training-data pipeline runs between crawls
    * (slice A = the `en` documents, slice B = everything else, standing
    * in for crawl N vs crawl N+1): per-term KL-divergence contribution
    * `p_a · ln(p_a / p_b)` under add-one smoothing over the union
    * vocabulary, top terms by contribution. One tokenize pass feeds both
    * slices' counts as conditional aggregates of a single term groupBy;
    * totals arrive as a broadcast 1-row aggregate; the contribution is
    * map-only math over integer counts and the top-k cut is a
    * TakeOrdered. Determinism: counts are exact integers, each term's
    * contribution is computed per-VALUE (the cross-engine libm-ln parity
    * t14/t23 established) and quantized q9 BEFORE any further use —
    * never a float reduction. At 100 TB: one scan, one term-keyed
    * shuffle of combined counts, K output rows. */
  /** t27: WITHIN-DOCUMENT word-distribution ENTROPY — the lexical-
    * diversity screen that separates genuinely varied prose from
    * templated/repetitive text at a finer grain than t15's duplicate-line
    * ratio (a doc can repeat no LINE yet cycle a tiny vocabulary — low
    * entropy catches it; CCNet/Gopher-style stacks threshold exactly this
    * family of signals). H = −Σ p·ln p over the doc's term frequencies.
    *
    * Hash-stability discipline (the t23 recipe): each term's contribution
    * −p·ln(p) is computed per-VALUE (IEEE-identical in both engines — the
    * t14 libm-ln parity) and quantized to 6-dp fixed point BEFORE the
    * per-doc reduction, which is then an exact integer sum; output at
    * 4 dp. Shape (2 shuffles, scale-safe): tokens collapse to
    * (doc, term, tf) pairs, the doc-total rides a doc-partitioned window
    * over the PAIR table (bounded by per-doc distinct terms, not corpus),
    * and the closing doc aggregate reuses that partitioning — no third
    * exchange. At 100 TB: one scan, two pair-table shuffles, one row per
    * document out. */
  def docEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dt = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val p = col("tf").cast("double") / col("n").cast("double")
    dt.withColumn("n", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("cq6", floor(-p * log(p) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("cq6")).as("sum_q6"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        floor(col("sum_q6").cast("double") / 100.0 + 0.5).cast("long").as("entropy_q4"))
      .orderBy("doc_id")
  }

  val docEntropyOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |dt AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |wn AS (SELECT doc_id, term, tf, sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS n FROM dt),
      |cq AS (SELECT doc_id, n,
      |              floor(-(tf::DOUBLE / n::DOUBLE) * ln(tf::DOUBLE / n::DOUBLE) * 1000000 + 0.5)::BIGINT AS cq6
      |       FROM wn)
      |SELECT doc_id, max(n) AS n_tokens, count(*)::BIGINT AS n_types,
      |       floor(sum(cq6)::DOUBLE / 100.0 + 0.5)::BIGINT AS entropy_q4
      |FROM cq GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def termDrift(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    // no fanOut (r17, measured): plain tokenize + integer counts — the
    // shuffle cost exceeded the single-core compute (0.37→0.52 fanned)
    val docs = Tables.documents(spark, dir)
    val tok = docs.select((col("lang") === "en").as("in_a"),
      explode(split(col("text"), " ")).as("term"))
    val counts = tok.groupBy(col("term")).agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
    val totals = counts.agg(
      sum(col("na")).as("ta"), sum(col("nb")).as("tb"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("pa", (col("na") + 1).cast("double") / (col("ta") + col("v")).cast("double"))
      .withColumn("pb", (col("nb") + 1).cast("double") / (col("tb") + col("v")).cast("double"))
      .withColumn("contrib_q9",
        floor(col("pa") * log(col("pa") / col("pb")) * 1000000000d + 0.5d).cast("long"))
      .select(col("term"), col("na"), col("nb"), col("contrib_q9"))
      .orderBy(col("contrib_q9").desc, col("term"))
      .limit(topK)
  }

  def termDriftOracle(topK: Int = 20): String =
    s"""WITH tok AS (SELECT lang = 'en' AS in_a, unnest(string_split(text, ' ')) AS term
       |            FROM documents),
       |c AS (SELECT term,
       |             sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS na,
       |             sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS nb
       |      FROM tok GROUP BY 1),
       |t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb, count(*)::BIGINT AS v FROM c),
       |k AS (SELECT term, na, nb,
       |             (na + 1)::DOUBLE / (ta + v)::DOUBLE AS pa,
       |             (nb + 1)::DOUBLE / (tb + v)::DOUBLE AS pb
       |      FROM c, t)
       |SELECT term, na, nb,
       |       floor(pa * ln(pa / pb) * 1000000000 + 0.5)::BIGINT AS contrib_q9
       |FROM k ORDER BY contrib_q9 DESC, term LIMIT $topK""".stripMargin

  private[graft] val MojiCorpusN = 240L

  /** Deterministic ENCODING-DAMAGE corpus: clean log-ish lines with
    * double-encoded UTF-8 markers ("Ã©" = é through a latin-1 round
    * trip, stray "â" from a mangled punctuation triple, "Â " =
    * non-breaking-space damage) and U+FFFD replacement characters
    * injected by pure id rules — the t17b side-corpus device applied to
    * mojibake (the reference corpus is clean ASCII, so a gate on it
    * would only prove the detector finds nothing). */
  private[graft] def mojiCorpus(spark: SparkSession, n: Long = MojiCorpusN): DataFrame = {
    val i = col("id")
    def s(c: Column): Column = c.cast("string")
    val moji1 = when(i % 4 === 1, lit(" cafÃ© menu")).otherwise("")
    val moji2 = when(i % 5 === 2, lit(" status â degraded")).otherwise("")
    val moji3 = when(i % 6 === 4, lit(" gapÂ here")).otherwise("")
    val repl = when(i % 7 === 3, lit(" blob �� end")).otherwise("")
    val text = concat(lit("record "), s(i), lit(": alpha beta"),
      moji1, moji2, moji3, repl, lit(" ok"))
    spark.range(0, n).select(
      col("id").as("doc_id"), text.as("text"),
      when(i % 2 === 0, "en").otherwise("fr").as("lang"),
      lit("moji").as("source"), length(text).cast("long").as("n_chars"))
  }

  /** t24: ENCODING-DAMAGE screen (the ftfy/CCNet charset-hygiene step) —
    * count the signatures of UTF-8 text that went through a wrong-codec
    * round trip: the latin-1 double-encoding markers 'Ã', 'â€', 'Â' and
    * the U+FFFD replacement character a lossy decode leaves behind. A
    * crawl at 100 TB always contains these; the screen is one map-only
    * projection (occurrence counts via split-length arithmetic — no
    * regex engine in the hot path) over the scan, and the keep decision
    * is a pure function of the counts. Gated on the [[mojiCorpus]] side
    * corpus (JSONL round trip through the FAILFAST reader, t17b's
    * convention) so the hash covers real detections, not a clean-corpus
    * identity. */
  def mojibakeScreen(spark: SparkSession, dir: String): DataFrame = {
    graft.Graft.init(spark)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_moji_jsonl"
    mojiCorpus(spark).coalesce(1).write.mode("overwrite").json(path)
    def occurrences(marker: String): Column =
      (size(split(col("text"), marker, -1)) - 1).cast("long")
    Tables.documentsFromJson(spark, path)
      .select(col("doc_id"),
        (occurrences("Ã") + occurrences("â") + occurrences("Â"))
          .as("n_moji"),
        occurrences("�").as("n_repl"))
      .withColumn("damaged", (col("n_moji") + col("n_repl")) > 0)
      .orderBy("doc_id")
  }

  def mojibakeScreenOracle: String = {
    def s(x: String) = s"CAST($x AS VARCHAR)"
    s"""WITH moji AS (SELECT i AS doc_id,
       |  'record ' || ${s("i")} || ': alpha beta' ||
       |  CASE WHEN i % 4 = 1 THEN ' cafÃ© menu' ELSE '' END ||
       |  CASE WHEN i % 5 = 2 THEN ' status â degraded' ELSE '' END ||
       |  CASE WHEN i % 6 = 4 THEN ' gapÂ here' ELSE '' END ||
       |  CASE WHEN i % 7 = 3 THEN ' blob �� end' ELSE '' END ||
       |  ' ok' AS text
       |FROM generate_series(0, ${MojiCorpusN - 1}) t(i)),
       |c AS (SELECT doc_id,
       |             (len(string_split(text, 'Ã')) - 1
       |              + len(string_split(text, 'â')) - 1
       |              + len(string_split(text, 'Â')) - 1)::BIGINT AS n_moji,
       |             (len(string_split(text, '�')) - 1)::BIGINT AS n_repl
       |      FROM moji)
       |SELECT doc_id, n_moji, n_repl, (n_moji + n_repl) > 0 AS damaged
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** t29: BPE MERGE CANDIDATES — the first iteration of byte-pair-encoding
    * tokenizer training (Sennrich 2016), the step that precedes every
    * "train a tokenizer on the corpus" job: the top adjacent-symbol pairs
    * by corpus frequency, which IS the merge table's first entry and the
    * candidate list for the next. The 100 TB trick is structural: pair
    * counting rides the VOCABULARY table (word, freq), never the corpus —
    * one corpus tokenize collapses to word frequencies (sublinear row
    * count), then the position explode and pair aggregate touch only
    * vocab-sized data; iteration 2..N would re-run the same vocab-sized
    * loop with merged symbols, corpus untouched. Exact integer counts
    * throughout; ties by pair text so top-20 is total-ordered. Two
    * shuffles (word agg, pair agg), both map-side-combined. */
  def bpePairs(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("freq"), explode(
        expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
  }

  /** t30: VOCABULARY GROWTH CURVE (Heaps' law, empirically) — new distinct
    * terms per corpus decile and the cumulative vocabulary, the NOVELTY-
    * SATURATION signal a data-acquisition loop reads: a flattening curve
    * says more of the same feed no longer buys new language (stop buying
    * it), a steep tail says the corpus is still discovering vocabulary.
    * Deciles are id-order slices (ingestion order — the question is "what
    * did the NEXT batch add"). Shape: one tokenize + ONE vocab-sized
    * aggregate assigns each term its FIRST document (min doc_id — the
    * order-free way to compute every prefix's distinct count at once:
    * |vocab(prefix k)| ≡ |{terms: first_doc in deciles ≤ k}|, so ten
    * prefix-distincts cost one agg, not ten scans), then a 10-row
    * histogram + 10-row window. Per-decile doc counts ride a second
    * map-only agg. All exact integers. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val span = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    def decile(c: String) = least(expr(s"$c * 10 div $span"), lit(9L))
    val firstDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val novelty = firstDoc
      .groupBy(decile("first_doc").as("decile"))
      .agg(count(lit(1)).as("n_new_terms"))
    val docCounts = docs
      .groupBy(decile("doc_id").as("decile"))
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0) // 10-row window: driver-scale
    novelty.join(docCounts, Seq("decile"), "full_outer")
      .select(col("decile"),
        coalesce(col("n_new_terms"), lit(0L)).as("n_new_terms"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .withColumn("vocab_cum", sum(col("n_new_terms")).over(w))
      .orderBy("decile")
  }

  def vocabGrowthOracle(): String =
    """WITH b AS (SELECT max(doc_id) + 1 AS span FROM documents),
      |f AS (SELECT term, min(doc_id) AS first_doc FROM (
      |        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |      GROUP BY 1),
      |nv AS (SELECT least((first_doc * 10) // b.span, 9)::BIGINT AS decile,
      |              count(*)::BIGINT AS n_new_terms
      |       FROM f, b GROUP BY 1),
      |dc AS (SELECT least((doc_id * 10) // b.span, 9)::BIGINT AS decile,
      |              count(*)::BIGINT AS n_docs
      |       FROM documents, b GROUP BY 1)
      |SELECT coalesce(nv.decile, dc.decile) AS decile,
      |       coalesce(n_new_terms, 0)::BIGINT AS n_new_terms,
      |       coalesce(n_docs, 0)::BIGINT AS n_docs,
      |       sum(coalesce(n_new_terms, 0)) OVER (ORDER BY coalesce(nv.decile, dc.decile)
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS vocab_cum
      |FROM nv FULL OUTER JOIN dc ON nv.decile = dc.decile
      |ORDER BY decile""".stripMargin

  def bpePairsOracle(topN: Int = 20): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |v AS (SELECT word, count(*)::BIGINT AS freq FROM w
       |      WHERE length(word) >= 2 GROUP BY 1),
       |p AS (SELECT substr(word, i, 2) AS pair, freq
       |      FROM v, unnest(generate_series(1, length(word) - 1)) AS t(i)),
       |g AS (SELECT pair, sum(freq)::BIGINT AS n FROM p GROUP BY 1)
       |SELECT pair, n FROM g ORDER BY n DESC, pair LIMIT $topN""".stripMargin

  /** t31: REPEATED-TOKEN RUNS — the stutter screen (max consecutive-
    * same-token run per doc, rolled up per source): degenerate repetition
    * ("batch batch batch …") is the classic generation/scrape artifact
    * every LLM-corpus quality filter screens for, and it is invisible to
    * the ORDER-BLIND repetition signals (t15's duplicate-token fraction
    * and t27's entropy score a stuttered doc exactly like its shuffled
    * twin; t15's top-bigram coverage fires on "a b a b" alternation but
    * not on a lone burst). Runs are gaps-and-
    * islands over TOKEN POSITIONS: island id = pos − row_number within
    * (doc, token) — constant inside a consecutive run, distinct across
    * runs, exact integers throughout. Shape at 100 TB: the window and
    * both downstream aggregates are all doc-keyed, so ONE corpus
    * exchange (doc_id is the corpus-spread high-cardinality key) feeds
    * the whole pipeline; the final source rollup shuffles one row per
    * (source, doc) reduced to one per source. */
  def repeatRuns(spark: SparkSession, dir: String, minRun: Int = 3): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), " ")).as(Seq("i", "t")))
      .repartition(col("doc_id"))
    val byTok = Window.partitionBy(col("doc_id"), col("t")).orderBy(col("i"))
    val perDoc = toks
      .withColumn("grp", col("i") - row_number().over(byTok))
      .groupBy(col("doc_id"), col("source"), col("t"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"), col("source"))
      .agg(max(col("run")).as("max_run"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("max_run") >= minRun, 1L).otherwise(0L)).as("n_stutter"),
        max(col("max_run")).as("worst_run"))
      .select(col("source"), col("n_docs"), col("n_stutter"),
        expr("n_stutter * 10000 div n_docs").as("stutter_share_q4"),
        col("worst_run"))
      .orderBy("source")
  }

  def repeatRunsOracle(minRun: Int = 3): String =
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |tok AS (SELECT doc_id, source, unnest(w) AS t,
       |               generate_subscripts(w, 1) AS i FROM w),
       |r AS (SELECT doc_id, source, t, i,
       |             i - row_number() OVER (PARTITION BY doc_id, t ORDER BY i) AS grp
       |      FROM tok),
       |runs AS (SELECT doc_id, source, count(*)::BIGINT AS run
       |         FROM r GROUP BY doc_id, source, t, grp),
       |d AS (SELECT doc_id, source, max(run) AS max_run FROM runs GROUP BY 1, 2)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN max_run >= $minRun THEN 1 ELSE 0 END)::BIGINT AS n_stutter,
       |       ((sum(CASE WHEN max_run >= $minRun THEN 1 ELSE 0 END) * 10000)
       |         // count(*))::BIGINT AS stutter_share_q4,
       |       max(max_run) AS worst_run
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** t32: SEQUENCE-LEVEL DEDUP — exact dedup at the TRAINING-CHUNK grain
    * (t9's 64-token windows), the step that runs AFTER chunking and that
    * doc-level dedup (d1) structurally cannot do: two near-identical
    * docs that survive doc dedup still feed the model the same 64-token
    * sequences, and repeated sequences are what memorization studies
    * actually count. One hash per chunk (the t4/f3 fingerprint), keeper
    * = first (doc, chunk_idx) per hash by row_number — exactly d1's
    * lowest-id convention lifted to the chunk key — rolled up per
    * source. Shape: the chunk explode is map-side, ONE shuffle on the
    * chunk hash (high cardinality, corpus-spread), a doc-keyed source
    * join, and a source-domain fold. At 100 TB this is the pass
    * RefinedWeb/FineWeb run over the packed sequences, priced at one
    * hash shuffle — never an all-pairs anything. */
  def sequenceDedup(spark: SparkSession, dir: String,
                    window: Int = 64, stride: Int = 48): DataFrame = {
    graft.Graft.init(spark)
    val docs = Tables.documents(spark, dir)
    val byHash = Window.partitionBy(col("chunk_h"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunkFrame(docs.select(col("doc_id"), col("text")), window, stride)
      .select(col("doc_id"), col("chunk_idx"),
        Dedup.h60(array_join(col("cw"), " ")).as("chunk_h"))
      .withColumn("rn", row_number().over(byHash))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("source"), col("n_chunks"), col("n_dup_chunks"),
        expr("n_dup_chunks * 10000 div n_chunks").as("dup_share_q4"))
      .orderBy("source")
  }

  def sequenceDedupOracle(window: Int = 64, stride: Int = 48): String =
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w,
       |                  len(string_split(text, ' '))::BIGINT AS n_tok
       |           FROM documents),
       |c AS (SELECT doc_id, source, w,
       |             CASE WHEN n_tok <= $window THEN 1
       |                  ELSE (n_tok - $window + ${stride - 1}) // $stride + 1 END AS n_chunks
       |      FROM w),
       |x AS (SELECT doc_id, source, w,
       |             unnest([i for i in generate_series(0, n_chunks - 1)]) AS chunk_idx
       |      FROM c),
       |h AS (SELECT doc_id, source, chunk_idx,
       |             CAST('0x' || substr(md5(array_to_string(
       |               w[(chunk_idx * $stride + 1):(chunk_idx * $stride + $window)], ' ')), 1, 15) AS BIGINT) AS chunk_h
       |      FROM x),
       |r AS (SELECT source, chunk_h,
       |             row_number() OVER (PARTITION BY chunk_h ORDER BY doc_id, chunk_idx) AS rn
       |      FROM h)
       |SELECT source, count(*)::BIGINT AS n_chunks,
       |       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       |       ((sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT AS dup_share_q4
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  /** t33: JSONL CORPUS INGESTION — the landing format every LLM training
    * corpus actually arrives in (one JSON object per line: The Pile,
    * RedPajama, Common Crawl derivatives, vendor drops), read the way a
    * 100 TB ingest must be read:
    *   - EXPLICIT schema, never inference — `inferSchema` is a full
    *     extra pass over every byte before the real one; at 100 TB the
    *     schema is a contract, not a discovery;
    *   - PERMISSIVE corrupt-record QUARANTINE — a single mangled line
    *     in shard 40k must not kill a day-long job (FAILFAST) or
    *     silently vanish (DROPMALFORMED): it lands in the
    *     `_corrupt` column and is COUNTED, so the ingest report carries
    *     its own data-quality receipt;
    *   - line-splittable input: uncompressed JSONL splits on newlines,
    *     so every executor reads its own byte range — no gzip
    *     single-reader bottleneck.
    * The artifact is BUILT here (the documents table serialized with
    * `to_json` + four deterministic garbage lines planted, three
    * syntax-broken and one TYPE-malformed — the vendor
    * drop stand-in), then read back schema-first; the gate proves the
    * roundtrip: per-lang doc counts and character mass equal the source
    * table exactly, and the quarantine row reports exactly the planted
    * corruption. The corrupt lines themselves persist to
    * `graft_jsonl_quarantine` (raw line + shard provenance) for
    * triage/reprocess — report count ≡ artifact rows, spec-asserted. */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Graft.init(spark)
    val path = Persist.tablePath(spark, "graft_jsonl_drop")
    // three SYNTAX-broken lines + one TYPE-malformed one (valid JSON,
    // doc_id not a number — the class that diverges under per-query
    // parse pruning, r16): all four must land in quarantine
    val lines = Tables.documents(spark, dir)
      .select(to_json(struct(col("doc_id"), col("lang"), col("text"))).as("value"))
      .unionByName(Seq("{\"doc_id\": oops", "{not json at all", "{\"lang\": \"en\"",
          "{\"doc_id\": \"not-a-number\", \"lang\": \"en\", \"text\": \"hi\"}")
        .toDF("value"))
    lines.write.mode("overwrite").text(path)
    val sch = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("lang", org.apache.spark.sql.types.StringType)
      .add("text", org.apache.spark.sql.types.StringType)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    // LAND the parse as parquet — the ingest's actual product (JSONL →
    // columnar is what a 100 TB ingest exists to do), and the ONLY way
    // the report and the quarantine can never disagree: PERMISSIVE
    // populates `_corrupt` per the columns a query REFERENCES (Spark
    // prunes the parse schema per plan), so two differently-pruned
    // reads of the raw JSON can classify a TYPE-malformed line (valid
    // syntax, wrong field type) differently — one materialized
    // full-width parse makes every downstream consumer read the same
    // verdict. `input_file_name` captures shard provenance while the
    // raw source is still underfoot.
    val landed = Persist.tablePath(spark, "graft_jsonl_landed")
    spark.read.schema(sch)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .select(col("doc_id"), col("lang"), col("text"), col("_corrupt"),
        input_file_name().as("src_shard"))
      .write.mode("overwrite").parquet(landed)
    val parsed = spark.read.parquet(landed)
    // QUARANTINE ARTIFACT (r16): corrupt lines don't just get counted —
    // the raw line + shard provenance persist to a triage table, the
    // part of a real ingest the count alone can't do (inspect what
    // broke, fix the producer, re-parse the quarantined lines without
    // re-reading 100 TB). Error-sized by the corrupt-selective filter.
    parsed
      .filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"), col("doc_id"), col("src_shard"))
      .write.mode("overwrite")
      .parquet(Persist.tablePath(spark, "graft_jsonl_quarantine"))
    // the report folds off the SAME landed rows: corrupt rows group
    // under the sentinel lang and contribute ZERO character mass BY
    // RULE (a type-malformed line carries a parsed `text` beside its
    // `_corrupt` — quarantined is quarantined; its chars don't enter
    // the corpus accounting). Report `_corrupt` count ≡ the artifact's
    // row count by shared storage, not by parse luck — spec-asserted,
    // the f7 manifest-audit recipe applied to ingest.
    parsed
      .groupBy(when(col("_corrupt").isNotNull, lit("_corrupt"))
        .otherwise(col("lang")).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("_corrupt").isNull, length(col("text")))
          .otherwise(lit(0))), lit(0L)).as("n_chars"))
      .orderBy("lang")
  }

  def jsonlIngestOracle(): String =
    """WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs,
      |                  sum(length(text))::BIGINT AS n_chars
      |           FROM documents GROUP BY lang)
      |SELECT lang, n_docs, n_chars FROM g
      |UNION ALL SELECT '_corrupt', 4::BIGINT, 0::BIGINT
      |ORDER BY lang""".stripMargin
}
