package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.LcgPlanes
import graft.sources.Tables

/** Deduplication suite for large-scale text pipelines: exact, MinHash(+LSH
  * banding), text-SimHash, n-gram Jaccard, embedding near-dup.
  *
  * Every hash is **exact-integer portable** so the DuckDB oracle reproduces
  * results bit-for-bit:
  *   h60(s)   = int(md5(s)[0:15 hex])                (60-bit, positive)
  *   mix_j(h) = (A_j·(h mod P) + B_j) mod P,  P = 2^31−1, A_j,B_j from the
  *              [[LcgPlanes]] LCG — products stay < 2^62, no overflow in
  *              either engine.
  *
  * Scale shape: shingles are *exploded once* into (doc_id, shingle-hash)
  * rows and reduced with partial aggregates (16 `min`s for MinHash, 32
  * conditional sums for SimHash) — one scan + one doc-keyed shuffle of
  * pre-aggregated rows. Candidate generation is always an equi-join on a
  * band/bucket key, never an all-pairs product; the exact measure
  * (Jaccard / hamming / cosine) runs only on candidates.
  */
object Dedup {
  val P = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val BandSize = 4 // → 4 bands over 16 minhashes

  /** (A_j, B_j) mix coefficients, derived from the shared LCG (seed 7000). */
  def coeffs(n: Int = NumHashes, seed: Long = 7000): IndexedSeq[(Long, Long)] =
    (0 until n).map { j =>
      val a = 1L + (LcgPlanes.A * (seed + 2 * j) + LcgPlanes.C) % LcgPlanes.M % (P - 1)
      val b = (LcgPlanes.A * (seed + 2 * j + 1) + LcgPlanes.C) % LcgPlanes.M % P
      (a, b)
    }

  // ---------------------------------------------------------------- Spark

  /** Portable 60-bit hash of a string column. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Distinct 3-word shingles per doc. `split` is projected ONCE into `w`
    * before the lambda indexes it — inlining it would re-tokenize the whole
    * text for every element_at reference (~300 regex splits per doc, the
    * dominant cost of the naive formulation at sf0.1). Docs shorter than
    * one shingle yield an EMPTY list: Spark's `sequence(1, 0)` counts DOWN
    * (→ [1,0] → null shingles) while DuckDB's generate_series is empty —
    * the guard pins the DuckDB semantics on both sides. */
  private[graft] def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), array_distinct(expr(
        "CASE WHEN size(w) < 3 THEN array() ELSE transform(sequence(1, size(w) - 2), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2))) END")).as("sh"))

  /** Session-scoped tokenize-once memo: (shingles(doc_id, sh),
    * shingleHash(doc_id, h)) per (session, dir), each localCheckpointed on
    * first use. The regex tokenization + per-shingle md5 is the dominant
    * corpus pass of the whole dedup family (d2/d3/d4/d6, f2 via d3/d7) —
    * before this memo each query re-derived it per run even though every
    * one of them consumes the identical table. At 100 TB this pair IS the
    * persisted shingle table all dedup jobs read (the p2 pattern); the memo
    * is its single-JVM analog. Entries are keyed on session identity, so a
    * new session (whose checkpoints would be dead) builds fresh ones; the
    * handful of retained frames per (session, dir) is driver-side metadata
    * only (the blocks live on executors and die with the session).
    *
    * The doc_id repartition parallelizes the split+md5 work — the test
    * corpus is ONE parquet file, so without it the whole corpus pass runs
    * as a single task. At 100 TB the input is thousands of files and the
    * scan is already parallel; the repartition then just pre-clusters by
    * doc_id, which the downstream per-doc aggregates want anyway. */
  private val corpusCache =
    new BoundedMemo[(SparkSession, String), (DataFrame, DataFrame)](4)({
      case (a, b) => BoundedMemo.unpersistDf(a); BoundedMemo.unpersistDf(b)
    })

  private[graft] def corpusShingles(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    corpusCache.getOrElseUpdate((spark, dir)) {
      val shingles = withShingles(
        Tables.documents(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id")))
        .localCheckpoint()
      val hashes = shingles.select(col("doc_id"), explode(col("sh")).as("s"))
        .select(col("doc_id"), (h60(col("s")) % P).as("h"))
        .localCheckpoint()
      (shingles, hashes)
    }

  /** (doc_id, h) — one row per distinct 3-word shingle, h = h60 mod P;
    * served from the session memo. */
  private def shingleHashes(spark: SparkSession, dir: String): DataFrame =
    corpusShingles(spark, dir)._2

  /** Banded MinHash keys `(doc_id, band_idx, band_key)` from an exploded
    * shingle-hash frame — the band construction shared by d3/p2/d8/f8
    * (one partial-agg minhash signature, then the band explode). */
  private[graft] def minhashBands(sh: DataFrame): DataFrame = {
    val aggs = coeffs().zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$j")
    }
    val bandCols = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(i => col(s"m${b * BandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(":", parts: _*)).as("band_key"))
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx"), col("bd.band_key"))
  }

  /** The PERSISTED distinct shingle-hash table, bucketed+sorted by `h` —
    * the on-disk form of [[corpusShingles]]'s in-flight memo and the
    * artifact a 100 TB dedup deployment maintains next to its corpus (the
    * p2 band-table convention applied to raw shingle hashes). Bucketing by
    * `h` is the load-bearing choice: d6's df-cap count window and its
    * candidate self-join BOTH cluster on `h`, so every consumer reads the
    * table pre-shuffled — the tokenize+hash+distinct corpus pass is paid
    * once per (session, corpus), at build, not per query. The table name
    * carries a corpus-dir fingerprint so two dirs served by one session
    * (the bench's dual-SF pass) can never read each other's artifact. */
  private val shingleIndexCache =
    new BoundedMemo[(SparkSession, String), DataFrame](4)(_ => ())

  private[graft] def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    shingleIndexCache.getOrElseUpdate((spark, dir)) {
      val table = "graft_idx_shingles_" +
        java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
      Persist.materializeBucketed(spark, shingleHashes(spark, dir).distinct(),
        table, 8, Seq("h"))
    }

  /** d1: exact-dup accounting per source via text hash. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"))
      .orderBy("source")

  val exactOracle: String =
    """SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
      |       count(*) - count(DISTINCT md5(text)) AS n_dup_docs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** d26: DUPLICATION INFLATION — each source's EFFECTIVE token mass
    * after global NEAR-dup dedup, the "what are we actually paying for"
    * readout beside d25's who-duplicates-whom matrix: d25 says which
    * feed pairs duplicate each other; this prices it — training cost and
    * data value are TOKEN-denominated, so every redundant token is
    * attributed GLOBALLY (a doc whose near-dup cluster a smaller id
    * already represents is redundant mass wherever it lives — d7's
    * min-id-keeper convention, and the CC label IS that min id, so
    * redundancy is one predicate on the memoized label table, no keeper
    * join). One edge-sized label read + one doc-keyed join + one
    * source-grouped fold; share exact-integer Q4. At 100 TB this is the
    * renewal-decision row per feed: a source at 40% redundant tokens is
    * paying 1.7× per effective token. */
  def dupInflation(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // converged CC labels are min-id roots: redundant ⇔ id ≠ label
    val redundant = clusterLabelsFor(spark, dir, tau)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"), lit(1L).as("is_dup"))
    docs.join(redundant, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"),
        sum(when(col("is_dup") === 1L, col("n_tok")).otherwise(0L)).as("n_dup_tokens"))
      .withColumn("dup_token_share_q4",
        expr("n_dup_tokens * 10000 div n_tokens"))
      .orderBy("source")
  }

  def dupInflationOracle(tau: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM (${minhashLshOracle(tau)})),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
       |red AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id),
       |d AS (SELECT source, doc_id,
       |             len(string_split(text, ' '))::BIGINT AS n_tok
       |      FROM documents)
       |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       |       sum(CASE WHEN red.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       |       sum(CASE WHEN red.doc_id IS NOT NULL THEN n_tok ELSE 0 END)::BIGINT AS n_dup_tokens,
       |       ((sum(CASE WHEN red.doc_id IS NOT NULL THEN n_tok ELSE 0 END) * 10000)
       |         // sum(n_tok))::BIGINT AS dup_token_share_q4
       |FROM d LEFT JOIN red USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  /** d2: 16 MinHash signature values per document over 3-word shingles. */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleHashes(spark, dir)
    val aggs = coeffs().zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$j")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).orderBy("doc_id")
  }

  // shared SQL CTE: per-doc distinct shingle hashes
  private[graft] val shingleSqlCte: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |              unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                    for i in generate_series(1, len(w) - 2)])) AS s
      |       FROM w),
      |h AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh)""".stripMargin

  private[graft] def minhashSqlSelect: String = {
    val cols = coeffs().zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % $P) AS m$j"
    }.mkString(", ")
    s"SELECT doc_id, $cols FROM h GROUP BY doc_id"
  }

  val minhashOracle: String =
    s"""WITH $shingleSqlCte
       |$minhashSqlSelect ORDER BY doc_id""".stripMargin

  /** d3: banded-LSH candidate pairs + exact shingle Jaccard ≥ τ.
    *
    * The tokenize+shingle pass — the dominant cost on a text corpus — runs
    * ONCE PER SESSION ([[corpusShingles]]): the memoized pair feeds the
    * signature aggregate AND both sides of the candidate rerank
    * (un-checkpointed, the same subtree executed 3×: signatures, sa, sb —
    * the rerank joins shuffle on different keys, so AQE exchange reuse
    * cannot dedupe them) — and d2/d4/d6/f2 in the same session. At 100 TB
    * this line is the persisted shingle table; d7/f2 inherit the saving
    * through this candidate pipeline. */
  def minhashLsh(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val (shingles, sh) = corpusShingles(spark, dir)
    val aggs = coeffs().zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$j")
    }
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)

    val bandCols = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(i => col(s"m${b * BandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(":", parts: _*)).as("band_key"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx"), col("bd.band_key"))

    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()

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

  /** d16: MinHash CALIBRATION eval — v25's measure-the-approximation
    * discipline applied to dedup: for every banded candidate pair, the
    * signature-agreement estimate (matching coords / 16, the quantity
    * LSH banding actually thresholds on) next to the exact Jaccard, as a
    * gated query. The per-pair agreement count is exact integer equality
    * over the 16 signature coordinates — a 16-term conditional sum both
    * engines compute identically — and the exact Jaccard is d3's
    * candidate-side division, so approximation QUALITY itself hash-gates.
    * Cost over d3: one extra signature join on the (small) pair set. */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val (shingles, sh) = corpusShingles(spark, dir)
    val aggs = coeffs().zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$j")
    }
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(i => col(s"m${b * BandSize + i}"))
      struct(lit(b).as("band_idx"), md5(concat_ws(":", parts: _*)).as("band_key"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx"), col("bd.band_key"))
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val sigA = sig.select(col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(j => col(s"m$j").as(s"a$j")): _*)
    val sigB = sig.select(col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(j => col(s"m$j").as(s"b$j")): _*)
    val m16 = (0 until NumHashes).map(j =>
      when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    pairs
      .join(sigA, Seq("doc_a")).join(sigB, Seq("doc_b"))
      .join(shingles.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(shingles.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), m16.as("m16"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def minhashCalibrationOracle: String = {
    val bandArms = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(i => s"m${b * BandSize + i}").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws(':', $parts)) AS band_key FROM sig"
    }.mkString("\nUNION ALL\n")
    val m16 = (0 until NumHashes).map(j =>
      s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $shingleSqlCte,
       |sig AS ($minhashSqlSelect),
       |bands AS ($bandArms),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bands a JOIN bands b
       |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |           AND a.doc_id < b.doc_id),
       |mm AS (SELECT p.doc_a, p.doc_b, ($m16)::BIGINT AS m16
       |       FROM pairs p JOIN sig sa ON p.doc_a = sa.doc_id
       |                    JOIN sig sb ON p.doc_b = sb.doc_id),
       |shl AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                      for i in generate_series(1, len(w) - 2)]) AS sh FROM w),
       |j AS (SELECT mm.doc_a, mm.doc_b, mm.m16,
       |             len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |             len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE AS jaccard
       |      FROM mm JOIN shl sa ON mm.doc_a = sa.doc_id JOIN shl sb ON mm.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, m16, jaccard FROM j ORDER BY doc_a, doc_b""".stripMargin
  }

  def minhashLshOracle(tau: Double = 0.5): String = {
    val bandArms = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(i => s"m${b * BandSize + i}").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws(':', $parts)) AS band_key FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""WITH $shingleSqlCte,
       |sig AS ($minhashSqlSelect),
       |bands AS ($bandArms),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bands a JOIN bands b
       |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |shl AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                      for i in generate_series(1, len(w) - 2)]) AS sh FROM w),
       |j AS (SELECT p.doc_a, p.doc_b,
       |             len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |             len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE AS jaccard
       |      FROM pairs p JOIN shl sa ON p.doc_a = sa.doc_id JOIN shl sb ON p.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $tau ORDER BY doc_a, doc_b""".stripMargin
  }

  /** d4: 32-bit text SimHash over shingle hashes; near-dup pairs with
    * hamming ≤ 6 found via 8-bit band join (never all-pairs). */
  def simhashText(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    graft.Graft.init(spark)
    val sh = shingleHashes(spark, dir)
    // one int[32]-buffer aggregate instead of 32 conditional sums
    // (graft.functions.SimhashBitsAgg) — same bit rule as the 32-sum oracle.
    // Materialize ONCE (the d6/p2 pattern): sigs is one 16-byte row per doc,
    // but its lineage is the full shingle scan + simhash aggregate — the
    // band self-join below would otherwise run that subtree on BOTH sides
    // (measured 2.2× on d4 at sf0.1; at 100 TB this table is persisted).
    val sigs = sh.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.call_function("graft_simhash_agg", col("h")).as("sim"))
      .localCheckpoint()

    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band_idx"), shiftright(col("sim"), b * 8).bitwiseAND(lit(255L)).as("band_val"))
    }
    val bands = sigs.select(col("doc_id"), col("sim"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("sim"), col("bd.band_idx"), col("bd.band_val"))

    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  def simhashTextOracle(maxHamming: Int = 6): String = {
    val bitSumCols = (0 until 32).map { k =>
      s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS b$k"
    }.mkString(", ")
    val simExpr = (0 until 32).map(k => s"(CASE WHEN b$k >= 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    val bandArms = (0 until 4).map { b =>
      s"SELECT doc_id, sim, $b AS band_idx, (sim >> ${b * 8}) & 255 AS band_val FROM sigs"
    }.mkString("\nUNION ALL\n")
    s"""WITH $shingleSqlCte,
       |bits AS (SELECT doc_id, $bitSumCols FROM h GROUP BY doc_id),
       |sigs AS (SELECT doc_id, ($simExpr)::BIGINT AS sim FROM bits),
       |bands AS ($bandArms),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                 bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
       |          FROM bands a JOIN bands b
       |            ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin
  }

  /** d5: embedding-cosine near-dup pairs (LSH-bucketed, τ on exact cosine),
    * joined back to document metadata. */
  def embeddingNearDup(spark: SparkSession, dir: String, tau: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    Lsh.simJoin(spark, dir, tau)
      .join(docs.select(col("doc_id").as("id_a"), col("source").as("src_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("source").as("src_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("score"),
        (col("src_a") === col("src_b")).as("same_source"))
      .orderBy("id_a", "id_b")
  }

  def embeddingNearDupOracle(tau: Double = 0.3): String = {
    val inner = Lsh.simJoinOracle(tau)
    s"""WITH pairs AS ($inner)
       |SELECT p.id_a, p.id_b, p.score, (da.source = db.source) AS same_source
       |FROM pairs p JOIN documents da ON p.id_a = da.doc_id JOIN documents db ON p.id_b = db.doc_id
       |ORDER BY p.id_a, p.id_b""".stripMargin
  }

  /** d6: EXACT 3-gram Jaccard pairs via an inverted shingle index — an
    * equi-join on the shingle hash produces (pair, common-shingle count),
    * and |A∪B| = |A|+|B|−common closes the exact Jaccard without ever
    * materializing an all-pairs product: pairs sharing zero shingles have
    * J = 0 < τ and are never generated. (Round 1 used a crossJoin over a
    * 100-doc window, which both missed all 25 planted near-dup pairs —
    * their ids span 8..486, so the oracle compare was vacuously 0=0 — and
    * was the one all-pairs shape in the suite.)
    *
    * Hot-shingle blowup is bounded by a DOCUMENT-FREQUENCY CAP, not a
    * document-id fence: shingles appearing in more than `dfCap` docs are
    * dropped from BOTH the index and the per-doc set sizes (the standard
    * "stop-shingle" move), so any single shingle contributes at most
    * C(dfCap, 2) candidate pairs no matter how big the corpus — boilerplate
    * n-grams can never quadratic-join. Jaccard is then exact over the
    * capped shingle sets on both engines. `dfCap` is corpus-size-agnostic:
    * near-dup pairs share RARE shingles (df ≈ 2), which always survive.
    * (Measured at sf0.1: dfCap=10 → 458k candidate rows; uncapped ≈ 3×
    * that from a handful of boilerplate shingles. Too-aggressive capping
    * backfires — dfCap=5 shrinks set sizes so far that one shared rare
    * shingle clears τ, 29× more pairs, all noise.) */
  /** The df-capped candidate machinery shared by d6 (Jaccard) and d14
    * (containment): pair rows (doc_a, doc_b, common, na, nb) from the
    * persisted bucketed shingle table. Because the table is bucketed by
    * `h`, the df-cap count window AND both sides of the pair self-join
    * read it already clustered — zero exchanges until the per-pair
    * aggregates (plan-asserted in PersistSpec via d6). */
  private def cappedPairStats(spark: SparkSession, dir: String, dfCap: Long): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val kept = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= dfCap).drop("df")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
  }

  def ngramJaccard(spark: SparkSession, dir: String, tau: Double = 0.2, dfCap: Long = 10): DataFrame =
    // served from the PERSISTED bucketed shingle table (distinct applied at
    // build — h60 collisions within a doc would double-count; both engines
    // dedup): the tokenize+hash pass that used to be rebuilt per run is the
    // standing artifact
    cappedPairStats(spark, dir, dfCap)
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("doc_a", "doc_b")

  /** d14: CONTAINMENT dedup (Broder's resemblance vs containment split) —
    * Jaccard misses the quote/partial-copy case: a short document wholly
    * embedded in a long one has tiny |A∩B|/|A∪B| but containment
    * |A∩B|/min(|A|,|B|) ≈ 1. This is the screen that catches boilerplate
    * wrappers, quoted excerpts and doc-in-doc concatenations that
    * near-dup dedup (d2–d7) structurally cannot. Same capped candidate
    * machinery and artifact as d6 — one extra arithmetic projection, so
    * the marginal cost of ALSO running the containment screen in a
    * pipeline that runs d6 is one cheap tail. Exact integer ratio →
    * hash-gates. */
  def containment(spark: SparkSession, dir: String, tau: Double = 0.4, dfCap: Long = 10): DataFrame =
    cappedPairStats(spark, dir, dfCap)
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"),
        (col("na") <= col("nb")).as("a_is_smaller"))
      .filter(col("containment") >= tau)
      .orderBy("doc_a", "doc_b")

  def containmentOracle(tau: Double = 0.4, dfCap: Long = 10): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |              unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                    for i in generate_series(1, len(w) - 2)])) AS s
       |       FROM w),
       |h0 AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh),
       |df AS (SELECT h, count(*) AS df FROM h0 GROUP BY h),
       |h AS (SELECT h0.doc_id, h0.h FROM h0 JOIN df USING (h) WHERE df.df <= $dfCap),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
       |cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |       FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |c AS (SELECT cm.doc_a, cm.doc_b,
       |             cm.common::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE AS containment,
       |             (sa.n_sh <= sb.n_sh) AS a_is_smaller
       |      FROM cm JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, containment, a_is_smaller FROM c
       |WHERE containment >= $tau ORDER BY doc_a, doc_b""".stripMargin

  /** d15: keep-LONGEST containment curation — d14's screen turned into a
    * drop decision: every document contained (containment ≥ τ) in a
    * larger one is dropped in favor of its best container (the superset
    * doc), the opposite orientation from d11's keep-best-QUALITY rule —
    * for quote/wrapper/concatenation dups the longer document is the
    * information-superset and quality scores tie. Pair orientation is a
    * projection; the per-dropped-doc argmax over containers is ONE
    * `max(struct)` partial agg (containment desc, container size desc,
    * id asc — d11's recipe), so the marginal cost over d14 is one
    * aggregate on the (small) pair set; the corpus is never re-scanned.
    * Equal-size mutual containment keeps the lower doc_id. `kept` names
    * the DIRECT container: in an A⊂B⊂C chain B is itself dropped — A
    * and B are both (correctly) dropped, and full cluster resolution is
    * d7's job, not this screen's. */
  def keepLongest(spark: SparkSession, dir: String, tau: Double = 0.4, dfCap: Long = 10): DataFrame = {
    val smallerIsA = col("na") < col("nb")
    cappedPairStats(spark, dir, dfCap)
      .withColumn("containment",
        col("common").cast("double") / least(col("na"), col("nb")).cast("double"))
      .filter(col("containment") >= tau)
      .select(
        when(smallerIsA, col("doc_a")).otherwise(col("doc_b")).as("dropped"),
        when(smallerIsA, col("doc_b")).otherwise(col("doc_a")).as("kept"),
        col("containment"),
        greatest(col("na"), col("nb")).as("kept_n"))
      .groupBy(col("dropped"))
      .agg(max(struct(col("containment").as("c"), col("kept_n").as("n"),
        (-col("kept")).as("nk"))).as("best"))
      .select(col("dropped"), (-col("best.nk")).as("kept"),
        col("best.c").as("containment"))
      .orderBy("dropped")
  }

  def keepLongestOracle(tau: Double = 0.4, dfCap: Long = 10): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |              unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                    for i in generate_series(1, len(w) - 2)])) AS s
       |       FROM w),
       |h0 AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh),
       |df AS (SELECT h, count(*) AS df FROM h0 GROUP BY h),
       |h AS (SELECT h0.doc_id, h0.h FROM h0 JOIN df USING (h) WHERE df.df <= $dfCap),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
       |cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |       FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |c AS (SELECT cm.doc_a, cm.doc_b, sa.n_sh AS na, sb.n_sh AS nb,
       |             cm.common::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE AS containment
       |      FROM cm JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id
       |      WHERE cm.common::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE >= $tau),
       |o AS (SELECT CASE WHEN na < nb THEN doc_a ELSE doc_b END AS dropped,
       |             CASE WHEN na < nb THEN doc_b ELSE doc_a END AS kept,
       |             containment, greatest(na, nb) AS kept_n
       |      FROM c),
       |r AS (SELECT dropped, kept, containment,
       |             row_number() OVER (PARTITION BY dropped
       |                                ORDER BY containment DESC, kept_n DESC, kept) AS rn
       |      FROM o)
       |SELECT dropped, kept, containment FROM r WHERE rn = 1 ORDER BY dropped""".stripMargin

  /** d7: duplicate-cluster assignment — connected components over the d3
    * near-dup pair graph, i.e. the "keep one representative per duplicate
    * group" step a curation pipeline runs after candidate generation.
    *
    * Spark shape: alternating large-star/small-star contraction (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    * O(log d)-round MapReduce CC algorithm, vs O(diameter) for plain label
    * propagation. Each round is two equi-join+partial-min passes over the
    * EDGE list only (which after candidate filtering is a small fraction of
    * the corpus), `localCheckpoint` truncates lineage so plan size stays
    * O(1) in the round count, and the convergence check reads the
    * already-materialized round output — no extra pass over data. Exits
    * LOUDLY (IllegalStateException) if `maxRounds` is hit while still
    * contracting, so a pathological graph can never silently ship wrong
    * labels.
    */
  def dupClusters(spark: SparkSession, dir: String, tau: Double = 0.5,
                  maxRounds: Int = 25): DataFrame =
    // d7 is the clustering BUILD op: always recompute, so its bench number
    // prices a full contraction run (the v8/v14 registry convention —
    // consumers read the memo, the build query never does)
    dupClustersFrom(connectedComponents(
      minhashLsh(spark, dir, tau).select(col("doc_a"), col("doc_b")), maxRounds))

  /** (doc_id, cluster_id, cluster_size) from a raw (id, label) table. */
  private def dupClustersFrom(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
      .orderBy("cluster_id", "doc_id")
  }

  /** Session-scoped duplicate-cluster label memo, keyed (session, dir, τ):
    * the CC label table is the third reusable dedup artifact after the
    * shingle pair ([[corpusShingles]]) — f2 applies it to the corpus, d11
    * picks representatives from it, and each was re-running the whole
    * candidate pipeline + contraction loop per query. At 100 TB this IS
    * the persisted cluster-label table a curation pipeline maintains
    * alongside its corpus; the memo is its single-JVM analog. d7 itself
    * deliberately bypasses it (build op — see [[dupClusters]]). */
  private val labelCache =
    new BoundedMemo[(SparkSession, String, Double), DataFrame](8)(BoundedMemo.unpersistDf)

  private[graft] def clusterLabelsFor(spark: SparkSession, dir: String, tau: Double): DataFrame =
    labelCache.getOrElseUpdate((spark, dir, tau)) {
      connectedComponents(minhashLsh(spark, dir, tau).select(col("doc_a"), col("doc_b")))
        .localCheckpoint()
    }

  /** Connected components over an undirected pair list `(doc_a, doc_b)` →
    * `(id, label)` with label = min id in the component. Reusable by any
    * pair source (d3 minhash bands, d4 simhash, d5 embedding cosine).
    *
    * Large-star/small-star: edges are kept oriented big→small (`u > v`);
    * large-star hangs every neighbor larger than `u` off `u`'s minimum
    * neighbor, small-star re-points `u` and its smaller neighbors at that
    * minimum. The alternation converges in O(log d) rounds to per-component
    * stars whose centers are the component minima — at which point the edge
    * list IS the label assignment. Every op is an equi-join + partial `min`
    * on the edge list; nothing ever touches the corpus again.
    */
  private[graft] def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val Seq(a, b) = pairs.columns.toSeq.map(col)
    // orient big→small; materialize ONCE (this runs the candidate pipeline),
    // then lay the list out by its ACTUAL size: the edge list is the
    // POST-candidate-filter pair set, orders of magnitude smaller than the
    // corpus, and its count is free once materialized. ~500k edge rows per
    // partition keeps each loop stage scheduling O(edges/500k) tasks —
    // 1 at test scale, parallelism-capped at 100 TB. `coalesce` narrows
    // the checkpointed partitions without a shuffle (and is a no-op if the
    // materialized layout is already at or below the target).
    var edges = pairs.filter(a =!= b)
      .select(greatest(a, b).as("u"), least(a, b).as("v"))
      .localCheckpoint()
    val rowsPerPartition = 500000L
    val nParts = math.max(1L, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism.toLong,
      (edges.count() + rowsPerPartition - 1) / rowsPerPartition)).toInt
    edges = edges.coalesce(nParts)

    // large-star: for each node n, m(n) = min(n ∪ neighbors); every neighbor
    // LARGER than n re-attaches to m(n). Output stays big→small and
    // self-loop-free (v > n ≥ m, strictly). Duplicate output edges are left
    // in place — small-star's `min` and the round-end distinct absorb them,
    // saving a shuffle per round.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star (input big→small): node n and all its smaller neighbors
    // attach to m(n) = min neighbor. Self-loops (v == m) drop out.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // Convergence test: the round output is a disjoint union of stars ⟺
    // (a) no edge's target is itself a source AND (b) every source has
    // out-degree 1. BOTH are required: two stars sharing a leaf (e.g.
    // {5→1, 5→2, 8→1, 9→2} from pairs {8-5, 8-1, 9-5, 9-2}) satisfy (a)
    // alone while node 5 still points at two roots — declaring convergence
    // there splits one component in two and double-labels the shared leaf.
    // Stars proper are fixpoints of both ops, so (a)+(b) is exact.
    //
    // Per node n over the round output: outs(n) = out-degree, ins(n) =
    // in-degree. (a) ⟺ no n has outs>0 AND ins>0; (b) ⟺ max outs ≤ 1.
    // Both come from ONE explode→groupBy pass over the already-
    // materialized (tiny, post-contraction) edge list — the round-5 shape
    // instead ran a distinct + left-join INSIDE the heavy contraction job
    // to tag each edge, then a second grouped agg to reduce the tags; the
    // checkpointed job is now pure contraction and the check costs one
    // small two-stage job. A near-clique graph (the band dedup shape)
    // still finishes in a SINGLE heavy round.
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val s = next.select(explode(array(
          struct(col("u").as("n"), lit(1L).as("o"), lit(0L).as("i")),
          struct(col("v").as("n"), lit(0L).as("o"), lit(1L).as("i")))).as("x"))
        .groupBy(col("x.n"))
        .agg(sum(col("x.o")).as("outs"), sum(col("x.i")).as("ins"))
        .agg(max(when(col("outs") > 0 && col("ins") > 0, 1L).otherwise(0L)),
          max(col("outs"))).collect()(0)
      converged = (s.isNullAt(0) || s.getLong(0) == 0L) && // no source-of-a-target chains
        (s.isNullAt(1) || s.getLong(1) <= 1L) // every source points at ONE root
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: still contracting after $maxRounds large-star/small-star rounds " +
          "— graph needs a higher maxRounds")
    // converged stars: every (u, root) edge labels u; roots label themselves
    edges.select(col("u").as("id"), col("v").as("label"))
      .union(edges.select(col("v").as("id"), col("v").as("label")))
      .distinct()
  }

  /** Transitive closure over the same pair graph via recursive CTE — exact
    * same fixpoint the propagation loop reaches. */
  def dupClustersOracle(tau: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM (${minhashLshOracle(tau)})),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, s.cluster_size
       |FROM lab l JOIN sz s USING (cluster_id)
       |ORDER BY cluster_id, doc_id""".stripMargin

  /** d20: UNIFIED dedup clusters — the lexical (d3 MinHash-banded) and
    * semantic (d18 SemDeDup co-cluster cosine) pair graphs fused into ONE
    * connected-components label table. Production curation combines the
    * two signals because each catches what the other misses: paraphrases
    * and re-encodings share meaning but few shingles (lexical misses),
    * templated boilerplate shares shingles but may embed apart (semantic
    * misses); a doc joined to one partner lexically and another
    * semantically transitively merges all three. Cost: one UNION of two
    * edge-sized pair lists + the same d7 contraction — the corpus is
    * never rescanned, both candidate pipelines are the bucketed shapes
    * already gated. */
  def unifiedClusters(spark: SparkSession, dir: String, lexTau: Double = 0.5,
                      semTau: Double = 0.4, maxRounds: Int = 25): DataFrame = {
    graft.Graft.init(spark)
    val lex = minhashLsh(spark, dir, lexTau).select(col("doc_a"), col("doc_b"))
    val sem = semDedup(spark, dir, semTau).select(col("doc_a"), col("doc_b"))
    dupClustersFrom(connectedComponents(lex.union(sem).distinct(), maxRounds))
  }

  def unifiedClustersOracle(lexTau: Double = 0.5, semTau: Double = 0.4): String =
    s"""WITH RECURSIVE lexp AS (SELECT doc_a, doc_b FROM (${minhashLshOracle(lexTau)})),
       |semp AS (SELECT doc_a, doc_b FROM (${semDedupOracle(semTau)})),
       |pairs AS (SELECT doc_a, doc_b FROM lexp UNION SELECT doc_a, doc_b FROM semp),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, s.cluster_size
       |FROM lab l JOIN sz s USING (cluster_id)
       |ORDER BY cluster_id, doc_id""".stripMargin

  /** d11: canonical-copy selection — the curation decision AFTER d7's
    * clustering: each duplicate cluster keeps its highest-QUALITY member
    * (t2's quality formula; ties → lowest doc_id), not the arbitrary
    * min-id representative f2 retires to. This is what production dedup
    * actually ships — of N crawls of the same page, keep the cleanest.
    *
    * Scale shape: d7's label table is edge-sized (only clustered docs);
    * the quality side is a map-only projection of the corpus; the join is
    * doc_id-keyed and the argmax is ONE partial-agg `max(struct)` per
    * cluster (highest quality, ties lowest id — struct ordering is
    * lexicographic by field), so the shuffle carries one row per cluster
    * member, combined map-side to one row per cluster per task. No
    * window, no second corpus pass. Quality doubles compare exactly in
    * both engines (t2's gate proves the formula bit-identical), so the
    * selection — and the emitted score — hash-gates. */
  def keepBestCopy(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame =
    keepBestCopyFrom(spark, dir, clusterLabelsFor(spark, dir, tau))

  /** [[keepBestCopy]] over an explicit (id, label) table — lets p5 drive
    * the identical selection from the RELOADED persisted label table. */
  private[graft] def keepBestCopyFrom(spark: SparkSession, dir: String,
                                      labels: DataFrame): DataFrame = {
    val clusters = dupClustersFrom(labels)
    val quality = Text.qualityFrame(Tables.documents(spark, dir))
      .select(col("doc_id"), col("quality"))
    clusters
      .join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg"))).as("best"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("best.neg")).as("kept_doc_id"), col("best.quality").as("kept_quality"))
      .orderBy("cluster_id")
  }

  def keepBestCopyOracle(tau: Double = 0.5): String =
    s"""WITH lab AS (SELECT doc_id, cluster_id, cluster_size FROM (${dupClustersOracle(tau)})),
       |q AS (SELECT doc_id, quality FROM (${Text.qualityOracle})),
       |r AS (SELECT l.cluster_id, l.cluster_size, q.doc_id, q.quality,
       |             row_number() OVER (PARTITION BY l.cluster_id
       |                                ORDER BY q.quality DESC, q.doc_id) AS rn
       |      FROM lab l JOIN q ON l.doc_id = q.doc_id)
       |SELECT cluster_id, cluster_size, doc_id AS kept_doc_id, quality AS kept_quality
       |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** d12: train/eval split-LEAKAGE report — near-dup pairs (d3's banded
    * candidates + exact Jaccard) that STRADDLE t6's split boundaries: an
    * eval doc with a train-side near-duplicate is contamination from the
    * moment the split ships, the within-corpus twin of d9/d10's
    * external-benchmark check.
    *
    * Scale shape: t6's split is a PURE hash of doc_id, so both endpoints'
    * labels are PROJECTED straight onto the edge list — the corpus is
    * never joined, shuffled, or rescanned; d12 costs d3 plus a map-only
    * pass over the (edge-sized) pair list. This is exactly why the split
    * rule is a content-stable hash and not an RNG or a lookup table. */
  /** d25: CROSS-SOURCE DUPLICATION MATRIX — near-dup pairs aggregated by
    * the (source, source) cell they connect: the data-card view that tells
    * a curation team WHICH feeds duplicate each other (two crawls of the
    * same sites, a dataset re-released inside another, mirror domains)
    * versus which duplication is internal (diagonal cells). Decides real
    * actions: drop a feed wholesale vs dedup within it. Built ON the d3
    * banded candidate pairs (never all-pairs): the edge-sized pair set
    * joins `documents` for both endpoints' sources — id-keyed shuffle
    * joins, nothing broadcast by promise (the d24 rule: pair and corpus
    * sides are both corpus-proportional) — then one cell aggregate.
    * Cells are canonicalized (least, greatest) so the matrix is
    * upper-triangular including the diagonal. Mean Jaccard per cell is
    * exact fixed-point: per-pair q4 quantization BEFORE the sum, integer
    * division after (never a float reduction). Output bounded by
    * |sources|² at any corpus size. */
  def crossSourceDup(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    minhashLsh(spark, dir, tau)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_x"),
        greatest(col("sa"), col("sb")).as("source_y"),
        floor(col("jaccard") * 1e4 + 0.5).cast("long").as("jq4"))
      .groupBy(col("source_x"), col("source_y"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(jq4) div count(1)").as("mean_jaccard_q4"))
      .orderBy("source_x", "source_y")
  }

  def crossSourceDupOracle(tau: Double = 0.5): String =
    s"""WITH prs AS (SELECT doc_a, doc_b, jaccard FROM (${minhashLshOracle(tau)})),
       |j AS (SELECT least(da.source, db.source) AS source_x,
       |             greatest(da.source, db.source) AS source_y,
       |             floor(p.jaccard * 10000 + 0.5)::BIGINT AS jq4
       |      FROM prs p JOIN documents da ON p.doc_a = da.doc_id
       |                 JOIN documents db ON p.doc_b = db.doc_id)
       |SELECT source_x, source_y, count(*)::BIGINT AS n_pairs,
       |       sum(jq4)::BIGINT // count(*)::BIGINT AS mean_jaccard_q4
       |FROM j GROUP BY 1, 2 ORDER BY source_x, source_y""".stripMargin

  def splitLeakage(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    minhashLsh(spark, dir, tau)
      .withColumn("split_a", Text.splitLabel(col("doc_a")))
      .withColumn("split_b", Text.splitLabel(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def splitLeakageOracle(tau: Double = 0.5): String =
    s"""WITH p AS (SELECT doc_a, doc_b, jaccard FROM (${minhashLshOracle(tau)})),
       |s AS (SELECT doc_a, doc_b,
       |             ${Text.splitLabelSql("doc_a")} AS split_a,
       |             ${Text.splitLabelSql("doc_b")} AS split_b,
       |             jaccard FROM p)
       |SELECT doc_a, doc_b, split_a, split_b, jaccard FROM s
       |WHERE split_a <> split_b ORDER BY doc_a, doc_b""".stripMargin

  def ngramJaccardOracle(tau: Double = 0.2, dfCap: Long = 10): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |              unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                    for i in generate_series(1, len(w) - 2)])) AS s
       |       FROM w),
       |h0 AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh),
       |df AS (SELECT h, count(*) AS df FROM h0 GROUP BY h),
       |h AS (SELECT h0.doc_id, h0.h FROM h0 JOIN df USING (h) WHERE df.df <= $dfCap),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
       |cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |       FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |j AS (SELECT cm.doc_a, cm.doc_b,
       |             cm.common::DOUBLE / (sa.n_sh + sb.n_sh - cm.common)::DOUBLE AS jaccard
       |      FROM cm JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $tau ORDER BY doc_a, doc_b""".stripMargin

  /** d13: bucket-skew audit — the accounting a dedup pipeline runs to
    * find boilerplate buckets BEFORE they quadratic-join (it is exactly
    * this histogram that justifies d6's df-cap and the banding
    * parameters). The bucket key is derived deterministically from the
    * corpus with a planted pathology: every 5th doc lands in ONE bucket
    * (20% of the corpus — the "every page shares the site footer" shape),
    * the rest spread over 97 tail buckets. Each document is then
    * ANNOTATED with its bucket's document frequency by an equi-join
    * against the bucket-stats table — the skewed join an equi-join dedup
    * pipeline actually faces (the hot bucket's docs all hash to one
    * reduce partition), and the scalable alternative to a count-window
    * over the same key: AQE can runtime-split a skewed JOIN partition,
    * but a skewed window partition is one task forever.
    *
    * Scale shape: `hint("merge")` pins sort-merge (the stats table has
    * one row per distinct key — corpus-scale for shingle keys, so
    * broadcast is not an option at 100 TB and would dodge the skew
    * here), and AQE's skew-join machinery then splits the hot partition
    * at runtime — `skew=true`, asserted in PersistSpec on this same
    * function (with `forceOptimizeSkewedJoin`, needed whenever a partial
    * aggregate rides the join's stage, plus test-scale thresholds).
    * Output is two rows of exact integers (hot vs tail: docs, buckets,
    * max df, implied candidate-pair volume, char mass) — the skewed plan
    * hash-gates, and splitting may not change a bit of it. */
  def skewPairs(spark: SparkSession, dir: String): DataFrame = {
    // doc_id repartition: the one-file test corpus gives the scan ONE map
    // task, and AQE splits a skewed reduce partition by MAPPER ranges — a
    // single mapper is unsplittable no matter the thresholds (at 100 TB
    // the scan has thousands of mappers and this is just pre-clustering,
    // the corpusShingles precedent)
    val kd = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, lit(-1L)).otherwise(col("doc_id") % 97).as("k"),
        col("n_chars"))
    // per-bucket document frequency — at 100 TB this is the PERSISTED
    // bucket-stats table (one row per distinct key: corpus-scale for
    // shingle keys, hence the merge hint below — broadcast is impossible
    // there and would dodge the skew here). Materializing it also puts a
    // plain shuffle directly under the join, the shape AQE's skew rule
    // pattern-matches (sort-over-shuffle on both sides).
    val stats = kd.groupBy(col("k")).agg(count(lit(1)).as("df_k")).localCheckpoint()
    kd.hint("merge").join(stats.hint("merge"), Seq("k"))
      .groupBy((col("k") === -1L).as("hot"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("k")).as("n_buckets"),
        max(col("df_k")).as("max_df"),
        expr("CAST(sum(df_k - 1) div 2 AS BIGINT)").as("n_pairs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("hot")
  }

  def skewPairsOracle(): String =
    """WITH kd AS (SELECT doc_id,
      |                   CASE WHEN doc_id % 5 = 0 THEN -1 ELSE doc_id % 97 END AS k,
      |                   n_chars
      |            FROM documents),
      |stats AS (SELECT k, count(*) AS df_k FROM kd GROUP BY k),
      |a AS (SELECT kd.doc_id, kd.k, kd.n_chars, stats.df_k
      |      FROM kd JOIN stats USING (k))
      |SELECT (k = -1) AS hot, count(*)::BIGINT AS n_docs,
      |       count(DISTINCT k)::BIGINT AS n_buckets, max(df_k)::BIGINT AS max_df,
      |       (sum(df_k - 1) // 2)::BIGINT AS n_pairs,
      |       sum(n_chars)::BIGINT AS sum_chars
      |FROM a GROUP BY 1 ORDER BY hot""".stripMargin

  /** d9: benchmark decontamination — the train/eval overlap check every
    * serious training-data pipeline runs before a corpus ships (the
    * n-gram-collision recipe of GPT-3 appendix C / Dolma §4: a training
    * document is contaminated to the degree its n-grams appear verbatim in
    * the held-out benchmark set). The benchmark here is the deterministic
    * `doc_id % benchMod == 0` slice standing in for an external eval
    * suite; every other document is scored.
    *
    * Scale shape: the benchmark n-gram set is SMALL in production (eval
    * suites are thousands of documents, the corpus is billions), so AQE
    * broadcasts it at runtime — no hint, because THIS benchmark is a
    * corpus slice and a hint would promise a bound the slice doesn't
    * keep at 100× — the corpus side is one scan whose per-doc DISTINCT
    * n-grams come from
    * `array_distinct` INSIDE the row (no shuffle to dedup), then a
    * broadcast left join + one doc-keyed partial-agg count. Total: one
    * corpus-sized shuffle of pre-aggregated (doc_id, counts) rows; the
    * corpus n-grams themselves never shuffle. Contamination is an exact
    * integer ratio (both engines divide the same two BIGINTs in IEEE
    * double), so the query hash-gates. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 5,
                    benchMod: Long = 37L): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w")) // tokenize once (HOF-inline trap)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"CASE WHEN size(w) < $n THEN array() ELSE transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n))) END"))).as("gram"))
    val bench = grams.filter(col("doc_id") % benchMod === 0L)
      .select(col("gram")).distinct().withColumn("hit", lit(1L))
    // no broadcast HINT: the benchmark here is a corpus SLICE (the
    // stand-in), so its gram set grows with SF — AQE broadcasts it at
    // any sane benchmark size, and a deployment with a genuinely
    // external (bounded-by-contract) eval suite reads it from its own
    // source where the hint convention applies. d10 is the fixed-size
    // scale path either way.
    grams.filter(col("doc_id") % benchMod =!= 0L)
      .join(bench, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 4))
      .orderBy("doc_id")
  }

  /** d24: EVAL-LEAKAGE report — d9's overlap check pointed the OTHER way
    * (GPT-3 appendix C reports both directions): for each BENCHMARK
    * document, the share of its distinct n-grams found anywhere on the
    * TRAINING side — the number that labels an eval score clean or
    * dirty. d9 scores training docs against the (small) benchmark gram
    * set; here the membership side is the CORPUS-sized training gram
    * set, so nothing is broadcast by promise: bench grams and train
    * grams meet in a gram-keyed LEFT SEMI join — both sides hash by
    * gram, the train side carries no per-doc state through the join,
    * and AQE broadcasts the bench side at test scale where it measures
    * tiny. Exact integer share in Q4 fixed point + the dirty flag at
    * the reporting threshold. */
  def evalLeakage(spark: SparkSession, dir: String, n: Int = 5,
                  benchMod: Long = 37L, dirtyQ4: Long = 1000L): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w")) // tokenize once (HOF-inline trap)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"CASE WHEN size(w) < $n THEN array() ELSE transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n))) END"))).as("gram"))
    val train = grams.filter(col("doc_id") % benchMod =!= 0L).select(col("gram"))
    val bench = grams.filter(col("doc_id") % benchMod === 0L)
    val leaked = bench.join(train, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked"))
    bench.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(leaked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .withColumn("leak_q4", expr("n_leaked * 10000 div n_grams"))
      .withColumn("dirty", col("leak_q4") >= dirtyQ4)
      .orderBy("doc_id")
  }

  def evalLeakageOracle(n: Int = 5, benchMod: Long = 37L, dirtyQ4: Long = 1000L): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT doc_id,
       |             unnest(list_distinct([array_to_string(w[i:i+${n - 1}], ' ')
       |                                   for i in generate_series(1, len(w) - ${n - 1})])) AS gram
       |      FROM w WHERE len(w) >= $n),
       |t AS (SELECT DISTINCT gram FROM g WHERE doc_id % $benchMod <> 0),
       |b AS (SELECT doc_id, gram FROM g WHERE doc_id % $benchMod = 0),
       |lk AS (SELECT b.doc_id, count(*)::BIGINT AS n_leaked
       |       FROM b JOIN t ON b.gram = t.gram GROUP BY b.doc_id),
       |ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM b GROUP BY doc_id)
       |SELECT ng.doc_id, ng.n_grams, coalesce(lk.n_leaked, 0)::BIGINT AS n_leaked,
       |       (coalesce(lk.n_leaked, 0) * 10000) // ng.n_grams AS leak_q4,
       |       (coalesce(lk.n_leaked, 0) * 10000) // ng.n_grams >= $dirtyQ4 AS dirty
       |FROM ng LEFT JOIN lk USING (doc_id) ORDER BY doc_id""".stripMargin

  /** d10: Bloom-filter decontamination — the same train/eval overlap check
    * as [[decontaminate]] (d9), but with the benchmark n-gram set compressed
    * into a FIXED-SIZE bitset instead of broadcast as strings. At 100 TB the
    * d9 shape ships every distinct benchmark gram to every executor (eval
    * suites reach GBs of distinct grams); the Bloom shape ships `mBits/8`
    * bytes (8 KiB here) no matter how large the benchmark grows, and the
    * corpus-side membership test is pure map-side codegen bit math — no join
    * at all, just the final per-doc partial-agg count. That makes d10 the
    * zero-shuffle screen a pipeline runs FIRST, with d9 as the exact rescreen
    * on the survivors (Bloom has false positives, never false negatives).
    *
    * The bitset is built distributedly: k salted h60 probes per benchmark
    * gram → `bit_or` partial agg per 64-bit word → the driver holds only the
    * final mBits/64 longs (= 1024 here, the centroid-collect pattern). The
    * probe literal embeds those words; `shiftrightunsigned(...) & 1` tests a
    * bit per probe inside whole-stage codegen.
    *
    * Determinism: positions are md5-derived integers and the bitset is an OR
    * (order-independent), so false positives are reproducible — the DuckDB
    * oracle replays membership as `pos IN (distinct bench positions)`, which
    * is bit-for-bit the same predicate as the bitset test. Hash-gates. */
  /** The benchmark-side Bloom bitset build alone: k probe positions per
    * benchmark gram → distributed `bit_or` into mBits/64 packed words;
    * driver state is the 8 KiB bitset only. Shared by d10 and the
    * streaming decontamination screen ([[graft.streaming.Streams
    * .decontaminateStream]]), which broadcasts the SAME constant. */
  private[graft] def bloomBitset(spark: SparkSession, dir: String, n: Int = 5,
                                 benchMod: Long = 37L, mBits: Int = 1 << 16,
                                 k: Int = 4): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must pack into longs, got $mBits")
    // fanOut (r17, guide §2.5): shingling + k·md5 per gram otherwise run
    // on one core (one-row-group corpus); the bitset is bit_or-merged —
    // order-independent
    val grams = Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(
        s"CASE WHEN size(w) < $n THEN array() ELSE transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n))) END"))).as("gram"))
    val posCols: Seq[Column] = (0 until k).map { j =>
      h60(concat(lit(s"bloom$j:"), col("gram"))) % mBits.toLong
    }
    val words = new Array[Long](mBits / 64)
    grams.filter(col("doc_id") % benchMod === 0L)
      .select(explode(array(posCols: _*)).as("pos"))
      .groupBy(expr("cast(pos div 64 as int)").as("widx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 64 as int)))").as("word"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  def bloomDecontaminate(spark: SparkSession, dir: String, n: Int = 5,
                         benchMod: Long = 37L, mBits: Int = 1 << 16,
                         k: Int = 4): DataFrame = {
    require(mBits % 64 == 0, s"mBits must pack into longs, got $mBits")
    // fanOut: same shingle+md5 shape as the bitset pass above; per-doc
    // integer counts — order-independent
    def grams = Tables.fanOut(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w")) // tokenize once (HOF-inline trap)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"CASE WHEN size(w) < $n THEN array() ELSE transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n))) END"))).as("gram"))
    def posCols: Seq[Column] = (0 until k).map { j =>
      h60(concat(lit(s"bloom$j:"), col("gram"))) % mBits.toLong
    }
    val words = bloomBitset(spark, dir, n, benchMod, mBits, k)
    val wordsLit = typedLit(words.toSeq)
    // corpus pass: map-only probe (k bit tests per gram), one per-doc agg;
    // all k bits set <=> the product of the k 0/1 tests is 1
    val hit = (0 until k).map { j =>
      s"(shiftrightunsigned(element_at(bloom_words, cast(p$j div 64 as int) + 1), " +
        s"cast(p$j % 64 as int)) & 1)"
    }.mkString(" * ")
    grams.filter(col("doc_id") % benchMod =!= 0L)
      .withColumns(((0 until k).map(j => s"p$j" -> posCols(j)) :+ ("bloom_words" -> wordsLit)).toMap)
      .withColumn("hit", expr(hit))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("hit")).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 4))
      .orderBy("doc_id")
  }

  def bloomDecontaminateOracle(n: Int = 5, benchMod: Long = 37L,
                               mBits: Int = 1 << 16, k: Int = 4): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT doc_id,
       |             unnest(list_distinct([array_to_string(w[i:i+${n - 1}], ' ')
       |                                   for i in generate_series(1, len(w) - ${n - 1})])) AS gram
       |      FROM w WHERE len(w) >= $n),
       |gp AS (SELECT doc_id, gram, j,
       |              CAST('0x' || substr(md5('bloom' || j || ':' || gram), 1, 15) AS BIGINT)
       |                % $mBits AS pos
       |       FROM g, generate_series(0, ${k - 1}) AS t(j)),
       |bp AS (SELECT DISTINCT pos FROM gp WHERE doc_id % $benchMod = 0),
       |ch AS (SELECT doc_id, gram,
       |              CASE WHEN count(*) FILTER (WHERE bp.pos IS NOT NULL) = $k
       |                   THEN 1 ELSE 0 END AS hit
       |       FROM gp LEFT JOIN bp USING (pos)
       |       WHERE doc_id % $benchMod <> 0
       |       GROUP BY doc_id, gram)
       |SELECT doc_id, count(*)::BIGINT AS n_grams, sum(hit)::BIGINT AS n_hit,
       |       round(sum(hit)::DOUBLE / count(*)::DOUBLE, 4) AS contamination
       |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def decontaminateOracle(n: Int = 5, benchMod: Long = 37L): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT doc_id,
       |             unnest(list_distinct([array_to_string(w[i:i+${n - 1}], ' ')
       |                                   for i in generate_series(1, len(w) - ${n - 1})])) AS gram
       |      FROM w WHERE len(w) >= $n),
       |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % $benchMod = 0)
       |SELECT g.doc_id, count(*) AS n_grams,
       |       sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       |       round(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 4)
       |         AS contamination
       |FROM g LEFT JOIN b ON g.gram = b.gram
       |WHERE g.doc_id % $benchMod <> 0
       |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  /** d18: SEMANTIC dedup, SemDeDup-style (Abbas et al. 2023) — cluster
    * the embedding space with the coarse quantizer, then compare pairs
    * ONLY within a cluster: near-duplicate *meaning* lands in the same
    * cell, so the candidate set is Σ|cell|² instead of N² — the method
    * behind LAION/web-scale semantic pruning, and the embedding-space
    * complement of d3's lexical banding (d5 finds the same pairs via LSH
    * buckets; SemDeDup's cells are semantically coherent regions, which
    * is what lets it also prune *semantic redundancy*, not just
    * near-copies). Emits the standard pair-list shape (doc_a, doc_b,
    * sim) so d7's CC / d11's keep-best compose unchanged.
    *
    * Scale shape: map-only codegen assignment (no shuffle), one
    * cluster-keyed self-equi-join (row multiplicity = cell size; at
    * production scale K ~ √N keeps cells small — here K=16, the v6
    * quantizer), exact cosine only on co-cell pairs. Threshold compares
    * RAW doubles — both engines compute the identical IEEE cosine on
    * identical inputs (the v1-family gates prove it), so no quantization
    * is needed at the boundary; the EMITTED sim rounds to 4 dp (output
    * convention). */
  def semDedup(spark: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    graft.Graft.init(spark)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val a = Ivf.assignToMat(emb, Ivf.fixedMat(spark, dir))
      .select(col("cluster_id"), col("vec_id"), col("embedding"))
    val x = a.select(col("cluster_id"), col("vec_id").as("doc_a"), col("embedding").as("ea"))
    val y = a.select(col("cluster_id"), col("vec_id").as("doc_b"), col("embedding").as("eb"))
    x.join(y, Seq("cluster_id")).filter(col("doc_a") < col("doc_b"))
      .withColumn("sim", graft.Graft.cosine(col("ea"), col("eb")))
      .filter(col("sim") >= tau)
      .select(col("cluster_id"), col("doc_a"), col("doc_b"), round(col("sim"), 4).as("sim"))
      .orderBy("doc_a", "doc_b")
  }

  def semDedupOracle(tau: Double = 0.4): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
       |           FROM embeddings WHERE vec_id < ${Ivf.K}),
       |s AS (SELECT e.vec_id, c.cid,
       |             list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS sim
       |      FROM embeddings e CROSS JOIN c),
       |r AS (SELECT vec_id, cid,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s),
       |a AS (SELECT vec_id, cid FROM r WHERE rn = 1),
       |e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT x.cid AS cluster_id, x.vec_id AS doc_a, y.vec_id AS doc_b,
       |             list_cosine_similarity(ex.v, ey.v) AS sim
       |      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |           JOIN e2 ex ON x.vec_id = ex.vec_id
       |           JOIN e2 ey ON y.vec_id = ey.vec_id)
       |SELECT cluster_id, doc_a, doc_b, round(sim, 4) AS sim
       |FROM p WHERE sim >= $tau ORDER BY doc_a, doc_b""".stripMargin

  /** Fixed-point scale for d17: 12 integer decimal digits of rank mass. */
  private val PrScale = 1000000000000L

  /** d17: PAGERANK over the near-dup graph — centrality on d3's pair
    * list: which documents sit at the CENTER of duplication neighborhoods
    * (the crawl's most-recopied pages — prime keep-best candidates and
    * boilerplate detectors), where d7 only says which docs are together.
    * The iterative-graph family beyond connected components.
    *
    * EXACT-INTEGER PageRank, so an inherently iterative float algorithm
    * hash-gates: rank mass is int64 fixed-point (10^12), every step is
    * integer division/sum — contrib = pr div deg, damped = (85·Σ) div
    * 100, base = (15·SCALE) div (100·N) — so there is NO float anywhere
    * and the DuckDB oracle replays the iterations as unrolled CTEs
    * bit-for-bit (the v8 training-replay recipe applied to graph
    * iteration; floor-quantization loses ≤1 unit in 10^12 per step,
    * irrelevant to ranking and identical in both engines). Undirected
    * edges mean no dangling nodes and every node receives mass, so no
    * lost-mass correction term is needed.
    *
    * Scale shape: the classic Spark PageRank loop — edges materialized
    * ONCE (localCheckpoint; at 100 TB: a bucketed-by-src table so the
    * per-iteration join never reshuffles the edge list), each iteration
    * one edge-keyed equi-join + one partial-agg sum over EDGE-sized data
    * (the near-dup pair list, orders of magnitude smaller than the
    * corpus), rank state one row per graph node, driver state one scalar
    * (N). Plan stays O(1) in iterations via per-step checkpoints (the d7
    * discipline). */
  def pagerank(spark: SparkSession, dir: String, tau: Double = 0.5,
               iters: Int = 3): DataFrame = {
    graft.Graft.init(spark)
    val pairs = minhashLsh(spark, dir, tau).select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    require(n > 0, "near-dup graph is empty — pagerank undefined")
    val base = (15L * PrScale) / (100L * n)
    var pr = deg.select(col("src").as("id"), lit(PrScale / n).as("pr"))
    for (_ <- 1 to iters) {
      pr = edges.join(deg, Seq("src"))
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
        .select(col("id"), (lit(base) + expr("(85 * s) div 100")).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("id").as("doc_id"), col("pr"))
      .orderBy(col("pr").desc, col("doc_id"))
  }

  /** d19: TRIANGLE COUNTING over the near-dup graph — the local-density
    * measure that separates tight duplicate CLIQUES (boilerplate families,
    * mirror farms) from loose chains d7's components can't distinguish:
    * a component of pairwise-similar docs and a chain of barely-linked
    * docs have the same CC label but wildly different triangle counts.
    * Third member of the graph family (d7 connected components, d17
    * PageRank) and, unlike both, NON-iterative: exact in two joins.
    *
    * Scale shape — the degree-ordered orientation (the MapReduce
    * "last-reducer" fix, Suri & Vassilvitskii 2011): orient every edge
    * from its (degree, id)-smaller endpoint to the larger; each triangle
    * then has exactly ONE vertex with out-edges to the other two, so the
    * wedge self-join counts each triangle once and a node's wedge count
    * is bounded by its ORIENTED out-degree (O(√E) max, vs the raw-degree
    * blowup a naive wedge join suffers on hubs). Closure is an equi-join
    * of wedge endpoints against the undirected pair list. Everything is
    * exact integers over EDGE-sized data. */
  def triangles(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    graft.Graft.init(spark)
    val pairs = minhashLsh(spark, dir, tau).select(col("doc_a"), col("doc_b"))
      .localCheckpoint() // two consumers: orientation build + closure join
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg, Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("ddeg")), Seq("dst"))
      .filter(col("deg") < col("ddeg") ||
        (col("deg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src"), col("dst"))
      .localCheckpoint() // both sides of the wedge self-join
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("u"), col("a.dst").as("v"), col("b.dst").as("w"))
    val tris = wedges.join(pairs,
      pairs("doc_a") === least(col("v"), col("w")) &&
        pairs("doc_b") === greatest(col("v"), col("w")))
      .select(col("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("doc_id"))
  }

  def trianglesOracle(tau: Double = 0.5): String =
    s"""WITH fp AS (SELECT doc_a, doc_b FROM (${minhashLshOracle(tau)})),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM fp
       |      UNION ALL SELECT doc_b, doc_a FROM fp),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
       |o AS (SELECT e.src, e.dst FROM e
       |      JOIN deg d1 ON e.src = d1.src
       |      JOIN deg d2 ON e.dst = d2.src
       |      WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)),
       |wdg AS (SELECT a.src AS u, a.dst AS v, b.dst AS w
       |        FROM o a JOIN o b ON a.src = b.src AND a.dst < b.dst),
       |tri AS (SELECT u, v, w FROM wdg
       |        JOIN fp ON fp.doc_a = least(v, w) AND fp.doc_b = greatest(v, w)),
       |x AS (SELECT unnest([u, v, w]) AS doc_id FROM tri)
       |SELECT doc_id, count(*)::BIGINT AS n_tri FROM x
       |GROUP BY 1 ORDER BY n_tri DESC, doc_id""".stripMargin

  def pagerankOracle(tau: Double = 0.5, iters: Int = 3): String = {
    val prevChain = (1 to iters).map { i =>
      val prev = if (i == 1) "pr0" else s"pr${i - 1}"
      s"""c$i AS (SELECT e.dst AS id, sum(p.pr // d.deg)::BIGINT AS s
         |        FROM e JOIN $prev p ON e.src = p.id JOIN deg d ON e.src = d.src
         |        GROUP BY e.dst),
         |pr$i AS (SELECT c$i.id, ((15 * $PrScale) // (100 * nn.n) + (85 * c$i.s) // 100)::BIGINT AS pr
         |         FROM c$i, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH fp AS (SELECT doc_a, doc_b FROM (${minhashLshOracle(tau)})),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM fp
       |      UNION ALL SELECT doc_b, doc_a FROM fp),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
       |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
       |pr0 AS (SELECT src AS id, ($PrScale // nn.n)::BIGINT AS pr FROM deg, nn),
       |$prevChain
       |SELECT id AS doc_id, pr FROM pr$iters ORDER BY pr DESC, doc_id""".stripMargin
  }

  /** d23: the DUP-GRAPH SIZE PROFILE — the distribution a data card
    * actually reports about near-duplication: for each cluster size, how
    * many clusters and how many documents live at that size, plus the
    * singleton row (size 1 = docs untouched by any near-dup pair). The
    * shape of this histogram is the curation decision input: a corpus of
    * many pairs dedups away ~half its dup mass, one giant
    * boilerplate cluster dedups to a single survivor, and the tail's
    * max size bounds the worst keep-best argmax group. Cost: two
    * partial aggs over the edge-sized label table + two 1-row counts —
    * the corpus is scanned once for its total. */
  def clusterSizeProfile(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    graft.Graft.init(spark)
    val labels = clusterLabelsFor(spark, dir, tau)
    val dist = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val singles = Tables.documents(spark, dir).agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(labels.agg(count(lit(1)).as("n_clustered"))))
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_clustered")).as("n_clusters"),
        (col("n_total") - col("n_clustered")).as("n_docs"))
    dist.unionAll(singles).orderBy("cluster_size")
  }

  def clusterSizeProfileOracle(tau: Double = 0.5): String =
    s"""WITH lab AS (SELECT doc_id, cluster_id FROM (${dupClustersOracle(tau)})),
       |sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM lab GROUP BY 1),
       |dist AS (SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       |                (cluster_size * count(*))::BIGINT AS n_docs
       |         FROM sz GROUP BY 1),
       |tot AS (SELECT count(*)::BIGINT AS n FROM documents),
       |cl AS (SELECT count(*)::BIGINT AS c FROM lab)
       |SELECT cluster_size, n_clusters, n_docs FROM dist
       |UNION ALL SELECT 1::BIGINT, n - c, n - c FROM tot, cl
       |ORDER BY cluster_size""".stripMargin

  /** d22: the RERANK-THRESHOLD tuning curve for banded MinHash dedup —
    * the v34/v40 measured-curve convention applied to the dedup family's
    * operating knob: for τ ∈ {0.3, 0.5, 0.7, 0.9} (tenths, kept integer
    * end to end), how many candidate pairs survive the exact-Jaccard
    * rerank and how many documents they touch. The curve is what an
    * operator reads before fixing a release's τ: candidate volume falls
    * steeply with τ while affected-doc counts show whether the graph is
    * a few big clusters or many pairs. Costs ONE candidate pass: pairs +
    * exact Jaccard come from [[minhashLsh]] at τ=0 (every banded
    * candidate retained), and the arms are a 4-way explode + conditional
    * aggregates over that single edge-sized frame — never a re-banding
    * or a second rerank per arm. */
  def thresholdSweep(spark: SparkSession, dir: String,
                     tenths: Seq[Int] = Seq(3, 5, 7, 9)): DataFrame = {
    graft.Graft.init(spark)
    val pj = minhashLsh(spark, dir, 0.0)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val arms = pj
      .select(explode(array(tenths.map(t => lit(t.toLong)): _*)).as("tau_x10"),
        col("doc_a"), col("doc_b"), col("jaccard"))
      .filter(col("jaccard") >= col("tau_x10").cast("double") / 10.0d)
    val pairCounts = arms.groupBy(col("tau_x10")).agg(count(lit(1)).as("n_pairs"))
    val docCounts = arms
      .select(col("tau_x10"), explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy(col("tau_x10")).agg(countDistinct(col("doc")).as("n_docs"))
    pairCounts.join(docCounts, Seq("tau_x10")).orderBy("tau_x10")
  }

  def thresholdSweepOracle(tenths: Seq[Int] = Seq(3, 5, 7, 9)): String = {
    val vals = tenths.map(t => s"($t)").mkString(", ")
    s"""WITH pj AS (SELECT doc_a, doc_b, jaccard FROM (${minhashLshOracle(0.0)})),
       |arms AS (SELECT t.tau_x10, pj.doc_a, pj.doc_b
       |         FROM pj, (VALUES $vals) t(tau_x10)
       |         WHERE pj.jaccard >= t.tau_x10::DOUBLE / 10.0),
       |p AS (SELECT tau_x10, count(*)::BIGINT AS n_pairs FROM arms GROUP BY 1),
       |d AS (SELECT tau_x10, count(DISTINCT doc)::BIGINT AS n_docs
       |      FROM (SELECT tau_x10, unnest([doc_a, doc_b]) AS doc FROM arms)
       |      GROUP BY 1)
       |SELECT p.tau_x10::BIGINT AS tau_x10, p.n_pairs, d.n_docs
       |FROM p JOIN d USING (tau_x10) ORDER BY tau_x10""".stripMargin
  }

  /** d21: DUPLICATED-SPAN accounting — the line/substring-level exact
    * dedup step of the C4 / CCNet / "Deduplicating Training Data" (Lee
    * et al. 2021, ExactSubstr) pipelines, at fixed W-token granularity:
    * any W-token span occurring MORE THAN ONCE anywhere in the corpus
    * (across documents or within one) is duplicated text, and each
    * document reports how many of its tokens are covered by at least one
    * duplicated span — the removal mask a line-dedup pass would apply.
    *
    * Scale shape: the only dedup operator with NO pairwise candidate
    * join at any point — the hot-span table is a pure groupBy count over
    * the exploded sliding windows (token-volume-sized, bucketable by
    * hash; map-side combine collapses the heavy hitters), the mark-back
    * is one hash equi-join, and the coverage union is a per-document
    * INTERVAL SWEEP: overlapping duplicated spans must not double-count
    * tokens, so spans sort by start within the doc and each contributes
    * `start+W − max(running_end, start)` clamped at 0 — a running-max
    * window over ≤ doc-length rows (per-doc partitions are bounded by
    * the longest document, not the corpus — the q9 caveat does not bite).
    * The suffix-array formulation finds arbitrary-length matches but
    * needs a global structure no executor can host; fixed-W sliding
    * hashes are the distributable approximation (a run of L ≥ W
    * duplicated tokens is covered exactly by its L−W+1 duplicated
    * windows). */
  def dupSpans(spark: SparkSession, dir: String, w: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("wds"))
      .withColumn("n_tok", size(col("wds")).cast("long"))
    // sequence(0, n-W) counts DOWN when n < W — guard explicitly
    // materialize ONCE: the span table feeds BOTH the hot-count aggregate
    // and the mark-back join; without it the tokenize+explode+md5 subtree
    // runs twice (measured ~2× the query) — at 100 TB this line is a
    // persisted span-hash table, the vocab-artifact convention
    val spans = toks
      .filter(col("n_tok") >= w)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_tok") - w)).as("start"), col("wds"))
      .select(col("doc_id"), col("start"),
        h60(array_join(slice(col("wds"), (col("start") + 1).cast("int"), lit(w)), " ")).as("h"))
      .localCheckpoint()
    val hot = spans.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("h"))
    val dup = spans.join(hot, Seq("h")).select(col("doc_id"), col("start"))
    val sweep = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = dup
      .withColumn("prev_end", max(col("start") + w).over(sweep))
      .withColumn("cov", greatest(lit(0L),
        col("start") + w - greatest(coalesce(col("prev_end"), col("start")), col("start"))))
      .groupBy(col("doc_id")).agg(sum(col("cov")).as("n_dup_tokens"))
    toks.select(col("doc_id"), col("n_tok"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        floor(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          col("n_tok").cast("double") * 10000d + 0.5d).cast("long").as("dup_frac_q4"))
      .orderBy("doc_id")
  }

  def dupSpansOracle(w: Int = 8): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
       |                  len(string_split(text, ' '))::BIGINT AS n FROM documents),
       |s AS (SELECT doc_id, i AS start,
       |             CAST('0x' || substr(md5(array_to_string(w[i+1:i+$w], ' ')), 1, 15) AS BIGINT) AS h
       |      FROM t, LATERAL (SELECT unnest(generate_series(0, n - $w)) AS i) u
       |      WHERE n >= $w),
       |hot AS (SELECT h FROM (SELECT h, count(*) AS c FROM s GROUP BY 1) WHERE c > 1),
       |d AS (SELECT s.doc_id, s.start FROM s JOIN hot USING (h)),
       |cov AS (SELECT doc_id, start,
       |               max(start + $w) OVER (PARTITION BY doc_id ORDER BY start
       |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |        FROM d),
       |c2 AS (SELECT doc_id,
       |              sum(greatest(0, start + $w - greatest(coalesce(prev_end, start), start)))::BIGINT AS n_dup
       |       FROM cov GROUP BY doc_id)
       |SELECT t.doc_id, t.n AS n_tok, coalesce(c2.n_dup, 0)::BIGINT AS n_dup_tokens,
       |       floor(coalesce(c2.n_dup, 0)::DOUBLE / t.n::DOUBLE * 10000 + 0.5)::BIGINT AS dup_frac_q4
       |FROM t LEFT JOIN c2 USING (doc_id) ORDER BY t.doc_id""".stripMargin
}
