package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + helpers for all specs (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.init(s)
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = TestSession.sf
  def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)
}

/** Every declared query runs and returns rows; oracle coverage is complete. */
class ContractSpec extends GraftSuite {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
  test("oracle SQL strings are DuckDB-style, non-empty") {
    SparkEntry.oracleSql.values.foreach(sql => assert(sql.trim.nonEmpty))
  }
  test("query-name leading tokens are unique (bench short-key contract)") {
    // the bench contract line keys queries by their leading token
    // ("v14b_ivf_trained_persist" → "v14b"); a collision would make the
    // driver-captured artifact ambiguous — fail HERE, not mid-bench
    val tokens = SparkEntry.queries.keys.toSeq.map(k => k.takeWhile(_ != '_'))
    val dups = tokens.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"colliding short keys: ${dups.mkString(", ")}")
  }

  test("no query plans a non-broadcast cartesian product (global plan regression)") {
    // every all-pairs product in this engine rides a BROADCAST side by
    // design (query sets, centroid/codebook dims); a CartesianProduct
    // node means a fact×fact blowup snuck in — the single worst plan
    // regression possible at 100 TB. Planning only, no execution: eager
    // artifact builds inside query constructors still run, but they are
    // session-memoized and shared with the other suites in this JVM.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no query HINTS a broadcast of an SF-proportional relation (scale gate)") {
    // a broadcast() hint promises the relation fits the driver at ANY
    // corpus size; only query-bounded sets (aggregated/limited/key-range
    // slices), fixed dims, driver-built matrices, serving workloads, and
    // delta-sized tombstone logs can keep that promise — see
    // tools.BroadcastAudit for the full rule set. Planner/AQE-chosen
    // broadcasts are size-measured and exempt. This is the executable
    // form of the round-8 audit finding (v15 / t7 / q2 / q8).
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val vs = tools.BroadcastAudit.violations(fn(spark, sf))
      if (vs.nonEmpty) Some(s"$name:\n${vs.mkString("\n")}") else None
    }
    assert(offenders.isEmpty,
      s"SF-proportional broadcast hints in:\n${offenders.mkString("\n\n")}")
  }

  test("BroadcastAudit positive controls: the gate actually flags unbounded hints") {
    // the zero-violation assertion above is only half a gate — these
    // prove the audit has TEETH, pinning the r9/r10 rule set: corpus
    // scans, equality-literal filters, and corpus-keyed group-bys must
    // flag; limits, key-range slices, fixed-domain group-bys, and
    // literal-valued CASE keys must pass
    import org.apache.spark.sql.functions.{broadcast, col, count, expr, lit}
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    def flags(df: org.apache.spark.sql.DataFrame): Boolean =
      tools.BroadcastAudit.violations(df).nonEmpty
    // 1. raw corpus side → flagged
    assert(flags(emb.join(broadcast(docs), Seq("doc_id"))), "corpus hint passed")
    // 2. equality-literal filter keeps a FRACTION, not a count → flagged
    assert(flags(emb.join(broadcast(docs.filter(col("lang") === "en")), Seq("doc_id"))),
      "segment-filter hint passed")
    // 3. corpus-keyed group-by is not a reducer (the r10 ADVICE finding) → flagged
    assert(flags(emb.join(broadcast(
      docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))), Seq("doc_id"))),
      "corpus-keyed aggregate hint passed")
    // 4. key-range slice → allowed
    assert(!flags(emb.join(broadcast(docs.filter(col("doc_id") < 8)), Seq("doc_id"))),
      "key-range slice flagged")
    // 5. limit → allowed
    assert(!flags(emb.join(broadcast(docs.limit(8)), Seq("doc_id"))), "limit flagged")
    // 6. fixed-domain group-by (lang) joined back → allowed
    assert(!flags(docs.join(broadcast(
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))), Seq("lang"))),
      "fixed-domain aggregate flagged")
    // 7. literal-valued CASE grouping key → allowed
    assert(!flags(docs.join(broadcast(
      docs.select(expr("CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END").as("split"))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .withColumnRenamed("split", "lang")), Seq("lang"))),
      "literal-CASE aggregate flagged")
    // 8. range inside an OR branch admits the whole segment → flagged
    //    (the r10 ADVICE hole: c.exists matched the `<` anywhere)
    assert(flags(emb.join(broadcast(
      docs.filter(col("doc_id") < 8 || col("lang") === "en")), Seq("doc_id"))),
      "OR'd range hint passed")
    // 9. range on a MEASURE column keeps a corpus fraction → flagged
    assert(flags(emb.join(broadcast(docs.filter(col("n_chars") < 100)), Seq("doc_id"))),
      "measure-range hint passed")
    // 10. …but a row-key range AND'd with a segment filter still bounds
    //     (the conjunct keeps ≤ 8 rows regardless of the other term)
    assert(!flags(emb.join(broadcast(
      docs.filter(col("doc_id") < 8 && col("lang") === "en")), Seq("doc_id"))),
      "conjunct key-range flagged")
  }
}

/** Degenerate-document totality: the text/dedup kernels must stay
  * well-defined (no nulls, no NaN, no bogus windows) on empty, one-token,
  * and sub-shingle docs — inputs a 100 TB crawl WILL contain. Notably
  * Spark's sequence(1, 0) counts DOWN, so an unguarded shingle window
  * fabricates null shingles on <3-token docs where DuckDB yields none. */
class DegenerateDocSpec extends GraftSuite {
  import spark.implicits._
  private val docs = Seq(
    (1L, ""), (2L, "word"), (3L, "two words"), (4L, "the and of to in"))
    .toDF("doc_id", "text")

  test("shingles on sub-shingle docs are empty, never null") {
    val sh = operators.Dedup.withShingles(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L).isEmpty)
    assert(sh(4L).length === 3 && sh(4L).forall(_ != null))
  }

  test("quality formula is total: no null/NaN on degenerate docs") {
    val q = operators.Text.qualityFrame(docs)
      .select("doc_id", "n_tok", "quality").collect()
    assert(q.length === 4)
    q.foreach { r =>
      assert(!r.isNullAt(2), s"doc ${r.getLong(0)} quality is null")
      assert(!r.getDouble(2).isNaN, s"doc ${r.getLong(0)} quality is NaN")
    }
    // empty text tokenizes to [""]: 1 token, quality defined
    assert(q.find(_.getLong(0) == 1L).get.getLong(1) === 1L)
  }
}

/** v8 empty-cluster reseed parity (reference ivf.py:183-186): a degenerate
  * init — duplicate vectors among the first K — empties K−1 clusters on
  * iteration 1. The reference reseeds empties from corpus points; keep-old
  * (the pre-round-5 rule) would pin 15 dead copies of the duplicated init
  * vector forever and the trained index would silently collapse to one
  * cluster. The reseed must also be deterministic (farthest-point, ties to
  * lowest vec_id) — same input, same centroids, on any partitioning.
  *
  * The EXACT array equality below is sound, not best-effort: the trainers
  * quantize accumulation inputs to a dyadic grid (Graft.vecQuantize), so
  * the per-cluster sums are exact doubles whatever order Spark merges
  * partials in — two runs cannot differ by shuffle-fetch order even in
  * principle. (Before round 6 this equality held only because the partial
  * merge order happened to repeat.) */
class KmeansReseedSpec extends GraftSuite {
  import spark.implicits._

  /** 16 identical init vectors (the adversarial part) + 48 DISTINCT spread
    * points over 8 directions, dim 8. */
  private def adversarial: org.apache.spark.sql.DataFrame =
    (0L until 64L).map { i =>
      val v = Array.fill(8)(0.0f)
      if (i < operators.Ivf.K) v(0) = 1.0f
      else { v((i % 8).toInt) = 1.0f; v(7) += i.toFloat / 100f }
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")

  test("v8b: empty clusters reseed from worst-served points, deterministically") {
    val df = adversarial.cache()
    try {
      val m1 = operators.Ivf.trainCentroids(spark, df, iters = 3)
      val m2 = operators.Ivf.trainCentroids(spark, df, iters = 3)
      assert(m1.length === operators.Ivf.K)
      assert(m1.map(_._2.toSeq).toSeq === m2.map(_._2.toSeq).toSeq, "reseed is not deterministic")
      val distinct = m1.map(_._2.toSeq).distinct.length
      assert(distinct >= 8, s"only $distinct distinct centroids — dead cells were not reseeded")
      // every centroid is unit-norm (reseeds included — reference uses Xn)
      m1.foreach { case (cid, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        assert(math.abs(n - 1.0) < 1e-9, s"centroid $cid has norm $n")
      }
    } finally df.unpersist()
  }
}

/** v18b codebook reseed: the per-subspace mirror of [[KmeansReseedSpec]] —
  * a duplicate init empties K−1 cells of a subspace codebook; keep-old
  * would pin them forever, the reseed must refill deterministically. */
class PqReseedSpec extends GraftSuite {
  import spark.implicits._

  /** Single subspace m=0: 16 identical init subvectors + 48 distinct. */
  private def adversarialSub: org.apache.spark.sql.DataFrame =
    (0L until 64L).map { i =>
      val v = Array.fill(8)(0.0)
      if (i < operators.Pq.K) v(0) = 1.0
      else { v((i % 8).toInt) = 1.0; v(7) += i.toDouble / 100.0 }
      (i, 0, v.toSeq)
    }.toDF("vec_id", "m", "sv")

  test("v18b: empty codebook cells reseed per subspace, deterministically") {
    val df = adversarialSub.cache()
    try {
      val c1 = operators.Pq.trainCodebooks(df, iters = 3)
      val c2 = operators.Pq.trainCodebooks(df, iters = 3)
      assert(c1(0L).length === operators.Pq.K)
      assert(c1(0L).map(_.toSeq).toSeq === c2(0L).map(_.toSeq).toSeq,
        "codebook reseed is not deterministic")
      val distinct = c1(0L).map(_.toSeq).distinct.length
      assert(distinct >= 8, s"only $distinct distinct codebook cells — dead cells not reseeded")
    } finally df.unpersist()
  }
}

/** d7 connected components and e4 as-of join invariants. */
class GraphTemporalSpec extends GraftSuite {
  test("d7: every d3 pair lands in one cluster; cluster_id is the min member") {
    val labels = run("d7_dup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty, "no dup clusters found — gate would be vacuous")
    val pairs = operators.Dedup.minhashLsh(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(labels(a) === labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid not labeled by its min member")
    }
  }

  test("connectedComponents converges on chain components (diameter > 1)") {
    import spark.implicits._
    // a 5-node chain (needs several propagation rounds), a pair, a star
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (21L, 20L), (21L, 22L)).toDF("doc_a", "doc_b")
    val labels = operators.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).map(labels) === Seq.fill(5)(1L))
    assert(labels(10L) === 10L && labels(11L) === 10L)
    assert(Seq(20L, 21L, 22L).map(labels).distinct === Seq(20L))
  }

  test("connectedComponents handles diameter-30 chains in O(log d) star rounds") {
    import spark.implicits._
    // a 31-node chain, descending ids so the min label must travel the full
    // diameter — the old propagation loop silently shipped wrong labels past
    // its iteration cap on exactly this shape; large-star/small-star must
    // converge (well under the round cap) or throw, never ship quietly
    val chain = (0 until 30).map(i => (100L - i, 99L - i)).toDF("doc_a", "doc_b")
    val labels = operators.Dedup.connectedComponents(chain, maxRounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 31)
    assert((70L to 100L).forall(labels(_) == 70L), s"chain split: ${labels.toSeq.sorted}")
  }

  test("connectedComponents does not declare convergence on stars sharing a leaf") {
    import spark.implicits._
    // regression: after one round, pairs {8-5, 8-1, 9-5, 9-2} contract to
    // {5→1, 5→2, 8→1, 9→2} — no target is a source, but leaf 5 points at
    // TWO roots. A convergence check of "no chains" alone exits here,
    // splitting the single component {1,2,5,8,9} and labeling node 5 twice;
    // star-shapedness also requires out-degree 1 per source.
    val pairs = Seq((8L, 5L), (8L, 1L), (9L, 5L), (9L, 2L)).toDF("doc_a", "doc_b")
    val rows = operators.Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.map(_._1).distinct.length,
      s"a node received two labels: ${rows.sorted.toSeq}")
    val labels = rows.toMap
    assert(Seq(1L, 2L, 5L, 8L, 9L).map(labels).distinct === Seq(1L),
      s"component split: ${labels.toSeq.sorted}")
  }

  test("connectedComponents non-convergence is loud, not silent") {
    import spark.implicits._
    val chain = (0 until 30).map(i => (100L - i, 99L - i)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      operators.Dedup.connectedComponents(chain, maxRounds = 1).collect()
    }
  }

  test("e4: as-of match is the latest click at-or-before each purchase") {
    val out = run("e4_asof_join").collect()
    assert(out.nonEmpty)
    val matched = out.filter(!_.isNullAt(2))
    assert(matched.nonEmpty, "no purchase matched any click")
    matched.foreach { r =>
      assert(r.getLong(3) >= 0L, s"purchase ${r.getLong(0)} matched a FUTURE click")
    }
  }

  /** The m1/m2/m3 oracles replay byte-level stub decodes in DuckDB via
    * `unicode(substr(text, i, 1))`, valid only while UTF-8 byte ==
    * codepoint — i.e. the corpus is pure ASCII. Pin that assumption so a
    * future testdata change fails HERE with a message, not as an opaque
    * hash mismatch in the driver compare. */
  test("document corpus is pure ASCII (byte-replay oracles assume it)") {
    // UTF-8 byte length == char length ⟺ every codepoint < 128 (regex-free:
    // SQL-literal backslash handling makes RLIKE '\x..' patterns fragile)
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val nonAscii = graft.sources.Tables.documents(spark, sf)
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0L,
      s"$nonAscii documents contain non-ASCII text — m1/m2/m3 oracles need a BLOB-indexed byte fetch")
  }

  /** Randomized cross-check of the large-star/small-star contraction
    * against a driver-side union-find (union-by-min makes every root the
    * component minimum — the same label the converged stars carry and the
    * d7 recursive-CTE oracle computes). Random graphs plus the adversarial
    * shapes the convergence predicate exists for: a long path (O(log d)
    * rounds), two stars sharing a leaf (the (a)-alone false-convergence
    * case), and bridged cliques. */
  test("connectedComponents == union-find labels on random + adversarial graphs") {
    import spark.implicits._
    def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rnd = new scala.util.Random(20260813L)
    val randomGraphs = (1 to 4).map { _ =>
      val n = 40 + rnd.nextInt(60)
      (1 to n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    }
    val path = (0L until 50L).sliding(2).map(s => (s(0), s(1))).toSeq
    val sharedLeaf = Seq((8L, 5L), (8L, 1L), (9L, 5L), (9L, 2L))
    val cliques = (for (a <- 10L to 14L; b <- 10L until a) yield (a, b)) ++
      (for (a <- 20L to 24L; b <- 20L until a) yield (a, b)) :+ (14L, 20L)
    (randomGraphs :+ path :+ sharedLeaf :+ cliques.toSeq).foreach { edges =>
      val got = operators.Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      val want = ufLabels(edges)
      assert(got === want, s"CC labels diverged on ${edges.take(8)}…")
    }
  }

  /** q9's distributed order-statistic selection must agree with Spark's
    * built-in exact `percentile` (same h = q·(n−1) interpolation rule) —
    * an independent implementation cross-check on real data, catching any
    * rank-offset error in the partition-count bookkeeping. Compared at
    * 1e-4 (the two interpolate with differently-associated but
    * mathematically equal expressions). */
  test("q9 selection == Spark built-in exact percentile per group") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, min, max}
    val got = run("q9_percentiles").collect()
    val want = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"),
        min($"l_extendedprice").as("p0"),
        max($"l_extendedprice").as("p100"))
      .orderBy($"l_returnflag").collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      (1 to 5).foreach { i =>
        assert(math.abs(g.getDouble(i) - w.getDouble(i)) <= 1e-4,
          s"flag ${g.getString(0)} col $i: got ${g.getDouble(i)}, want ${w.getDouble(i)}")
      }
    }
  }
}
