package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Persist, Text}

/** t11 BM25 / t12 KMV / d8 incremental dedup — semantics beyond the oracle
  * hash gate: sketch accuracy bounds, ranking properties, and the
  * incremental path's equivalence to the batch pair set. */
class SketchSpec extends GraftSuite {

  test("t12: KMV sketch estimate is within 2/sqrt(k) of the exact distinct count") {
    val k = 128
    val row = Text.kmvDistinct(spark, sf, k).collect().head
    assert(row.getAs[Long]("k") === k)
    val est = row.getAs[Double]("est_distinct")
    val exact = Dedup.corpusShingles(spark, sf)._2
      .select(col("h")).distinct().count().toDouble
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 2.0 / math.sqrt(k.toDouble),
      s"KMV estimate $est vs exact $exact: rel err $relErr")
  }

  test("q13: histogram quantile estimates land within one bin width of exact") {
    import spark.implicits._
    val bins = 1024
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice")
    val Seq(lo, hi) = li.agg(min($"l_extendedprice"), max($"l_extendedprice"))
      .as[(Double, Double)].head() match { case (a, b) => Seq(a, b) }
    val width = (hi - lo) / bins
    val est = operators.Relational.q13HistQuantiles(spark, sf)
      .select("l_returnflag", "q", "est").as[(String, Double, Double)].collect()
    assert(est.length === 3 * li.select("l_returnflag").distinct().count())
    val byGroup = li.as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    for ((g, q, e) <- est) {
      val vs = byGroup(g)
      val exact = vs(math.min(vs.length - 1, math.ceil(q * vs.length).toInt - 1))
      assert(math.abs(e - exact) <= width + 1e-9,
        s"$g q=$q est $e vs exact $exact (width $width)")
    }
  }

  test("t12: KMV aggregate keeps the k smallest DISTINCT values under any partitioning") {
    import spark.implicits._
    // duplicates + shuffled order + more values than k; expected = sorted distinct mins
    val vals = (1L to 500L).flatMap(v => Seq(v * 7 % 1009, v * 7 % 1009, v * 13 % 2003))
    val expected = vals.distinct.sorted.take(16)
    for (parts <- Seq(1, 3, 8)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(call_function("graft_kmv", col("h"), lit(16)).as("m"))
        .collect().head.getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("t12: KMV randomized property — distinct k-mins under random data, k, and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (iter <- 1 to 25) {
      val n = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(40)
      val parts = 1 + rnd.nextInt(10)
      // small value range → heavy duplication, the distinct path under stress
      val vals = Seq.fill(n)(rnd.nextInt(120).toLong)
      val expected = vals.distinct.sorted.take(k)
      val got = vals.toDF("h").repartition(parts)
        .agg(call_function("graft_kmv", col("h"), lit(k)))
        .collect().head.getSeq[Long](0)
      assert(got === expected, s"iter=$iter n=$n k=$k parts=$parts")
    }
  }

  test("q11: HLL estimate is within the 3-sigma bound of the exact distinct count") {
    val m = 256.0
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = graft.operators.Relational.q11HllDistinct(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet === exact.keySet)
    out.foreach { r =>
      val flag = r.getString(0)
      val est = r.getAs[Double]("est_distinct")
      val relErr = math.abs(est - exact(flag).toDouble) / exact(flag).toDouble
      assert(relErr < 3.0 * 1.04 / math.sqrt(m),
        s"flag=$flag est=$est exact=${exact(flag)} relErr=$relErr")
    }
  }

  test("q11: sketch state is invariant to input partitioning and duplication") {
    import spark.implicits._
    val base = graft.operators.Relational.q11HllDistinct(spark, sf).collect().map(_.toSeq).toSeq
    // max-based registers: re-running over a differently-partitioned,
    // duplicated input must produce the identical sketch
    val li = graft.sources.Tables.lineitem(spark, sf).select("l_returnflag", "l_orderkey")
    val dupDir = java.nio.file.Files.createTempDirectory("q11dup").toString
    li.union(li).repartition(7).write.mode("overwrite")
      .parquet(s"$dupDir/lineitem.parquet")
    val again = graft.operators.Relational.q11HllDistinct(spark, dupDir).collect().map(_.toSeq).toSeq
    assert(again === base)
  }

  test("t11: BM25 returns k descending-scored docs that each contain a query term") {
    val terms = Seq("merge", "spark", "window")
    val out = Text.bm25TopK(spark, sf, terms).collect()
    assert(out.length === 10)
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-_)), "scores not descending")
    assert(scores.forall(_ > 0.0))
    val hits = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(out.map(_.getAs[Long]("doc_id")): _*))
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
      .count()
    assert(hits === 10, "a returned doc contains no query term")
  }

  test("t11: BM25 rewards term frequency under equal doc length") {
    import spark.implicits._
    // same dl, same single query term, differing tf → score must increase with tf
    val docs = Seq(
      (1L, "alpha beta gamma delta eps zeta"),
      (2L, "alpha alpha gamma delta eps zeta"),
      (3L, "alpha alpha alpha delta eps zeta"))
      .toDF("doc_id", "text")
    val dir = "target/test-sketch/bm25"
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = Text.bm25TopK(spark, dir, Seq("alpha"), k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))
    assert(out.map(_._1).toSeq === Seq(3L, 2L, 1L), s"unexpected order: ${out.toSeq}")
  }

  test("t13: CMS estimates never undercount and stay within the collision bound") {
    val out = Text.cmsTermCounts(spark, sf).collect()
    assert(out.length === 5)
    val n = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    out.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_count"), r.getAs[Long]("true_count"))
      assert(est >= exact, s"${r.getString(0)}: CMS undercounted ($est < $exact)")
      assert(est - exact <= 3 * n / 256, s"${r.getString(0)}: overcount ${est - exact} beyond bound")
    }
  }

  test("t13: a width narrower than the vocabulary forces visible overcounts, never undercounts") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a a b b c c d d")).toDF("doc_id", "text")
    val dir = "target/test-sketch/cms"
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = Text.cmsTermCounts(spark, dir,
      terms = Seq("a", "b", "c", "d", "e", "f", "g", "h"), depth = 2, width = 2).collect()
    val overs = out.map(r => r.getAs[Long]("est_count") - r.getAs[Long]("true_count"))
    assert(overs.forall(_ >= 0), "CMS undercounted")
    assert(overs.exists(_ > 0), "8 terms in 2 cells must collide somewhere")
  }

  test("t14: weighted sample favors heavy weights, is deterministic, and is append-stable") {
    import spark.implicits._
    // 100 heavy docs (w=5000) vs 100 light (w=50): a 100:1 weight ratio
    // must dominate the draw
    val docs = (0L until 200L).map { i =>
      (i, s"doc $i", if (i < 100) "en" else "de", "src", if (i < 100) 5000L else 50L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = "target/test-sketch/wsample"
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val picks = Text.weightedSample(spark, dir, k = 40).collect()
    val heavy = picks.count(_.getAs[Long]("n_chars") == 5000L)
    assert(heavy >= 35, s"only $heavy/40 picks from the 100x-weight class")
    // deterministic under a different partitioning of the same data
    docs.repartition(7).write.mode("overwrite").parquet(dir + "2/documents.parquet")
    val again = Text.weightedSample(spark, dir + "2", k = 40).collect()
    assert(picks.map(_.getAs[Long]("doc_id")).toSeq === again.map(_.getAs[Long]("doc_id")).toSeq)
    // append-stable: adding docs never flips an existing key, only competes —
    // every pick of the grown corpus that existed before keeps its old key
    val grown = docs.union(Seq((999L, "new", "fr", "src", 5000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    grown.write.mode("overwrite").parquet(dir + "3/documents.parquet")
    val keysBefore = picks.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("skey")).toMap
    Text.weightedSample(spark, dir + "3", k = 40).collect().foreach { r =>
      keysBefore.get(r.getAs[Long]("doc_id")).foreach { old =>
        assert(old === r.getAs[Double]("skey"), s"doc ${r.getAs[Long]("doc_id")} key changed")
      }
    }
  }

  test("c9: SCD2 intervals chain gaplessly and reconstruct the c6 snapshot at its cutoff") {
    val rows = graft.operators.Crud.scd2Intervals(spark, sf).collect()
    val byKey = rows.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    byKey.foreach { case (key, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from"))
      assert(sorted.count(_.isNullAt(sorted.head.fieldIndex("valid_to"))) === 1,
        s"$key: exactly one open (current) interval expected")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") === b.getAs[Long]("valid_from"),
            s"$key: interval chain has a gap")
        case _ =>
      }
    }
    // the interval containing c6's cutoff must name c6's snapshot winner
    val cutoff = 1705363200000L
    val snap = graft.operators.Crud.snapshotAsOf(spark, sf, cutoff).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("last_event_id")).toMap
    val fromScd2 = rows.filter { r =>
      r.getAs[Long]("valid_from") <= cutoff &&
        (r.isNullAt(r.fieldIndex("valid_to")) || r.getAs[Long]("valid_to") > cutoff)
    }.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
      r.getAs[Long]("event_id")).toMap
    assert(fromScd2 === snap, "SCD2 as-of lookup diverged from the c6 snapshot")
  }

  test("m4: fingerprint dedup groups == driver-computed exact groups, reps are minima") {
    val got = graft.operators.Multimodal.mediaDedupGroups(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep_doc"), r.getAs[Long]("group_n")))
    assert(got.nonEmpty, "corpus has exact-dup media; groups expected")
    // exact baseline: group the same stub-decoded fingerprints in the driver
    val prints = graft.operators.Multimodal.frameSample(spark, sf, nFrames = 8).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, fs) =>
        d -> fs.sortBy(_.getAs[Long]("frame_idx")).map(_.getAs[Long]("frame_feature")).toSeq
      }
    val byFp = prints.groupBy(_._2).values.filter(_.size >= 2)
    val want = byFp.flatMap { g =>
      val ids = g.map(_._1).toSeq.sorted
      ids.map(d => (d, ids.min, ids.size.toLong))
    }.toSet
    assert(got.toSet === want)
    got.foreach { case (doc, rep, _) => assert(rep <= doc) }
  }

  test("d8: incremental delta-vs-base pairs == batch d3 pairs restricted to cross pairs") {
    val mod = 10
    val batch = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val expected = batch.flatMap { case (a, b, j) =>
      (a % mod == 0, b % mod == 0) match {
        case (true, false) => Some((a, b, j)) // a is the delta doc
        case (false, true) => Some((b, a, j))
        case _ => None // base-base handled by the last full run; delta-delta by d3 on the delta
      }
    }.toSet
    val got = Persist.incrementalDedupPairs(spark, sf, mod = mod).collect()
      .map(r => (r.getAs[Long]("new_doc"), r.getAs[Long]("base_doc"), r.getAs[Double]("jaccard")))
      .toSet
    assert(got === expected)
  }

  test("q14: merging per-source KMV sketches equals the one-shot corpus sketch") {
    // the KMV mergeability identity: k-smallest of the union of per-source
    // k-smallest sets == k-smallest of the union — so the merged row must
    // reproduce t12's corpus sketch EXACTLY, not approximately
    val t12 = run("t12_kmv_distinct").collect()(0)
    val union = run("q14_kmv_union").filter(col("source") === "__union").collect()(0)
    assert(union.getAs[Long]("k") === t12.getAs[Long]("k"))
    assert(union.getAs[Long]("kth") === t12.getAs[Long]("kth"))
    assert(union.getAs[Double]("est_distinct") === t12.getAs[Double]("est_distinct"))
    // per-source estimates stay within the 2/sqrt(k) KMV error of exact
    val exact = graft.operators.Dedup.corpusShingles(spark, sf)._2
      .join(graft.sources.Tables.documents(spark, sf).select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source").agg(countDistinct("h").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q14_kmv_union").filter(col("source") =!= "__union").collect().foreach { r =>
      val s = r.getString(0)
      val est = r.getAs[Double]("est_distinct")
      val err = math.abs(est - exact(s)) / exact(s)
      assert(err <= 2.0 / math.sqrt(128.0), s"source $s KMV error $err")
    }
  }

  test("q21: registers merged in sketch space == registers built directly (q11 parity)") {
    // the (flag, ALL) cube cells rolled up from the (flag, status) register
    // table must reproduce q11's per-flag sketch EXACTLY — max-merge of
    // partitioned registers is the whole mergeability claim
    val cube = run("q21_hll_cube").collect()
    val flagCells = cube.filter(r =>
        r.getAs[String]("grp_status") == "ALL" && r.getAs[String]("grp_flag") != "ALL")
      .map(r => r.getAs[String]("grp_flag") ->
        ((r.getAs[Double]("est_distinct"), r.getAs[Long]("n_zero_buckets"),
          r.getAs[Long]("register_checksum")))).toMap
    val q11 = run("q11_hll_distinct").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("est_distinct"), r.getAs[Long]("n_zero_buckets"),
          r.getAs[Long]("register_checksum")))).toMap
    assert(flagCells === q11, "sketch-space rollup diverges from direct per-flag sketches")
    // and the grand-total cell agrees with the exact corpus distinct within 3 sigma
    val all = cube.find(r => r.getAs[String]("grp_flag") == "ALL" &&
      r.getAs[String]("grp_status") == "ALL").get.getAs[Double]("est_distinct")
    val exactAll = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count().toDouble
    assert(math.abs(all - exactAll) / exactAll < 3.0 * 1.04 / math.sqrt(256.0),
      s"ALL/ALL estimate $all vs exact $exactAll")
  }

  test("q22: the sketch MV is replay-idempotent and its registers match a one-shot build") {
    val once = run("q22_hll_incremental").collect().map(_.toSeq).toSeq
    // re-running rebuilds the base artifact and re-merges the delta — a
    // full replay; register max is idempotent so the view cannot drift
    val again = run("q22_hll_incremental").collect().map(_.toSeq).toSeq
    assert(once === again, "replaying the incremental refresh changed the view")
    assert(once.nonEmpty)
    // 3-sigma accuracy against the exact per-type distinct users
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q22_hll_incremental").collect().foreach { r =>
      val t = r.getString(0)
      val est = r.getAs[Double]("est_distinct")
      val relErr = math.abs(est - exact(t).toDouble) / exact(t).toDouble
      assert(relErr < 3.0 * 1.04 / math.sqrt(256.0), s"type=$t est=$est exact=${exact(t)}")
    }
  }
}
