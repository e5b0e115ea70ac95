package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events, Relational, Text}
import graft.sources.Tables

/** d9 decontamination / t15 repetition rules / e7 cohort retention —
  * semantics beyond the oracle hash gate, each cross-checked against an
  * independent driver-side recompute over the collected test corpus. */
class QualitySpec extends GraftSuite {

  private def tokens(text: String): Array[String] = text.split(" ")

  private def grams(text: String, n: Int): Set[String] =
    tokens(text).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  test("d9: contamination matches a driver-side n-gram set intersection") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchGrams = docs.collect { case (id, t) if id % 37 == 0 => grams(t, 5) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val out = Dedup.decontaminate(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val g = grams(docs(id), 5)
      assert(id % 37 != 0, s"benchmark doc $id leaked into the scored set")
      assert(r.getAs[Long]("n_grams") === g.size.toLong, s"doc $id n_grams")
      assert(r.getAs[Long]("n_hit") === g.count(benchGrams.contains).toLong, s"doc $id n_hit")
      val c = r.getAs[Double]("contamination")
      assert(c >= 0.0 && c <= 1.0)
    }
    // every scorable training doc is present — silence would hide leakage
    val expected = docs.collect { case (id, t) if id % 37 != 0 && grams(t, 5).nonEmpty => id }
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expected.toSet)
  }

  test("d24: eval leakage matches a driver-side reverse intersection; both verdicts occur") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainGrams = docs.collect { case (id, t) if id % 37 != 0 => grams(t, 5) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val out = Dedup.evalLeakage(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 37 == 0, s"training doc $id leaked into the benchmark report")
      val g = grams(docs(id), 5)
      assert(r.getAs[Long]("n_grams") === g.size.toLong, s"doc $id n_grams")
      assert(r.getAs[Long]("n_leaked") === g.count(trainGrams.contains).toLong, s"doc $id n_leaked")
      assert(r.getAs[Boolean]("dirty") === (r.getAs[Long]("leak_q4") >= 1000L))
    }
    // every scorable benchmark doc reports — a silent absence hides dirt
    val expected = docs.collect { case (id, t) if id % 37 == 0 && grams(t, 5).nonEmpty => id }
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expected.toSet)
  }

  test("q23: pivot matrix == the long groupBy recompute; row sums equal event count") {
    val out = run("q23_pivot_daily").collect()
    val types = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
    val long = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.expr("(ts div 1000000) div 86400000").as("day"),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val day = r.getAs[Long]("day")
      types.foreach { c =>
        assert(r.getAs[Long](c) === long.getOrElse((day, c.stripPrefix("n_")), 0L),
          s"day $day cell $c")
      }
    }
    assert(out.map(r => types.map(r.getAs[Long](_)).sum).sum ===
      Tables.events(spark, sf).count(), "pivot cells must partition the event count")
  }

  test("q24: set ops — segment is proper (non-empty, strictly inside the intersect)") {
    val rows = run("q24_set_ops").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.nonEmpty, "segment empty — set-op chain vacuous")
    import org.apache.spark.sql.functions.{col => c, expr => e}
    val ev = Tables.events(spark, sf)
      .select(c("user_id"), e("(ts div 1000000) div 86400000").as("day"), c("event_type"))
    def days(t: String) = ev.filter(c("event_type") === t)
      .select("user_id", "day").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (days("purchase") & days("click")) -- days("error")
    assert(rows === expect, "set-op chain diverged from the driver set algebra")
    assert(expect.size < (days("purchase") & days("click")).size,
      "EXCEPT removed nothing — scenario vacuous")
  }

  test("d10: bloom screen never misses a d9 hit and matches its gram counts") {
    val exact = Dedup.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit")))
      .toMap
    val bloom = Dedup.bloomDecontaminate(spark, sf).collect()
    assert(bloom.map(_.getAs[Long]("doc_id")).toSet === exact.keySet)
    var fp = 0L; var total = 0L
    bloom.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nGrams, nHitExact) = exact(id)
      assert(r.getAs[Long]("n_grams") === nGrams, s"doc $id n_grams")
      val nHitBloom = r.getAs[Long]("n_hit")
      // Bloom membership: false positives possible, false negatives never
      assert(nHitBloom >= nHitExact, s"doc $id bloom missed an exact hit")
      fp += nHitBloom - nHitExact; total += nGrams
    }
    // 8 KiB filter on the test benchmark set: the FP mass must stay small
    assert(fp.toDouble / total.toDouble < 0.05, s"fp=$fp of $total grams")
  }

  test("t15: token stats and top-bigram coverage match a driver recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Text.repetitionScore(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = tokens(docs(id))
      val topBigram = w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        .toSeq.groupBy(identity).values.map(_.size).max
      assert(r.getAs[Long]("n_tokens") === w.length.toLong, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_distinct") === w.distinct.length.toLong, s"doc $id n_distinct")
      assert(r.getAs[Long]("top_bigram_n") === topBigram.toLong, s"doc $id top_bigram_n")
      val flag = topBigram * 10 > w.length || w.distinct.length * 5 < w.length * 2
      assert(r.getAs[Long]("repetitive") === (if (flag) 1L else 0L), s"doc $id flag")
    }
  }

  test("t16: chunk layout matches a driver-side sequential prefix sum") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tokens(r.getString(1)).length.toLong)).sortBy(_._1)
    // sequential reference: exclusive prefix sum in doc_id order, chunk by start offset
    var off = 0L
    val assigned = docs.map { case (id, n) => val c = off / 512L; off += n; (id, n, c) }
    val expected = assigned.groupBy(_._3).map { case (c, ds) =>
      c -> (ds.length.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max)
    }
    val out = Text.sequencePack(spark, sf).collect()
    val got = out.map(r => r.getAs[Long]("chunk_id") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(got === expected)
    // chunks tile the corpus: contiguous doc ranges, token total conserved
    val byChunk = out.sortBy(_.getAs[Long]("chunk_id"))
    byChunk.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("first_doc") === a.getAs[Long]("last_doc") + 1L)
      case _ =>
    }
    assert(byChunk.map(_.getAs[Long]("n_tokens")).sum === docs.map(_._2).sum)
  }

  test("t16: bucket granularity does not change the layout") {
    val a = Text.sequencePack(spark, sf, bucketDocs = 100L).collect()
    val b = Text.sequencePack(spark, sf, bucketDocs = 7L).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("e7: retention matrix invariants and a driver recompute") {
    val userDays = Tables.events(spark, sf)
      .select(col("user_id"), expr("(ts div 1000000) div 86400000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cohortOf = userDays.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val expected = userDays.toSeq
      .map { case (u, d) => (cohortOf(u), d - cohortOf(u)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = Events.cohortRetention(spark, sf).collect()
    val got = out.map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
      r.getAs[Long]("n_users")).toMap
    assert(got === expected)
    // day-offset 0 holds the full cohort: every user is active on their first day
    val cohortSizes = cohortOf.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    cohortSizes.foreach { case (d, n) =>
      assert(got((d, 0L)) === n, s"cohort $d offset-0 cell")
    }
  }

  test("q15: the Bloom pre-filter keeps every true match and prunes most of the fact side") {
    val mBits = 1 << 16; val kH = 3
    val sel = Tables.orders(spark, sf).filter(col("o_totalprice") > 450000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(sel.nonEmpty)
    val liKeys = Tables.lineitem(spark, sf).select("l_orderkey")
      .collect().map(_.getLong(0))
    // the operator's exact hash positions, evaluated once per distinct key
    // (replicating xxhash64 in the driver would re-implement the hash; the
    // point here is the PACKING and bit logic, not the hash function)
    val posOf: Map[Long, Seq[Int]] = {
      val keys = (sel ++ liKeys).toSeq
      import spark.implicits._
      keys.toDF("key").select(col("key") +: (0 until kH).map(j =>
          pmod(xxhash64(lit(j), col("key")), lit(mBits.toLong)).as(s"p$j")): _*)
        .collect()
        .map(r => r.getLong(0) -> (1 to kH).map(i => r.getLong(i).toInt).toSeq).toMap
    }
    val words = new Array[Long](mBits / 64)
    sel.foreach(key => posOf(key).foreach(p => words(p / 64) |= (1L << (p % 64))))
    def probable(key: Long): Boolean =
      posOf(key).forall(p => ((words(p / 64) >>> (p % 64)) & 1L) == 1L)
    // no false negatives: every fact row whose key IS selected survives
    liKeys.filter(sel.contains).foreach(k => assert(probable(k), s"true match $k dropped"))
    // and the screen genuinely prunes: most non-matching rows are filtered
    val kept = liKeys.count(probable)
    assert(kept < liKeys.length / 2,
      s"bloom kept $kept of ${liKeys.length} fact rows — no reduction")
  }

  test("q19: Expand-free rewrite == naive multi-distinct plan; hot group spreads on compound keys") {
    val rewritten = run("q19_hot_distinct")
    val naive = Relational.q19Naive(spark, sf)
    assert(rewritten.collect().map(_.toSeq).toSeq === naive.collect().map(_.toSeq).toSeq,
      "rewritten result diverged from the naive one-Aggregate plan")
    // the naive twin genuinely pays the Expand (row replication per
    // distinct spec) — without this the rewrite would be solving a
    // non-problem; and the rewrite genuinely avoids it in the FINAL plan
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("Expand"),
      "naive multi-distinct no longer plans through Expand — rewrite may be obsolete")
    val finalPlan = rewritten.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Expand"), "rewritten plan still contains Expand")
    // every corpus-sized exchange is keyed by a COMPOUND (grp, highcard)
    // key — the hot group never keys a corpus shuffle alone
    assert("hashpartitioning\\(grp#\\d+, user_id#\\d+".r.findFirstIn(finalPlan).isDefined,
      s"no (grp, user_id) compound-key exchange in plan:\n$finalPlan")
    assert("hashpartitioning\\(grp#\\d+, day#\\d+".r.findFirstIn(finalPlan).isDefined,
      s"no (grp, day) compound-key exchange in plan:\n$finalPlan")
    // the hot fold is real: 'hot' carries ~4/5 of the log
    val byGrp = rewritten.collect().map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    assert(byGrp("hot") > 3L * byGrp("purchase"), s"hot group not hot: $byGrp")
  }

  test("t22: quality band matches a driver-side quantile recompute and keeps the middle half") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q4Of: Map[Long, Long] = run("t2_quality_score").select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 10000 + 0.5).toLong).toMap
    val sortedQ = q4Of.values.toSeq.sorted
    val n = sortedQ.length
    def quantile(p: Double): Double = {
      val h = (n - 1).toDouble * p
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      if (lo == hi) sortedQ(lo).toDouble
      else { val f = h - lo; sortedQ(lo) * (1.0 - f) + sortedQ(hi) * f }
    }
    val (tLo, tHi) = (quantile(0.25), quantile(0.75))
    val kept = q4Of.filter { case (_, q) => q.toDouble >= tLo && q.toDouble <= tHi }
    val want = kept.groupBy { case (id, _) => docs(id) }.map { case (lang, m) =>
      lang -> (m.size.toLong, m.values.sum, m.values.min, m.values.max)
    }
    val got = run("t22_quality_band").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want, "per-lang band stats diverge from the driver recompute")
    // the band is a genuine middle cut: neither empty nor the whole corpus
    val total = got.values.map(_._1).sum
    assert(total > n * 3 / 10 && total < n * 7 / 10,
      s"band kept $total of $n docs — not an interquartile cut")
  }

  test("t23: unigram NLL matches an exact driver replay; the keep band is non-trivial") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)).toSeq).toMap
    // corpus unigram model, exactly the operator's arithmetic: per-term
    // 6-dp fixed-point log-prob, integer sums, one final IEEE division
    val cnt = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val total = cnt.values.sum
    val lq = cnt.map { case (t, c) =>
      t -> math.floor(math.log(c.toDouble / total.toDouble) * 1e6 + 0.5).toLong
    }
    val out = Text.logprobFilter(spark, sf).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = docs(id)
      val sumQ6 = w.map(lq).sum
      val nll = math.floor(-sumQ6.toDouble / w.length.toDouble / 100.0 + 0.5).toLong
      assert(r.getAs[Long]("n_tokens") === w.length.toLong, s"doc $id n_tokens")
      assert(r.getAs[Long]("nll_q4") === nll, s"doc $id nll_q4")
      assert(r.getAs[Boolean]("keep") === (nll <= 34500L), s"doc $id keep")
    }
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length,
      s"threshold is vacuous: $kept/${out.length} kept")
  }

  test("t26: margin == top1-top2 from a driver rescore; both confidence classes occur") {
    val stop = graft.operators.Text.StopWords
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).distinct.toSet
      val scored = stop.toSeq.sortBy(_._1)
        .map { case (lang, ws) => (lang, ws.count(toks).toLong) }
        .sortBy { case (lang, s) => (-s, lang) }
      id -> ((scored.head._1, scored.head._2, scored.head._2 - scored(1)._2))
    }.toMap
    val got = run("t26_langid_margin").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want, "margin diverges from the driver rescore")
    val flags = run("t26_langid_margin").collect().map(_.getBoolean(4))
    assert(flags.exists(identity) && flags.exists(!_),
      "one-sided confidence split — the screen is vacuous")
  }

  test("d23: size profile is a partition of the corpus and agrees with the label table") {
    val rows = run("d23_cluster_profile").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nCorpus = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.values.map(_._2).sum === nCorpus, "profile docs must sum to the corpus")
    rows.foreach { case (size, (nc, nd)) => assert(nd === size * nc) }
    assert(rows.keySet.exists(_ >= 2L), "no multi-doc cluster — profile vacuous")
    // cross-check against the independently computed label table
    val labels = graft.operators.Dedup.clusterLabelsFor(spark, sf, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = labels.groupBy(_._2).values.map(_.size).toSeq
      .groupBy(identity).map { case (s, xs) => s.toLong -> xs.size.toLong }
    want.foreach { case (s, n) =>
      assert(rows(s)._1 === n, s"size-$s cluster count mismatch")
    }
    assert(rows(1L)._1 === nCorpus - labels.length, "singleton count mismatch")
  }

  test("d22: threshold curve is monotone and the tau=0.5 arm equals the gated d3 pair set") {
    val rows = run("d22_threshold_sweep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set(3L, 5L, 7L, 9L))
    // nested thresholds ⇒ pair and doc counts can only fall as tau rises
    Seq(3L -> 5L, 5L -> 7L, 7L -> 9L).foreach { case (lo, hi) =>
      assert(rows(lo)._1 >= rows(hi)._1 && rows(lo)._2 >= rows(hi)._2,
        s"curve not monotone between tau .$lo and .$hi")
    }
    assert(rows(3L)._1 > rows(9L)._1, "flat curve — sweep measures nothing")
    // cross-check an arm against the independently gated d3 query
    val d3 = graft.operators.Dedup.minhashLsh(spark, sf, 0.5)
    assert(rows(5L)._1 === d3.count(), "tau=0.5 arm disagrees with d3's pair count")
  }

  test("t25: drift contributions match an exact driver KL recompute; drift is non-vacuous") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("lang", "text").collect().map(r => (r.getString(0) == "en", r.getString(1)))
    val na = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nb = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (inA, text) =>
      text.split(" ", -1).foreach(t => if (inA) na(t) += 1 else nb(t) += 1)
    }
    val vocab = na.keySet ++ nb.keySet
    val (ta, tb, v) = (na.values.sum, nb.values.sum, vocab.size.toLong)
    def contrib(t: String): Long = {
      val pa = (na(t) + 1).toDouble / (ta + v).toDouble
      val pb = (nb(t) + 1).toDouble / (tb + v).toDouble
      math.floor(pa * math.log(pa / pb) * 1e9 + 0.5).toLong
    }
    val want = vocab.toSeq.map(t => (t, contrib(t)))
      .sortBy { case (t, c) => (-c, t) }.take(20)
    val got = run("t25_term_drift").collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(got === want, "top drift terms diverge from the driver KL recompute")
    assert(got.head._2 > 0L, "no positive drift contribution — the slices do not differ")
  }

  test("d21: duplicated-span coverage matches a position-set driver recompute (no double count)") {
    val w = 8
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    // global span multiset over STRINGS (no hashes — independent path)
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, toks) <- docs; i <- 0 to toks.length - w)
      counts(toks.slice(i, i + w).mkString(" ")) += 1
    val want = docs.map { case (id, toks) =>
      val covered = scala.collection.mutable.BitSet.empty
      for (i <- 0 to toks.length - w if counts(toks.slice(i, i + w).mkString(" ")) > 1)
        covered ++= (i until i + w)
      id -> covered.size.toLong
    }.toMap
    assert(want.values.sum > 0, "no duplicated spans at this SF — the d21 gate would be vacuous")
    val got = run("d21_dup_spans").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_tokens")).toMap
    assert(got === want, "interval-sweep coverage diverges from the position-set recompute")
    // overlap really occurs somewhere, so the sweep's no-double-count path is exercised
    val overlapping = docs.exists { case (id, toks) =>
      val starts = (0 to toks.length - w).filter(i => counts(toks.slice(i, i + w).mkString(" ")) > 1)
      starts.sliding(2).exists { case Seq(a, b) => b - a < w; case _ => false }
    }
    assert(overlapping, "no overlapping duplicated spans anywhere — sweep clamp untested")
  }

  test("d19: triangle counts match an exact driver recompute; the graph has triangles") {
    val pairs = graft.operators.Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0L
    for ((a, b) <- pairs; c <- adj(a) if c > b && adj(b).contains(c)) {
      total += 1
      Seq(a, b, c).foreach(x => triCount(x) += 1)
    }
    assert(total > 0, "no triangles at sf0.001 — the d19 gate would be vacuous")
    val got = run("d19_triangles").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tri")).toMap
    assert(got === triCount.toMap, "oriented-wedge count diverges from the naive recompute")
    assert(got.values.sum === 3 * total, "per-node counts must sum to 3x the triangle total")
  }

  test("d20: unified clusters refine-merge the two signals; labels match a driver union-find") {
    val lex = graft.operators.Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sem = graft.operators.Dedup.semDedup(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lex.nonEmpty && sem.nonEmpty, "one signal is empty — the union is vacuous")
    // driver union-find over the merged edge list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (lex ++ sem).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = (lex ++ sem).flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.map(x => x -> find(x)).toMap
    val got = run("d20_unified_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got === want, "unified CC labels diverge from the driver union-find")
    // the union must actually merge something beyond the lexical-only clustering
    val lexOnly = run("d7_dup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got != lexOnly, "semantic edges changed nothing — d20 duplicates d7")
  }

  test("d18: semdedup pairs are co-clustered, above threshold, and a subset of exact pairs") {
    val tau = 0.4
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val centroids = emb.filter(_._1 < 16).toSeq.sortBy(_._1)
    def cell(v: Array[Double]): Long =
      centroids.map { case (cid, c) => (cid, cos(v, c)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
    val got = run("d18_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (cl, a, b, sim) =>
      assert(cell(emb(a)) === cl && cell(emb(b)) === cl, s"pair $a/$b not co-clustered in $cl")
      val exact = cos(emb(a), emb(b))
      assert(exact >= tau, s"pair $a/$b below threshold: $exact")
      assert(math.abs(exact - sim) < 1e-3, s"pair $a/$b sim mismatch")
    }
    // the approximation contract: emitted == exact-pairs ∩ co-clustered
    val ids = emb.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      if cell(emb(i)) == cell(emb(j)) && cos(emb(i), emb(j)) >= tau
    } yield (i, j)).toSet
    assert(got.map(p => (p._2, p._3)).toSet === expected)
  }

  test("d17: integer pagerank matches an exact driver replay of the iterations") {
    val pairs = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val n = deg.size.toLong
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    var pr: Map[Long, Long] = deg.map { case (v, _) => v -> scale / n }
    (1 to 3).foreach { _ =>
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = s.map { case (v, sum) => v -> (base + (85L * sum) / 100L) }
    }
    val got = run("d17_pagerank").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === pr, "pagerank diverged from the exact integer replay")
    // ordering contract: pr desc, doc_id asc
    assert(got.toSeq === got.toSeq.sortBy { case (id, p) => (-p, id) })
    // sanity: total mass stays within floor-loss of the scale
    val mass = pr.values.sum
    assert(mass <= scale && mass > scale - 100L * n, s"mass $mass drifted from $scale")
  }

  test("q20: decorrelated EXISTS chain matches a driver recompute; no surviving Subquery nodes") {
    val df = run("q20_exists_chain")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"),
      "correlated EXISTS/NOT EXISTS did not decorrelate — per-row subquery execution survives")
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val finished = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val byOrder = lines.groupBy(_._1)
    val want = lines.filter { case (ok, sk, rf) =>
      finished.contains(ok) && rf == "R" && {
        val others = byOrder(ok).filter(_._2 != sk)
        others.nonEmpty && !others.exists(_._3 == "R")
      }
    }.groupBy(_._2).map { case (sk, xs) => sk -> xs.length.toLong }
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty, "q20 empty — the sole-offender pattern never fires on this corpus")
    val wantTop = want.toSeq.sortBy { case (sk, n) => (-n, sk) }.take(50)
    assert(got.toSeq === wantTop, "q20 diverges from the driver recompute")
  }

  test("e11: session lift matches a full driver-side market-basket recompute") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000").as("ms"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // replay the e2 gap rule: per user, events in (ms, event_id) order;
    // a >30-min gap starts a new session
    val sessions: Seq[Set[String]] = evs.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val buf = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.Set[String]]()
      var prev = Long.MinValue
      ordered.foreach { case (_, ms, _, t) =>
        if (buf.isEmpty || ms - prev > Events.SessionGapMs)
          buf += scala.collection.mutable.Set[String]()
        buf.last += t
        prev = ms
      }
      buf.map(_.toSet)
    }.toSeq
    val n = sessions.size.toLong
    val marg = sessions.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val pairs = sessions.flatMap(s =>
      s.toSeq.sorted.combinations(2).map { case Seq(x, y) => (x, y) })
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val got = run("e11_session_lift").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_ab") === pairs((ta, tb)), s"n_ab $ta/$tb")
      assert(r.getAs[Long]("n_a") === marg(ta) && r.getAs[Long]("n_b") === marg(tb))
      assert(r.getAs[Long]("n_sessions") === n)
      val lift = n.toDouble * pairs((ta, tb)).toDouble / (marg(ta).toDouble * marg(tb).toDouble)
      assert(r.getAs[Long]("lift_4") === math.floor(lift * 10000.0 + 0.5).toLong, s"lift $ta/$tb")
    }
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === pairs.keySet,
      "pair coverage diverges from the driver recompute")
  }

  test("e10: transition rows are a probability distribution per from_type") {
    val out = run("e10_transition_matrix").collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getString(0))
    byFrom.foreach { case (from, rows) =>
      val pSum = rows.map(_.getAs[Long]("p_q4")).sum
      // each row rounds independently: the sum can miss 10000 by at most
      // half a unit per row
      assert(math.abs(pSum - 10000L) <= rows.length / 2 + 1,
        s"from=$from probabilities sum to $pSum")
      val n = rows.map(_.getAs[Long]("n")).sum
      assert(n > 0)
    }
    // total transitions = total events - one per user (each user's last
    // event has no successor)
    val e = graft.sources.Tables.events(spark, sf)
    val users = e.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === e.count() - users)
  }

  test("t21: the integer z-screen agrees with a float z-score recompute") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").length.toLong))
    val expected = docs.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.length.toDouble
      val mu = rows.map(_._3).sum / n
      val sd = math.sqrt(rows.map(x => (x._3 - mu) * (x._3 - mu)).sum / n)
      rows.filter(r => math.abs(r._3 - mu) > 1.5 * sd).map(_._1).toSeq
    }.toSet
    val got = run("t21_length_outliers").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === expected)
    assert(got.nonEmpty, "outlier screen is vacuous on this corpus")
  }

  test("d16: minhash agreement tracks exact Jaccard (unbiased estimator sanity)") {
    val out = run("d16_minhash_calibration").collect()
    assert(out.nonEmpty)
    val errs = out.map { r =>
      math.abs(r.getAs[Long]("m16").toDouble / 16.0 - r.getAs[Double]("jaccard"))
    }
    // 16 coords → per-pair std ≤ 1/8; candidate pairs skew high-jaccard,
    // so the mean absolute error stays well inside two stds
    assert(errs.sum / errs.length < 0.2, s"MAE ${errs.sum / errs.length}")
    out.foreach { r =>
      val m = r.getAs[Long]("m16")
      assert(m >= 0L && m <= 16L)
      assert(m >= 4L, s"banded pair with agreement $m/16 — banding requires a full band match")
    }
  }

  test("q17: orphans are genuinely zero; unreferenced parents are real and cross-check q5") {
    val got = run("q17_fk_audit").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"), r.getAs[Long]("n_unreferenced")))
      .toMap
    assert(got.size === 6)
    // this generator's edges are referentially closed — asserted, not assumed
    got.foreach { case (e, (_, orphans, _)) => assert(orphans === 0L, s"$e has orphans") }
    // the reverse direction is the non-vacuous one: lineitem-less orders
    // exist in this generator — recompute directly and match the audit row
    val orderless = graft.sources.Tables.orders(spark, sf).select("o_orderkey")
      .join(graft.sources.Tables.lineitem(spark, sf).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(orderless > 0L, "no lineitem-less orders — the unreferenced check is vacuous")
    assert(got("lineitem->orders")._3 === orderless)
  }

  test("q16: upTo/after cutoff scans partition the event log exactly") {
    val cutoff = 1705363200000L
    val base = Tables.eventsUpToMs(spark, sf, cutoff).count()
    val delta = Tables.eventsAfterMs(spark, sf, cutoff).count()
    assert(base > 0 && delta > 0, s"cutoff does not split the log: base=$base delta=$delta")
    assert(base + delta === Tables.events(spark, sf).count(),
      "upTo + after lose or double-count events at a sub-ms residue")
  }

  test("d15: keep-longest selection matches a full driver recompute") {
    // independent replication of the whole chain: shingle → h60 mod P →
    // df-cap → pair stats → containment → orientation → argmax container
    val P = 2147483647L
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val hs: Map[Long, Set[Long]] = docs.map { case (id, t) =>
      val w = t.split(" ")
      val sh = if (w.length < 3) Set.empty[String]
               else w.sliding(3).map(_.mkString(" ")).toSet
      id -> sh.map(s => h60(s) % P)
    }.toMap
    val dfCount = hs.values.flatten.toSeq.groupBy(identity).map { case (h, v) => h -> v.size }
    val kept = hs.map { case (id, s) => id -> s.filter(dfCount(_) <= 10) }
    val ids = kept.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      common = (kept(a) & kept(b)).size if common > 0
      na = kept(a).size; nb = kept(b).size
      c = common.toDouble / math.min(na, nb) if c >= 0.4
    } yield (a, b, na, nb, c)
    val expected = pairs
      .map { case (a, b, na, nb, c) =>
        if (na < nb) (a, b, nb, c) else (b, a, math.max(na, nb), c)
      }
      .groupBy(_._1)
      .map { case (dropped, cands) =>
        val best = cands.maxBy { case (_, keptId, keptN, c) => (c, keptN, -keptId) }
        dropped -> (best._2, best._4)
      }
    val got = run("d15_keep_longest").collect()
      .map(r => r.getAs[Long]("dropped") ->
        (r.getAs[Long]("kept"), r.getAs[Double]("containment"))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "corpus should contain containment dups")
  }
}
