package graft

import org.apache.spark.sql.functions._

import graft.operators.Text

/** t17's redaction semantics on PII-LADEN documents — the synthetic corpus
  * contains no PII, so the oracle gate there only proves the identity
  * rewrite; the actual scrub behavior is asserted here. Also d11/d12
  * invariants the oracle can't phrase (membership, maximality). */
class PiiSpec extends GraftSuite {
  import spark.implicits._

  private def redact(text: String): (String, Map[String, Long]) = {
    var t = text
    val counts = Text.PiiPatterns.map { case (name, pat, tok) =>
      val n = pat.r.findAllIn(t).length.toLong
      t = t.replaceAll(pat, tok)
      name -> n
    }.toMap
    (t, counts)
  }

  private val docs = Seq(
    (1L, "contact alice.smith+news@example.co.uk or bob@test.io today"),
    (2L, "server 10.0.255.3 and 192.168.1.1 rebooted"),
    (3L, "call 555-123-4567 or 555.987.6543 now"),
    (4L, "mixed: a@b.com then 1.2.3.4 then 111-222-3333 done"),
    (5L, "no pii here just words and 42 numbers"),
    (6L, ""))

  private def stage(): Seq[(Long, String, Long, Long, Long)] = {
    val df = docs.toDF("doc_id", "text")
    val staged = Text.PiiPatterns.foldLeft(df.withColumn("t", col("text"))) {
      case (d, (name, pat, tok)) =>
        d.withColumn(s"n_$name", size(regexp_extract_all(col("t"), lit(pat), lit(0))).cast("long"))
          .withColumn("t", regexp_replace(col("t"), pat, tok))
    }
    staged.select(col("doc_id"), col("t"), col("n_email"), col("n_ip"), col("n_phone"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("t17 chain redacts emails, IPs, phones with exact counts (JVM recompute)") {
    val got = stage()
    for ((id, t, ne, ni, np) <- got) {
      val (expT, expC) = redact(docs.find(_._1 == id).get._2)
      assert(t === expT, s"doc $id text")
      assert((ne, ni, np) === ((expC("email"), expC("ip"), expC("phone"))), s"doc $id counts")
    }
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === "contact <EMAIL> or <EMAIL> today" && byId(1L)._3 === 2L)
    assert(byId(2L)._2 === "server <IP> and <IP> rebooted" && byId(2L)._4 === 2L)
    assert(byId(3L)._2 === "call <PHONE> or <PHONE> now" && byId(3L)._5 === 2L)
    assert(byId(4L)._2 === "mixed: <EMAIL> then <IP> then <PHONE> done")
    assert(byId(5L)._2 === docs.find(_._1 == 5L).get._2) // untouched
    assert(byId(6L)._2 === "")
  }

  test("t17 stage order: an email's dotted-digit body is never shredded by ip/phone") {
    val df = Seq((1L, "x 123.456.7890@digits.example.com y")).toDF("doc_id", "text")
    val staged = Text.PiiPatterns.foldLeft(df.withColumn("t", col("text"))) {
      case (d, (_, pat, tok)) => d.withColumn("t", regexp_replace(col("t"), pat, tok))
    }
    assert(staged.select("t").as[String].head() === "x <EMAIL> y")
  }

  test("t17 is idempotent: redacting redacted text changes nothing") {
    val once = stage().map(r => r._1 -> r._2)
    val again = {
      val df = once.toDF("doc_id", "text")
      val staged = Text.PiiPatterns.foldLeft(df.withColumn("t", col("text"))) {
        case (d, (_, pat, tok)) => d.withColumn("t", regexp_replace(col("t"), pat, tok))
      }
      staged.select(col("doc_id"), col("t")).as[(Long, String)].collect().toMap
    }
    once.foreach { case (id, t) => assert(again(id) === t, s"doc $id not idempotent") }
  }

  test("t17b's gate is non-vacuous: the live corpus drives real redactions") {
    val rows = Text.piiRedactLive(spark, sf)
      .select("doc_id", "n_email", "n_ip", "n_phone")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length.toLong === Text.PiiCorpusN)
    // every PII kind fires, counts vary (0s and >0s both present), and the
    // doc with a second email reports 2
    for ((name, get) <- Seq[(String, ((Long, Long, Long, Long)) => Long)](
        ("email", _._2), ("ip", _._3), ("phone", _._4))) {
      assert(rows.map(get).sum > 0, s"no $name redactions — gate vacuous")
      assert(rows.exists(get(_) === 0L), s"every doc has a $name — no negative cases")
    }
    assert(rows.find(_._1 === 0L).get._2 === 2L) // doc 0: primary + cc email
    // JVM recompute of doc 1's chain as ground truth
    val t1 = "Ticket 1: contact user1.x1@mail1.example.com host 10.7.13.29 dial 101.203.1017 end"
    var t = t1
    val expected = Text.PiiPatterns.map { case (_, pat, tok) =>
      val n = pat.r.findAllIn(t).length.toLong; t = t.replaceAll(pat, tok); n
    }
    assert(rows.find(_._1 === 1L).get === ((1L, expected(0), expected(1), expected(2))))
  }

  test("d11 keeps a member of each cluster with the cluster-max quality") {
    val kept = operators.Dedup.keepBestCopy(spark, sf)
      .select("cluster_id", "kept_doc_id", "kept_quality")
      .as[(Long, Long, Double)].collect()
    val members = operators.Dedup.dupClusters(spark, sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = operators.Text.qualityFrame(
      graft.sources.Tables.documents(spark, sf))
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(kept.nonEmpty)
    for ((cid, keptId, q) <- kept) {
      assert(members(cid).contains(keptId), s"cluster $cid kept a non-member")
      val qs = members(cid).map(quality)
      assert(q === qs.max, s"cluster $cid kept $q, max is ${qs.max}")
      // ties resolve to the LOWEST doc_id among max-quality members
      assert(keptId === members(cid).filter(d => quality(d) == qs.max).min)
    }
  }

  test("d11's argmax is a partial agg, not a window (plan assert)") {
    val plan = operators.Dedup.keepBestCopy(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"d11 plan grew a Window node:\n$plan")
    assert(plan.contains("partial_max"), "cluster argmax should partial-aggregate map-side")
  }

  test("t18 kept counts match a driver recompute; the min language keeps everything") {
    val rows = Text.mixtureSample(spark, sf)
      .select("lang", "n_docs", "n_target", "n_kept")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nTarget = byLang.values.map(_.length).min.toLong
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    assert(rows.map(_._1).toSeq === byLang.keys.toSeq.sorted)
    for ((lang, nDocs, tgt, kept) <- rows) {
      assert(nDocs === byLang(lang).length.toLong && tgt === nTarget)
      val expect = byLang(lang).count(id => h60(s"mix:$id") % nDocs < nTarget).toLong
      assert(kept === expect, s"$lang kept")
      if (nDocs == nTarget) assert(kept === nDocs) // min language is untouched
    }
  }

  test("v16f: the label filter reaches the candidate scan pushed; results ⊆ unfiltered") {
    val labels = Seq(2, 5)
    val filtered = operators.Ivf.searchTrainedFiltered(spark, sf, labels)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""PushedFilters: \[[^\]]*label[^\]]*\]""".r.findFirstIn(plan).isDefined,
      s"label filter not pushed:\n$plan")
    // every hit carries an allowed label, and hits ⊆ the filtered corpus
    val lbl = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    filtered.select("vec_id").as[Long].collect()
      .foreach(v => assert(labels.contains(lbl(v)), s"vec $v label ${lbl(v)}"))
  }

  test("v25 recall equals the exact/approx overlap recomputed from both arms") {
    val k = 10
    val eval = operators.Ivf.recallEval(spark, sf, k)
      .select("qid", "hits", "recall").as[(Long, Long, Double)].collect()
    val exact = operators.Knn.flatSearch(spark, sf, "cosine", k)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = operators.Ivf.searchTrained(spark, sf, k)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(eval.length === exact.size)
    for ((qid, hits, recall) <- eval) {
      assert(hits === (exact(qid) & approx(qid)).size.toLong, s"q$qid hits")
      assert(recall === hits.toDouble / k && recall >= 0.0 && recall <= 1.0)
    }
  }

  test("d12 labels match t6's rule and only cross-split pairs survive") {
    val rows = operators.Dedup.splitLeakage(spark, sf)
      .select("doc_a", "doc_b", "split_a", "split_b")
      .as[(Long, Long, String, String)].collect()
    // label domain derived FROM the corpus (not a hardcoded id ceiling — a
    // regenerated larger testdata must fail a named assert, not a Map miss)
    val maxId = graft.sources.Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).as[Long].head()
    val label = spark.range(0, maxId + 1)
      .select(col("id"), Text.splitLabel(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (a, b, sa, sb) =>
      assert(label.contains(a) && label.contains(b),
        s"pair ($a,$b) outside corpus id domain [0,$maxId]")
      assert(sa !== sb)
      assert(label(a) === sa && label(b) === sb)
    }
    // and every cross-split near-dup pair is reported (none silently kept)
    val all = operators.Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val expected = all.filter { case (a, b) => label(a) != label(b) }.toSet
    assert(rows.map(r => (r._1, r._2)).toSet === expected)
  }

  test("t24: mojibake screen detections follow the injection rules exactly; both classes occur") {
    val rows = operators.Text.mojibakeScreen(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.size === operators.Text.MojiCorpusN)
    rows.foreach { case (i, (moji, repl, damaged)) =>
      val wantMoji = (if (i % 4 == 1) 1L else 0L) + (if (i % 5 == 2) 1L else 0L) +
        (if (i % 6 == 4) 1L else 0L)
      val wantRepl = if (i % 7 == 3) 2L else 0L
      assert(moji === wantMoji, s"doc $i: n_moji $moji != $wantMoji")
      assert(repl === wantRepl, s"doc $i: n_repl $repl != $wantRepl")
      assert(damaged === (wantMoji + wantRepl > 0))
    }
    // non-vacuous in both directions: damaged and clean docs both exist
    assert(rows.values.exists(_._3) && rows.values.exists(!_._3))
  }
}
