package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized properties for the two order-sensitive state
  * machines added around the as-of/facade surface: the sort-merge as-of
  * join's single-buffered-row merge (duplicate keys, time ties, null
  * keys AND null times, empty sides) and the facade's per-id op fold
  * (upsert/patch/delete with metadata merges). Both have handcrafted
  * fixture specs; the random sequences exercise state transitions those
  * fixtures cannot enumerate. */
class AsOfJoinPropertySpec extends AnyFunSuite {

  private def reference(left: Seq[(Long, Option[Long], Option[Long])],
                        right: Seq[(Long, Option[Long], Option[Long])]
                       ): Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      id -> ((k, t) match {
        case (Some(kk), Some(tt)) =>
          val cands = right.collect {
            case (rid, Some(rk), Some(rt)) if rk == kk && rt <= tt => (rt, rid)
          }
          if (cands.isEmpty) None else Some(cands.max._2)
        case _ => None // null key or null time joins nothing
      })
    }.toMap

  test("AsOfJoinExec == scan reference on random frames with ties and nulls") {
    val spark = graft.Graft.init(TestSession.spark)
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (iter <- 1 to 10) {
      def maybe(n: Int): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(n).toLong)
      // few keys + a coarse time grid → heavy duplicate/tie coverage
      val left = (0 until rnd.nextInt(40)).map(i => (i.toLong, maybe(4), maybe(6)))
      val right = (0 until rnd.nextInt(40)).map(i => (100L + i, maybe(4), maybe(6)))
      val lDf = left.toDF("id", "k", "t")
      val rDf = right.toDF("rid", "rk", "rt")
      val lp = lDf.queryExecution.analyzed
      val rp = rDf.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val got = org.apache.spark.sql.GraftShims.ofRows(spark,
        graft.plans.AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "rk"),
          attr(lp, "t"), attr(rp, "rt"), attr(rp, "rid")))
        .select($"id", $"rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === reference(left, right),
        s"iter=$iter |left|=${left.size} |right|=${right.size}")
    }
  }
}

/** Randomized graphs through the large-star/small-star contraction vs a
  * driver union-find — the CC kernel underpins d7/d17/d19/d20 and f8's
  * incremental merge, and its convergence argument (alternating stars
  * reach per-component minima) deserves adversarial shapes the corpus
  * graphs never produce: chains, stars, cliques-with-bridges, duplicate
  * and reversed edges. */
class ConnectedComponentsPropertySpec extends AnyFunSuite {

  test("contraction labels == union-find minima on random multigraphs") {
    val spark = graft.Graft.init(TestSession.spark)
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    for (iter <- 1 to 6) {
      val n = 8 + rnd.nextInt(25)
      val m = rnd.nextInt(70)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b } ++
        // adversarial garnish: a long chain and a star, overlapping ids
        (0L until 6L).map(i => (i, i + 1)) ++ (0L until 5L).map(i => (20L % n, i))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = { val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r } }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"iter=$iter n=$n m=${edges.size}")
    }
  }
}

/** Random op sequences through the REAL facade vs an in-memory replica of
  * the documented fold semantics — upsert replaces, patch coalesces
  * fields and replaces the metadata dict when one is supplied (live docs
  * only), delete tombstones, a later upsert revives. */
class FacadeFoldPropertySpec extends AnyFunSuite {

  test("GraftDb document fold == driver replica over a random op sequence") {
    val spark = graft.Graft.init(TestSession.spark)
    val db = new graft.api.GraftDb(spark,
      java.nio.file.Files.createTempDirectory("graftdb-prop").toString)
    db.createLibrary(1L, "lib", 4, "flat")
    val rnd = new scala.util.Random(777)
    // replica: doc_id -> (live, title, metadata)
    val state = scala.collection.mutable.Map.empty[Long, (Boolean, String, Map[String, String])]
    val keys = Seq("a", "b", "c")
    for (_ <- 1 to 40) {
      val doc = rnd.nextInt(5).toLong
      val cur = state.getOrElse(doc, (false, "", Map.empty[String, String]))
      rnd.nextInt(4) match {
        case 0 => // create / full upsert
          val meta = keys.filter(_ => rnd.nextBoolean()).map(k => k -> s"v${rnd.nextInt(3)}").toMap
          val title = s"t${rnd.nextInt(5)}"
          db.createDocument(1L, doc, title, meta)
          state(doc) = (true, title, meta)
        case 1 => // patch title only
          val title = s"t${rnd.nextInt(5)}"
          db.updateDocument(1L, doc, title = Some(title))
          if (cur._1) state(doc) = (true, title, cur._3)
        case 2 => // patch metadata only (supplied dict REPLACES the stored one)
          val meta = keys.filter(_ => rnd.nextBoolean()).map(k => k -> s"w${rnd.nextInt(3)}").toMap
          db.updateDocument(1L, doc, metadata = Some(meta))
          if (cur._1) state(doc) = (true, cur._2, meta)
        case 3 =>
          db.deleteDocument(1L, doc)
          if (cur._1) state(doc) = (false, cur._2, cur._3)
      }
    }
    val got = db.listDocuments(1L).collect().map { r =>
      r.getLong(1) -> ((r.getString(2), r.getAs[Map[String, String]]("metadata")))
    }.toMap
    val want = state.collect { case (doc, (true, t, m)) => doc -> ((t, m)) }.toMap
    assert(got === want, "facade fold diverged from the replica")
    assert(want.nonEmpty, "random walk left no live docs — weak run, reseed")
  }
}
