package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Vector expressions + kNN semantics (reference behavior:
  * app/core/similarity_metrics.py, app/core/indexes/flat.py). */
class VectorSpec extends GraftSuite {

  test("v49: doc max-sim self-retrieves its query doc at rank 1; pooling is a true max") {
    val out = run("v49_doc_maxsim").collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rows) =>
      val top = rows.minBy(_.getAs[Long]("rank"))
      assert(top.getAs[Long]("doc_id") === q,
        s"query $q (its own first window) must retrieve doc $q at rank 1")
      assert(top.getAs[Double]("score") === 1.0, "self-window cosine must be exactly 1")
      // scores non-increasing down the ranking
      val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  import spark.implicits._

  private def scalar(exprStr: String): Any =
    spark.sql(s"SELECT $exprStr").collect()(0).get(0)

  test("cosine/l2/dot/manhattan match hand-computed values") {
    val a = "array(1.0D, 2.0D, 2.0D)"
    val b = "array(2.0D, 1.0D, 2.0D)"
    assert(math.abs(scalar(s"graft_dot($a, $b)").asInstanceOf[Double] - 8.0) < 1e-12)
    assert(math.abs(scalar(s"graft_cosine($a, $b)").asInstanceOf[Double] - 8.0 / 9.0) < 1e-12)
    assert(math.abs(scalar(s"graft_l2($a, $b)").asInstanceOf[Double] - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(scalar(s"graft_manhattan($a, $b)").asInstanceOf[Double] - 2.0) < 1e-12)
    assert(math.abs(scalar(s"graft_norm($a)").asInstanceOf[Double] - 3.0) < 1e-12)
  }

  test("cosine of zero vector is 0.0 (reference similarity_metrics.py:29-30)") {
    assert(scalar("graft_cosine(array(0.0D, 0.0D), array(1.0D, 1.0D))") === 0.0)
  }

  test("v1 flat cosine kNN: each query's rank-1 hit is itself with score 1.0") {
    val top1 = run("v1_knn_cosine_flat").filter($"rank" === 1).collect()
    assert(top1.length === 8)
    top1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("score") - 1.0) < 1e-9)
    }
  }

  test("graft_sq8_encode matches the floor-grid formula; zero vector encodes NULL") {
    val out = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("id", "v")
      .select($"id", Graft.sq8Encode($"v").as("q"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Byte](1))).toMap
    // maxabs = 1.0, scale = 127: floor(63.5+.5)=64, floor(-127+.5)=-127, floor(31.75+.5)=32
    assert(out(1L) === Seq[Byte](64, -127, 32))
    assert(out(2L) === null, "zero vector must encode to NULL (no quantizable signal)")
  }

  test("v17: int8 quantization keeps the self-hit at rank 1 with near-1.0 score") {
    val top1 = run("v17_sq8_search").filter($"rank" === 1).collect()
    assert(top1.length === 8)
    top1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id"),
        "quantization noise displaced the self-hit from rank 1")
      assert(r.getAs[Double]("score") > 0.999)
    }
  }

  test("v35: sign-word packing matches driver bit math; self-hit survives Hamming+rerank") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(3)(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val got = vecs.toDF("id", "v")
      .select($"id",
        operators.Knn.signWordExpr("v", 0).as("w0"),
        operators.Knn.signWordExpr("v", 1).as("w1"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    vecs.foreach { case (id, v) =>
      def wordOf(w: Int): Long = (0 until 32).foldLeft(0L) { (acc, i) =>
        if (v(32 * w + i) > 0f) acc | (1L << i) else acc
      }
      assert(got(id) === ((wordOf(0), wordOf(1))),
        s"packed sign words diverge from driver bit math for vec $id")
    }
    // self Hamming distance is 0, so the self-hit is always a candidate and
    // the exact rerank must put it back at rank 1 with cosine 1.0
    val top1 = run("v35_binary_hamming").filter($"rank" === 1).collect()
    assert(top1.length === 8)
    top1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("score") - 1.0) < 1e-9)
    }
  }

  test("v37: multi-probe candidates dominate the exact-probe arm at equal index size") {
    // same 2-table/16-bit index; the only difference is the query-side
    // 1-bit-flip probe expansion — a candidate SUPERSET, so the top-k can
    // only gain rows and per-rank scores can only rise
    val mp = run("v37_multiprobe_lsh").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) -> r.getAs[Double]("score")).toMap
    val exact = operators.Lsh.search(spark, sf, k = 10, nQueries = 8,
      nTables = 2, nBits = 16, seed = 1000).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) -> r.getAs[Double]("score")).toMap
    assert(mp.size >= exact.size,
      s"multi-probe returned fewer hits (${mp.size}) than exact probing (${exact.size})")
    exact.foreach { case (key, s) =>
      assert(mp.contains(key) && mp(key) >= s - 1e-9,
        s"rank $key regressed under multi-probe: ${mp.get(key)} < $s")
    }
    // the expansion must actually BUY something on this corpus, or the
    // gated query demonstrates nothing
    assert(mp.size > exact.size || exact.exists { case (k2, s) => mp(k2) > s + 1e-9 },
      "multi-probe found nothing beyond the exact buckets — parameters are vacuous")
  }

  test("v40: recall is monotone in refine depth and the r=40 arm matches v35's overlap") {
    val sweep = run("v40_refine_sweep").collect()
      .map(r => r.getAs[Long]("refine") -> r.getAs[Long]("hits")).toMap
    assert(sweep.keySet === Set(10L, 20L, 40L, 80L))
    val ordered = sweep.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in refine depth: $sweep")
    // consistency: the r=40 arm's hit count == |v35 result ∩ v1 exact top-k|
    val v35ids = run("v35_binary_hamming").select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val v1ids = run("v1_knn_cosine_flat").select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sweep(40L) === (v35ids intersect v1ids).size.toLong,
      "sweep arm diverges from the gated v35 query at the same r")
  }

  test("v16g: the binary candidate scan pushes the label filter; hits stay in the filter set") {
    val df = run("v16g_filtered_binary")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(label"),
      s"label filter not pushed to the pack scan:\n${plan.take(900)}")
    val allowed = graft.sources.Tables.embeddings(spark, sf)
      .filter($"label".isin(2, 5)).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => allowed.contains(r.getAs[Long]("vec_id"))),
      "a hit escaped the metadata filter")
  }

  test("v2 L2 kNN scores ascend per query; v1 cosine scores descend") {
    val l2 = run("v2_knn_l2_flat").collect()
    l2.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sorted.sameElements(scores))
    }
    val cos = run("v1_knn_cosine_flat").collect()
    cos.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sorted.reverse.sameElements(scores))
    }
  }

  test("graft_topk keeps k best with deterministic tie-break") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0), (4L, 9.0)).toDF("id", "s")
    val top = df.agg(expr("graft_topk(s, id, 3, false)").as("t"))
      .selectExpr("inline(t)").as[(Double, Long)].collect()
    assert(top.toSeq === Seq((9.0, 4L), (5.0, 1L), (5.0, 2L)))
    val bottom = df.agg(expr("graft_topk(s, id, 3, true)").as("t"))
      .selectExpr("inline(t)").as[(Double, Long)].collect()
    assert(bottom.toSeq === Seq((1.0, 3L), (5.0, 1L), (5.0, 2L)))
  }

  test("v12 knn join excludes self") {
    assert(run("v12_knn_join").filter($"qid" === $"vec_id").count() === 0)
  }

  test("v6 IVF assignment covers every vector exactly once") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(run("v6_ivf_assign").count() === n)
    assert(run("v6_ivf_assign").select("vec_id").distinct().count() === n)
  }

  test("v8 kmeans produces 16 non-empty clusters") {
    val rows = run("v8_ivf_kmeans").collect()
    assert(rows.length === 16)
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("v9 simhash keys are within [0, 2^16)") {
    val Row(mn: Long, mx: Long) =
      run("v9_simhash_keys").agg(min("key"), max("key")).collect()(0)
    assert(mn >= 0L && mx < 65536L)
  }

  test("vector ops throw on dimension mismatch (reference FlatIndex dim check)") {
    val e = intercept[Exception] {
      scalar("graft_cosine(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D))")
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("graft_vec_normalize yields a unit vector; zero vector passes through") {
    val n = scalar("graft_norm(graft_vec_normalize(array(3.0D, 4.0D)))").asInstanceOf[Double]
    assert(math.abs(n - 1.0) < 1e-12)
    val z = scalar("graft_vec_normalize(array(0.0D, 0.0D))")
      .asInstanceOf[scala.collection.Seq[Double]]
    assert(z.forall(_ == 0.0))
  }

  test("graft_nearest_centroid picks the argmax-cosine index, ties to lowest") {
    // centroid 1 is exactly the query direction; centroid 0 orthogonal
    val r = scalar(
      "graft_nearest_centroid(array(2.0D, 0.0D), array(array(0.0D, 1.0D), array(1.0D, 0.0D)))")
      .asInstanceOf[Row]
    assert(r.getInt(0) === 1)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // exact tie between identical centroids → index 0
    val t = scalar(
      "graft_nearest_centroid(array(1.0D, 1.0D), array(array(1.0D, 1.0D), array(1.0D, 1.0D)))")
      .asInstanceOf[Row]
    assert(t.getInt(0) === 0)
  }

  test("graft_nearest_centroid_grouped routes by key; L2 mode argmins; unknown key throws") {
    // group 0: centroids {(0,1), (1,0)}; group 1: centroids {(1,1), (2,0)}
    val mapSql = "map(0L, array(array(0.0D, 1.0D), array(1.0D, 0.0D)), " +
      "1L, array(array(1.0D, 1.0D), array(2.0D, 0.0D)))"
    val g0 = scalar(s"graft_nearest_centroid_grouped(array(2.0D, 0.0D), 0L, $mapSql)")
      .asInstanceOf[Row]
    assert(g0.getInt(0) === 1) // cosine argmax within group 0
    val g1 = scalar(s"graft_nearest_centroid_grouped(array(2.0D, 0.0D), 1L, $mapSql)")
      .asInstanceOf[Row]
    assert(g1.getInt(0) === 1) // group 1's (2,0) is exactly the query direction
    val l2 = scalar(s"graft_nearest_centroid_grouped_l2(array(2.0D, 0.0D), 1L, $mapSql)")
      .asInstanceOf[Row]
    assert(l2.getInt(0) === 1 && math.abs(l2.getDouble(1) - 0.0) < 1e-12) // −‖v−c‖² = 0
    val l2other = scalar(s"graft_nearest_centroid_grouped_l2(array(1.0D, 1.0D), 1L, $mapSql)")
      .asInstanceOf[Row]
    assert(l2other.getInt(0) === 0) // exact match in slot 0 of group 1
    intercept[Exception] {
      scalar(s"graft_nearest_centroid_grouped(array(2.0D, 0.0D), 7L, $mapSql)")
    }
  }

  test("v21 range search ⊇ every v7 top-k hit at or above the radius, same scores") {
    val tau = 0.2
    val topk = operators.Ivf.search(spark, sf).collect()
      .filter(_.getAs[Double]("score") >= tau)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      .toSet
    val range = operators.Ivf.rangeSearch(spark, sf, tau).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
      .toSet
    assert(topk.nonEmpty && topk.subsetOf(range),
      s"missing from range result: ${(topk -- range).take(5)}")
    assert(range.forall(_._3 >= tau))
    assert(range.size > topk.size, "range result should extend beyond the top-k cut")
  }

  test("v22 MMR picks the top relevance hit first, then diversifies vs plain top-k") {
    import org.apache.spark.sql.functions._
    val mmr = operators.Knn.mmrRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    val topk = operators.Knn.flatSearch(spark, sf, "cosine").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    val mmrByQ = mmr.groupBy(_._1)
    val topkByQ = topk.groupBy(_._1)
    assert(mmrByQ.keySet === topkByQ.keySet)
    // rank 1 is pure relevance — must agree with flat search's top hit
    mmrByQ.foreach { case (q, rows) =>
      assert(rows.minBy(_._2)._3 === topkByQ(q).minBy(_._2)._3, s"qid $q top pick differs")
      assert(rows.map(_._3).distinct.length === rows.length, s"qid $q repeated a pick")
    }
    // diversification: mean pairwise cosine among picks must not exceed top-k's
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- ids.indices if i < j)
        yield cos(emb(ids(i)), emb(ids(j)))
      ps.sum / ps.size
    }
    val (divMmr, divTop) = mmrByQ.keySet.toSeq.sorted.map { q =>
      (meanPairSim(mmrByQ(q).sortBy(_._2).map(_._3).toSeq),
        meanPairSim(topkByQ(q).sortBy(_._2).map(_._3).toSeq))
    }.unzip
    assert(divMmr.sum < divTop.sum,
      s"MMR did not diversify: mean pair-sim ${divMmr.sum / divMmr.size} vs top-k ${divTop.sum / divTop.size}")
  }

  test("v24 hybrid RRF scores follow exactly from the arm ranks; both-arm docs can beat either top-1") {
    val out = operators.SearchText.hybridSearch(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val rb = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rb.isDefined || rv.isDefined)
      val expect = rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 5e-7,
        s"doc ${r.getLong(0)}: rrf ${r.getAs[Double]("rrf")} != $expect from ranks $rb/$rv")
    }
    // fusion at work on this corpus: the winner is present in BOTH arms
    // (two mid ranks beat any single top-1: 2/65 > 1/61)
    val top = out.head
    assert(!top.isNullAt(1) && !top.isNullAt(2),
      s"expected a both-arm winner, got ranks (${top.get(1)}, ${top.get(2)})")
  }

  test("every graft function registers through GraftExtensions (SQL-only surface complete)") {
    val reg = spark.sessionState.functionRegistry
    Graft.functionBuilders.foreach { case (name, _) =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered")
    }
  }
}
