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
}
