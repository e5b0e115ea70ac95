package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ivf, IvfPq, Lsh, Persist, Text}

/** Index persistence round-trips (reference: tests-mongo/test_persistence.py
  * — indexes survive restart bit-for-bit) + the physical-layout claims:
  * the bucketed band table self-joins with no Exchange, and the partitioned
  * IVF lists prune on probe. */
class PersistSpec extends GraftSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("p1: LSH search over the reloaded index == fresh-build search") {
    val roundTrip = rows(Persist.lshPersistSearch(spark, sf))
    val fresh = rows(Lsh.search(spark, sf, k = 10, nQueries = 8,
      nTables = 4, nBits = 12, seed = 5000))
    assert(roundTrip === fresh)
    assert(roundTrip.nonEmpty)
  }

  test("p2: minhash pairs from the materialized band table == fresh d3") {
    val roundTrip = rows(Persist.minhashPersistPairs(spark, sf)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4)))
    val fresh = rows(Dedup.minhashLsh(spark, sf)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4)))
    assert(roundTrip === fresh)
  }

  test("p3: IVF search over reloaded partitioned lists == fresh v7") {
    val roundTrip = rows(Persist.ivfPersistSearch(spark, sf))
    val fresh = rows(Ivf.search(spark, sf))
    assert(roundTrip === fresh)
    assert(roundTrip.nonEmpty)
  }

  test("p4: incremental append to the LSH index == fresh full build (add_chunk path)") {
    val incremental = rows(Persist.lshIncrementalSearch(spark, sf))
    val fresh = rows(Lsh.search(spark, sf, k = 10, nQueries = 8,
      nTables = 4, nBits = 12, seed = 5000))
    assert(incremental === fresh)
    assert(incremental.nonEmpty)
    // and the index table really holds both halves
    val ids = spark.table("graft_idx_lsh_inc").agg(min("vec_id"), max("vec_id")).collect()(0)
    assert(ids.getLong(0) < 400L && ids.getLong(1) >= 400L)
  }

  test("v14b: trained IVF survives persistence — round-trip == in-flight trained search") {
    val roundTrip = rows(Persist.trainedIvfPersistSearch(spark, sf))
    val fresh = rows(Ivf.searchTrained(spark, sf))
    assert(roundTrip === fresh,
      "persisted trained-IVF search diverged from the in-flight trained search")
    assert(roundTrip.nonEmpty)
    // and the trained lists really prune on probe
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_trained"
    val probed = spark.read.parquet(path).filter(col("cluster_id").isin(1L, 3L))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"trained lists do not partition-prune:\n${plan.take(600)}")
  }

  test("v44: sharded build == monolithic; shards partition the corpus; merged read prunes") {
    val sharded = rows(Persist.shardedBuildSearch(spark, sf))
    val mono = rows(Ivf.searchTrained(spark, sf))
    assert(sharded === mono,
      "merged-shard serving diverged from the monolithic trained search")
    assert(sharded.nonEmpty)
    // the shard partitions split the corpus exactly: disjoint, complete —
    // `shard` is a real partition column of the single parent root, so the
    // audit is one scan grouped by it, not per-path reads
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val shardedLists = spark.read.parquet(s"$wh/graft_idx_ivf_sharded")
    val s0 = shardedLists.filter(col("shard") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val s1 = shardedLists.filter(col("shard") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert((s0 & s1).isEmpty, "shard artifacts overlap")
    assert((s0 | s1).size.toLong ===
      graft.sources.Tables.embeddings(spark, sf).count(), "shard union incomplete")
    assert(s0.forall(_ % 2 == 0) && s1.forall(_ % 2 == 1), "shard keying broken")
    // the merged read partition-prunes on cluster_id within every shard
    val probed = shardedLists.filter(col("cluster_id").isin(1L, 3L))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"merged shard read does not partition-prune:\n${plan.take(600)}")
  }

  test("v45: sharded binary build == persisted v36; shards partition; scan stays float-free") {
    val sharded = rows(Persist.shardedBinaryBuildSearch(spark, sf))
    val mono = rows(Persist.binaryPersistSearch(spark, sf))
    assert(sharded === mono,
      "merged-shard binary serving diverged from the monolithic artifact")
    assert(sharded.nonEmpty)
    // shard partitions split the corpus exactly (even/odd keying)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val lists = spark.read.parquet(s"$wh/graft_idx_binary_sharded")
    val s0 = lists.filter(col("shard") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val s1 = lists.filter(col("shard") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert((s0 & s1).isEmpty, "binary shard artifacts overlap")
    assert((s0 | s1).size.toLong ===
      graft.sources.Tables.embeddings(spark, sf).count(), "binary shard union incomplete")
    assert(s0.forall(_ % 2 == 0) && s1.forall(_ % 2 == 1), "binary shard keying broken")
    // the merged candidate scan reads ONLY the three bigints (v36's claim
    // must survive the sharded layout — shard is a partition column, not
    // a data column, so the data ReadSchema is unchanged)
    val df = Persist.shardedBinaryBuildSearch(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val lines = plan.linesIterator.zipWithIndex.toSeq
    val locLines = lines.filter(_._1.contains("graft_idx_binary_sharded")).map(_._2)
    assert(locLines.nonEmpty, "no scan of the sharded binary artifact in the plan")
    locLines.foreach { i =>
      val window = lines.slice(i, i + 6).map(_._1).mkString("\n")
      assert(window.contains("ReadSchema: struct<vec_id:bigint,w0:bigint,w1:bigint>"),
        s"sharded artifact scan reads more than the sign words:\n$window")
    }
  }

  test("v50: sharded coded build == monolithic v19c; shards partition; merged read prunes") {
    val sharded = rows(IvfPq.shardedCodedBuildSearch(spark, sf))
    val mono = rows(IvfPq.trainedPersistSearch(spark, sf))
    assert(sharded === mono,
      "merged-shard coded serving diverged from the monolithic IVFPQ artifact")
    assert(sharded.nonEmpty)
    // shard partitions split the corpus exactly (even/odd keying), and the
    // audit is one scan of the single parent root grouped by the free
    // `shard` partition column
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val codes = spark.read.parquet(s"$wh/graft_idx_ivfpq_codes_sharded")
    val s0 = codes.filter(col("shard") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val s1 = codes.filter(col("shard") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert((s0 & s1).isEmpty, "coded shard artifacts overlap")
    assert((s0 | s1).size.toLong ===
      graft.sources.Tables.embeddings(spark, sf).count(), "coded shard union incomplete")
    assert(s0.forall(_ % 2 == 0) && s1.forall(_ % 2 == 1), "coded shard keying broken")
    // the merged read partition-prunes on cluster_id within every shard
    val probed = codes.filter(col("cluster_id").isin(1L, 3L))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"merged coded shard read does not partition-prune:\n${plan.take(600)}")
  }

  test("p19: COW generation writes only the changed shard; pinned read prunes") {
    val out = Persist.timeTravelRead(spark, sf).collect()
    assert(out.length === 2)
    val byGen = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // shard domain derived from the data (occupancy depends on max doc_id):
    // gen1 = every occupied shard; gen2 drops shard 15, rewrites shard 5 —
    // so the checksums must differ
    val docs = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
    val w = docs.agg(expr("(max(doc_id) + 16) div 16")).head.getLong(0)
    val occupied = docs.select(expr(s"doc_id div $w").as("shard"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(byGen(1L)._1 === occupied.size.toLong &&
      byGen(2L)._1 === (occupied - 15L).size.toLong)
    assert(out(0).getLong(3) !== out(1).getLong(3), "gen checksums identical")
    // the PHYSICAL gen-2 write is one shard's files, not a corpus rewrite
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val gen2Dirs = Option(new java.io.File(s"$wh/graft_cow_corpus/gen=2").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSeq
    assert(gen2Dirs === Seq("shard=5"), s"gen-2 wrote more than the changed shard: $gen2Dirs")
    // a pinned read resolves the manifest to static predicates — the scan
    // partition-prunes on (gen, shard)
    val pinned = spark.read.parquet(s"$wh/graft_cow_corpus")
      .filter(col("gen") === 1L && col("shard").isin(0L, 1L, 2L))
    pinned.collect()
    val plan = pinned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"pinned snapshot read does not partition-prune:\n${plan.take(600)}")
  }

  test("p20: bloom sidecar prunes the by-content lookup to a shard subset with every home") {
    val out = Persist.bloomSkippingLookup(spark, sf).collect()
    // known probes found exactly; the absent probe is an explicit miss row
    val misses = out.filter(_.getLong(0) === -1L)
    assert(misses.length === 1 && misses.head.getLong(1) === -1L)
    val found = out.filter(_.getLong(0) >= 0L)
    assert(found.map(_.getLong(0)).toSet === Set(7L, 123L, 456L))
    assert(found.forall(r => r.getLong(0) === r.getLong(1)), "probe found a wrong doc")
    // recompute the candidate set from the PERSISTED sidecar: it must be
    // a strict subset of the shard domain and contain every true home —
    // i.e. the skipping is real pruning, never a correctness mechanism
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val side = spark.read.parquet(s"$wh/graft_skip_sidecar").collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1)).toArray)
    // one sidecar row per OCCUPIED shard (the domain is data-derived)
    val docsAll = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
    val wWidth = docsAll.agg(expr("(max(doc_id) + 16) div 16")).head.getLong(0)
    val nOccupied = docsAll.select(expr(s"doc_id div $wWidth").as("shard"))
      .distinct().count()
    assert(side.length.toLong === nOccupied,
      s"expected $nOccupied shard sidecar rows, got ${side.length}")
    val fps = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(7L, 123L, 456L)).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        graft.streaming.Streams.h60jvm(s"skip:${r.getString(1)}")).toMap
    val cand = fps.values.flatMap(pfp =>
      side.collect { case (s, ws) if Persist.bloomMightContain(ws, pfp) => s }).toSet
    val homes = found.map(_.getLong(2)).toSet
    assert(homes.subsetOf(cand), s"a true home shard was bloom-pruned: $homes vs $cand")
    assert(cand.size < side.length, s"sidecar pruned nothing (all ${cand.size} shards candidates)")
  }

  test("v51: the selectivity switch picks structurally different plans per branch") {
    // selective default (lang=de ∧ source=src7, est. <2%): pre-filter
    // exact — the plan must not build the centroid machinery at all
    val sel = Persist.adaptiveFilteredSearch(spark, sf)
    val selRows = sel.collect()
    assert(selRows.nonEmpty &&
      selRows.forall(_.getAs[String]("strategy") === "prefilter_exact"))
    val selPlan = sel.queryExecution.optimizedPlan.toString
    assert(!selPlan.contains("graft_nearest_centroid"),
      "selective branch built an index probe it should have skipped")
    // broad filter (lang=en, ~44%): post-filter IVF — probe machinery present
    val broad = Persist.adaptiveFilteredSearch(spark, sf, filters = Seq("lang" -> "en"))
    val broadRows = broad.collect()
    assert(broadRows.nonEmpty &&
      broadRows.forall(_.getAs[String]("strategy") === "postfilter_ivf"))
    assert(broad.queryExecution.optimizedPlan.toString.contains("graft_nearest_centroid"),
      "broad branch skipped the index it should have probed")
  }

  test("v51: the strategy decision reads ONLY the stats artifact, never the corpus") {
    val filters = Seq("lang" -> "de", "source" -> "src7")
    // refresh the artifact (the maintenance job), then build the decision
    // subtree exactly as the operator does
    Persist.writeFilterStatsArtifact(spark,
      graft.sources.Tables.documents(spark, sf), filters.map(_._1))
    val dec = Persist.v51DecisionInputs(spark, filters)
    val row = dec.head()
    // decision inputs from the artifact ≡ recomputing from the corpus
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(row.getAs[Long]("n") === docs.count())
    assert(row.getAs[Long]("c0") ===
      docs.filter(col("lang") === "de").count())
    assert(row.getAs[Long]("c1") ===
      docs.filter(col("source") === "src7").count())
    // the 100 TB contract, in the EXECUTED plan: the decision subtree's
    // only file scan is the stats artifact — no documents read anywhere
    val plan = dec.queryExecution.executedPlan.toString
    assert(plan.contains("graft_stats_filterfreq"),
      s"decision does not scan the stats artifact:\n${plan.take(600)}")
    assert(!plan.contains("documents"),
      s"decision subtree scans the corpus:\n${plan.take(600)}")
  }

  test("v51c: SUM-merged generation artifacts == the from-scratch artifact bit-for-bit") {
    val out = Persist.adaptiveFilteredSearchMerged(spark, sf).collect()
    assert(out.nonEmpty)
    // the merged serving artifact must equal a from-scratch profile of
    // the whole corpus — counts are exactly mergeable, so incremental
    // maintenance is invisible (p16's gate shape on v51's input)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val merged = spark.read.parquet(s"$wh/graft_stats_filterfreq").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
    val scratch = docs.groupBy(lit("lang").as("cname"), col("lang").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .unionByName(docs.groupBy(lit("source").as("cname"), col("source").as("v"))
        .agg(count(lit(1)).as("cnt")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === scratch, "merged artifact diverges from a full rescan")
    // the merge is REAL: both generation artifacts are non-empty and
    // their (cname, v) domains overlap (the sum actually sums)
    val g0 = spark.read.parquet(s"$wh/graft_stats_filterfreq_g0").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val g1 = spark.read.parquet(s"$wh/graft_stats_filterfreq_g1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(g0.nonEmpty && g1.nonEmpty && (g0 & g1).nonEmpty,
      "generation artifacts do not overlap — the merge is a concat, not a sum")
  }

  test("v51c is truly incremental: a repeat call reuses the standing generation and merges artifacts only") {
    // first call establishes the standing history (generation 0)
    Persist.adaptiveFilteredSearchMerged(spark, sf).collect()
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    def fileStamps(p: String): Map[String, Long] = {
      val d = new java.io.File(p.stripPrefix("file:"))
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val g0Before = fileStamps(s"$wh/graft_stats_filterfreq_g0")
    val g1Before = fileStamps(s"$wh/graft_stats_filterfreq_g1")
    assert(g0Before.nonEmpty && g1Before.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    // the repeat call = one NEW-generation scan + an artifacts-only merge:
    // generation 0's files are untouched, generation 1's are rewritten
    val out = Persist.adaptiveFilteredSearchMerged(spark, sf)
    assert(out.collect().nonEmpty)
    assert(fileStamps(s"$wh/graft_stats_filterfreq_g0") === g0Before,
      "repeat call re-profiled the standing generation")
    assert(fileStamps(s"$wh/graft_stats_filterfreq_g1") !== g1Before,
      "repeat call did not land the new generation")
    // the refresh subtree's only file scans are the generation artifacts —
    // the 100 TB contract in the executed plan, not prose
    val merge = Persist.mergeStatsArtifacts(spark, Seq(
      s"$wh/graft_stats_filterfreq_g0", s"$wh/graft_stats_filterfreq_g1"))
    merge.collect()
    val plan = merge.queryExecution.executedPlan.toString
    assert(plan.contains("graft_stats_filterfreq_g"),
      s"merge does not scan the generation artifacts:\n${plan.take(600)}")
    assert(!plan.contains("documents"),
      s"merge subtree scans the corpus:\n${plan.take(600)}")
  }

  test("p13: purge proof covers the PQ codebook and packed-code artifacts") {
    val audit = Persist.purgeProofCoded(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // no purged id survives in EITHER artifact — codebook rows included
    // (model parameters must not leak a purged vector)
    assert(audit("pq_codebook")._2 === 0L, "purged id survives as a codebook row")
    assert(audit("pq_codes")._2 === 0L, "purged id survives in the code table")
    // codebook is exactly M x K rows; codes are one row per survivor
    assert(audit("pq_codebook")._1 ===
      (graft.operators.Pq.M * graft.operators.Pq.K).toLong)
    val nEmb = graft.sources.Tables.embeddings(spark, sf).count()
    assert(audit("pq_codes")._1 < nEmb, "nothing was purged (vacuous proof)")
    assert(audit("pq_codes")._1 > 0L)
    // the persisted code table is one packed bigint per vector with every
    // 4-bit cell < K
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val codes = spark.read.parquet(s"$wh/graft_purged_pq_codes")
    assert(codes.count() === codes.select("vec_id").distinct().count())
    val maxCell = codes.select(greatest((0 until graft.operators.Pq.M).map(m =>
      expr(s"shiftright(packed, ${4 * m}) % 16")): _*).as("mx"))
      .agg(max(col("mx"))).head().getLong(0)
    assert(maxCell < graft.operators.Pq.K.toLong, "a packed cell exceeds the codebook size")
  }

  test("v19c: trained IVFADC survives persistence — round-trip == in-flight v19b") {
    val roundTrip = rows(IvfPq.trainedPersistSearch(spark, sf))
    val fresh = rows(IvfPq.searchTrained(spark, sf))
    assert(roundTrip === fresh,
      "served persisted IVFADC diverged from the in-flight trained search")
    assert(roundTrip.nonEmpty)
    // the code table is one packed row per vector and prunes on probe
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivfpq_codes"
    val codes = spark.read.parquet(path)
    assert(codes.count() === codes.select("vec_id").distinct().count(),
      "codes table is not one row per vector")
    val probed = codes.filter(col("cluster_id").isin(1L, 3L))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"IVFADC code table does not partition-prune:\n${plan.take(600)}")
  }

  test("v16 filtered kNN pushes the label filter to the parquet scan") {
    val df = run("v16_filtered_knn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(label"), s"label filter not pushed:\n${plan.take(800)}")
    // and no unfiltered candidate leaks into the results
    val labels = df.join(spark.read.parquet(s"$sf/embeddings.parquet"), Seq("vec_id"))
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(labels.subsetOf(Set(2, 5)))
  }

  test("v16b filtered IVF: one scan with BOTH partition pruning and pushed label filter") {
    run("v16b_filtered_ivf").collect() // builds graft_idx_ivf_lists_labeled
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_lists_labeled"
    val probed = spark.read.parquet(path)
      .filter(col("cluster_id").isin(1L, 3L, 5L)).filter(col("label").isin(2, 5))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"probe does not prune cluster partitions:\n${plan.take(600)}")
    assert(plan.contains("PushedFilters: [In(label"),
      s"label filter not pushed into the pruned scan:\n${plan.take(600)}")
  }

  test("v16c filtered LSH: label filter pushed to the scoring scan; no unfiltered candidate leaks") {
    val df = run("v16c_filtered_lsh")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(label"),
      s"label filter not pushed:\n${plan.take(600)}")
    val labels = df.join(spark.read.parquet(s"$sf/embeddings.parquet"), Seq("vec_id"))
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(labels.nonEmpty && labels.subsetOf(Set(2, 5)), s"leaked labels: $labels")
  }

  test("v16d metadata filters: promoted key pushes to parquet, map key filters post-scan") {
    run("v16d_metadata_filter").collect() // builds graft_idx_chunkstore
    val scan = Persist.chunkStoreScan(spark)
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    // the promoted typed column reaches the reader as a pushed predicate...
    assert(plan.contains("EqualTo(lang,en)"),
      s"promoted lang filter not pushed:\n${plan.take(600)}")
    // ...the map-value predicate can NOT (parquet has no map-key stats) —
    // it must stay a post-scan Filter, never appear among PushedFilters
    assert(!plan.contains("EqualTo(metadata"),
      s"map-value filter unexpectedly pushed:\n${plan.take(600)}")
    assert(plan.contains("metadata"), "post-scan map filter missing from the plan")
    // and no candidate outside (lang, source) = (en, src7) leaks through
    val hits = run("v16d_metadata_filter")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("vec_id"), col("lang"), col("source"))
    val keys = hits.join(docs, Seq("vec_id"))
      .select("lang", "source").distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys === Set(("en", "src7")), s"leaked metadata keys: $keys")
  }

  test("hot-key promotion: workload-derived keys; a second promoted key pushes, cold key stays post-scan") {
    val base = Persist.chunkStoreBase(spark, sf)
    // n_chars filtered as often as lang in this workload → both promote;
    // source observed once → stays a map lookup
    val promoted = Persist.promoteHotKeys(base,
      Seq("lang", "lang", "n_chars", "n_chars", "source"), maxPromoted = 2)
    assert(promoted === Seq("lang", "n_chars"), s"unexpected promotion set: $promoted")
    // a key never seen in the data sample must NOT promote, however hot
    assert(Persist.promoteHotKeys(base, Seq("ghost_key", "ghost_key", "lang")) === Seq("lang"))
    val store = Persist.writeChunkStore(spark, base, "graft_test_chunkstore2", promoted)
    val scan = Persist.metadataFilter(store, promoted,
      Seq("lang" -> "en", "n_chars" -> "120", "source" -> "src3"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(lang,en)") && plan.contains("EqualTo(n_chars,120)"),
      s"promoted filters not pushed:\n${plan.take(800)}")
    assert(!plan.contains("EqualTo(metadata"),
      s"map-value filter unexpectedly pushed:\n${plan.take(800)}")
  }

  test("v16e metadata×IVF: one scan stacks partition pruning + pushed promoted key + post-scan map key") {
    run("v16e_metadata_ivf").collect() // builds graft_idx_ivf_lists_meta
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_lists_meta"
    val probed = spark.read.parquet(path)
      .filter(col("cluster_id").isin(1L, 3L, 5L))
      .filter(col("lang") === "en")
      .filter(element_at(col("metadata"), lit("source")) === "src7")
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"probe does not prune cluster partitions:\n${plan.take(600)}")
    assert(plan.contains("EqualTo(lang,en)"),
      s"promoted lang filter not pushed into the pruned scan:\n${plan.take(600)}")
    assert(!plan.contains("EqualTo(metadata"),
      s"map-value filter unexpectedly pushed:\n${plan.take(600)}")
    assert(plan.contains("metadata"), "post-scan map filter missing from the plan")
  }

  test("l3 dispatch: every hit stays in its query's library; routing matches the config") {
    import spark.implicits._
    val hits = run("l3_library_dispatch")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("hit_library"))
    val crossed = hits.join(emb, Seq("vec_id"))
      .filter(col("library") =!= col("hit_library")).count()
    assert(crossed === 0, "a hit crossed its library boundary")
    val routes = hits.select("library", "index_type").distinct()
      .as[(Long, String)].collect().toSet
    routes.foreach { case (lib, t) =>
      val want = if (lib <= 3) "flat" else if (lib <= 6) "ivf" else "lsh"
      assert(t === want, s"library $lib routed to $t, expected $want")
    }
    assert(routes.map(_._1) === (0L to 9L).toSet, "a library produced no results")
  }

  test("l2 grouped IVF build is map-only up to the count agg (no join, no window, ≤2 exchanges)") {
    val df = run("l2_library_ivf_build")
    df.collect()
    // AQE's toString repeats the plan ("Final Plan" + "Initial Plan") —
    // assert on the executed final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"grouped assignment still joins centroids:\n${plan.take(800)}")
    assert(!plan.contains("Window"), s"centroid window leaked into the assignment plan:\n${plan.take(800)}")
    val exchanges = "Exchange".r.findAllMatchIn(plan).length
    assert(exchanges <= 2, // one for the count agg, one rangepartitioning for the final sort
      s"expected ≤2 exchanges (agg + sort), got $exchanges:\n${plan.take(800)}")
  }

  test("persisted band table self-joins with NO Exchange (bucket co-location)") {
    // p2 above has materialized graft_idx_minhash_bands (bucketed by band_key)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bands = spark.table("graft_idx_minhash_bands")
      val joined = bands.as("a")
        .join(bands.as("b"),
          col("a.band_key") === col("b.band_key") && col("a.band_idx") === col("b.band_idx") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"band self-join on the bucketed index still shuffles:\n${plan.take(800)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("d6 serves from the bucketed shingle artifact: no exchange feeds the df-cap window") {
    val df = Dedup.ngramJaccard(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Bucketed: true"),
      s"d6 no longer reads the bucketed shingle table:\n${plan.take(1200)}")
    assert(plan.contains("graft_idx_shingles_"),
      "d6 should scan the persisted shingle artifact")
    // the only shuffles are the two per-key aggregates (pair counts, doc
    // sizes) and the output sort — the window and self-join consume the
    // bucket clustering straight off the scan
    val shuffles = "Exchange (hash|range)partitioning".r.findAllMatchIn(plan).length
    assert(shuffles <= 3,
      s"expected ≤3 shuffle exchanges (2 aggs + sort), got $shuffles:\n${plan.take(1200)}")
  }

  test("t20 serves df from the bucketed vocab artifact") {
    val df = Text.wordFamiliarity(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("graft_idx_vocab_"),
      s"t20 should scan the persisted vocabulary-stats artifact:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      "vocab artifact scan should be bucketed (term-clustered, exchange-free artifact side)")
  }

  test("p7: tombstoned search == fresh index over the surviving corpus; no deleted id surfaces") {
    val out = Persist.tombstoneDeleteSearch(spark, sf).collect()
    val emb = graft.sources.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val del = emb.select(col("vec_id"))
      .filter(Dedup.h60(concat(lit("del:"), col("vec_id").cast("string"))) % 7L === 0L)
      .collect().map(_.getLong(0)).toSet
    assert(del.nonEmpty, "delete slice is empty — the test is vacuous")
    out.foreach { r =>
      assert(!del.contains(r.getAs[Long]("vec_id")), s"deleted ${r.getAs[Long]("vec_id")} surfaced")
      assert(!del.contains(r.getAs[Long]("qid")), s"deleted query ${r.getAs[Long]("qid")} ran")
    }
    // merge-on-read over the tombstoned index must be indistinguishable
    // from a full rebuild on the surviving corpus
    val live = emb.filter(!col("vec_id").isInCollection(del))
    val queries = live.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val fresh = Lsh.searchIndex(Lsh.keyRows(live, 4, 12, 5000), live, queries, 4, 12, 5000, 10)
      .collect()
    assert(out.toSeq === fresh.toSeq)
  }

  test("p9: the bucketed fact-fact join shuffles neither side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Persist.colocatedJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), s"fact scans are not bucketed:\n${plan.take(800)}")
      // only the aggregate's exchange and the output sort remain — the
      // join itself consumes both bucket specs straight off the scans
      val shuffles = "Exchange (hash|range)partitioning".r.findAllMatchIn(plan).length
      assert(shuffles <= 2,
        s"expected ≤2 shuffles (agg + sort), got $shuffles:\n${plan.take(1200)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("p6: lang filter prunes partitions of the corpus layout, not rows") {
    val df = Persist.langLayoutStats(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("""PartitionFilters: \[[^\]]*lang""".r.findFirstIn(plan).isDefined,
      s"lang filter did not reach PartitionFilters:\n${plan.take(1200)}")
    assert(!"""PushedFilters: \[[^\]]*lang""".r.findFirstIn(plan).isDefined,
      "lang landed as a row-level pushed filter — the layout is not pruning directories")
  }

  test("p5: persisted labels reproduce d11 exactly; join-back shuffles only the corpus side") {
    val fresh = rows(Dedup.keepBestCopy(spark, sf))
    val persisted = rows(Persist.labelsPersistSearch(spark, sf))
    assert(persisted === fresh, "reloaded label table changed the d11 selection")

    // join-back layout claim: labels bucketed by id stream into a
    // sort-merge join with NO label-side exchange — only the (unbucketed)
    // corpus quality projection shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val labels = spark.table("graft_idx_cc_labels")
      val quality = graft.operators.Text.qualityFrame(
        graft.sources.Tables.documents(spark, sf))
        .select(col("doc_id").as("id"), col("quality"))
      val joined = labels.join(quality, Seq("id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"),
        s"label table not read through its buckets:\n${plan.take(1000)}")
      val shuffles = "Exchange (hash|range)partitioning".r.findAllMatchIn(plan).length
      assert(shuffles <= 1,
        s"expected ≤1 shuffle (corpus side only), got $shuffles:\n${plan.take(1000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("v28: the SQ8 inverted lists prune to probed partitions and store codes") {
    val df = Persist.ivfSq8Search(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""PartitionFilters: \[[^\]]*cluster_id""".r.findFirstIn(plan).isDefined,
      s"v28 probe not partition-pruned:\n${plan.take(1200)}")
    // the persisted rows are the int8 codes, not the float vectors
    val lists = spark.read.parquet(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_sq8")
    assert(lists.schema.fieldNames.contains("qcode") &&
      !lists.schema.fieldNames.contains("embedding"),
      s"v28 artifact schema: ${lists.schema.simpleString}")
  }

  test("v36: binary artifact stores only sign words; result == transient v35") {
    val df = Persist.binaryPersistSearch(spark, sf)
    val persisted = rows(df)
    assert(persisted === rows(graft.operators.Knn.binaryHammingSearch(spark, sf)),
      "persisted binary search diverges from the transient build")
    assert(persisted.nonEmpty)
    // the artifact carries NO float column — candidate I/O is 3 bigints/row
    val idx = spark.read.parquet(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_binary")
    assert(idx.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType),
      s"v36 artifact schema not pure bigint: ${idx.schema.simpleString}")
    // and the candidate-stage scans of it read exactly that schema
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val artifactScans = plan.linesIterator.zipWithIndex.toSeq
    val locLines = artifactScans.filter(_._1.contains("graft_idx_binary")).map(_._2)
    assert(locLines.nonEmpty, "no scan of the binary artifact in the plan")
    locLines.foreach { i =>
      val window = artifactScans.slice(i, i + 6).map(_._1).mkString("\n")
      assert(window.contains("ReadSchema: struct<vec_id:bigint,w0:bigint,w1:bigint>"),
        s"artifact scan reads more than the sign words:\n$window")
    }
  }

  test("v38: IVF x binary lists prune to probed partitions and store only sign words") {
    val df = Persist.ivfBinarySearch(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""PartitionFilters: \[[^\]]*cluster_id""".r.findFirstIn(plan).isDefined,
      s"v38 probe not partition-pruned:\n${plan.take(1200)}")
    val lists = spark.read.parquet(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_binary")
    // data columns are pure bigint sign words; cluster_id is the partition dir
    assert(lists.schema.fieldNames.sorted === Array("cluster_id", "vec_id", "w0", "w1"),
      s"v38 artifact schema: ${lists.schema.simpleString}")
    assert(!lists.schema.fields.exists(_.dataType.typeName.contains("array")),
      "v38 artifact carries a vector column")
    // the self-hit (Hamming 0, own cluster always probed) survives to rank 1
    val top1 = df.filter(col("rank") === 1).collect()
    assert(top1.length === 8)
    top1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("score") - 1.0) < 1e-9)
    }
  }

  test("p11: the purge is physical and non-vacuous — no tombstoned id in any rewritten file") {
    import spark.implicits._
    val audit = Persist.purgeProof(spark, sf).collect()
      .map(r => r.getAs[String]("artifact") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_purged_remaining")))).toMap
    assert(audit.keySet === Set("corpus", "lsh_index"))
    audit.foreach { case (a, (n, left)) =>
      assert(left === 0L, s"$a still holds $left purged rows")
      assert(n > 0L, s"$a rewrote to empty")
    }
    // the tombstone set is non-empty and every id is genuinely gone from disk
    val tombs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter(graft.operators.Dedup.h60(concat(lit("del:"), col("vec_id").cast("string"))) % 7 === 0L)
      .as[Long].collect().toSet
    assert(tombs.nonEmpty, "tombstone rule selected nothing — the proof is vacuous")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val corpusIds = spark.read.parquet(wh + "/graft_purged_corpus")
      .select("vec_id").as[Long].collect().toSet
    val idxIds = spark.read.parquet(wh + "/graft_purged_lsh")
      .select("vec_id").as[Long].collect().toSet
    assert((corpusIds intersect tombs).isEmpty && (idxIds intersect tombs).isEmpty,
      "a purged id survives in a rewritten artifact")
    assert(audit("corpus")._1 === corpusIds.size.toLong)
  }

  test("p12: the purge holds for DERIVED artifacts — IVF lists and binary words on disk") {
    import spark.implicits._
    val audit = Persist.purgeProofIndexed(spark, sf).collect()
      .map(r => r.getAs[String]("artifact") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_purged_remaining")))).toMap
    assert(audit.keySet === Set("ivf_lists", "binary_index"))
    audit.foreach { case (a, (n, left)) =>
      assert(left === 0L, s"$a still holds $left purged rows")
      assert(n > 0L, s"$a rewrote to empty")
    }
    val tombs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter(graft.operators.Dedup.h60(concat(lit("del:"), col("vec_id").cast("string"))) % 7 === 0L)
      .as[Long].collect().toSet
    assert(tombs.nonEmpty, "tombstone rule selected nothing — the proof is vacuous")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq("graft_purged_ivf_lists", "graft_purged_binary_words").foreach { t =>
      val ids = spark.read.parquet(s"$wh/$t").select("vec_id").as[Long].collect().toSet
      assert((ids intersect tombs).isEmpty, s"a purged id survives on disk in $t")
      assert(ids.nonEmpty)
    }
    // the centroid model itself derives from post-purge data only
    val lists = spark.read.parquet(s"$wh/graft_purged_ivf_lists")
    val cids = lists.select("cluster_id").distinct().as[Long].collect().toSet
    assert((cids intersect tombs).isEmpty, "a purged id survives as a centroid id")
  }

  test("IVF lists read prunes partitions on cluster probe") {
    // p3 above has written the cluster_id-partitioned lists
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/graft_idx_ivf_lists"
    val probed = spark.read.parquet(path).filter(col("cluster_id").isin(1L, 3L, 5L))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster_id"),
      s"probe does not prune cluster partitions:\n${scan.take(500)}")
    assert(probed.select("cluster_id").distinct().count() === 3)
  }

  test("AQE splits a skewed join (hot LSH bucket shape)") {
    import spark.implicits._
    // one pathologically hot key (like one overloaded LSH bucket) + a long
    // tail; AQE's skew-join should split the hot partition at runtime
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(300000)
        .select(when($"id" % 20 =!= 0, lit("HOT"))
          .otherwise(concat(lit("k"), $"id")).as("key"), $"id".as("lid"))
      // one row per key (dim-style), so output == left row count and the
      // only imbalance is the hot partition itself
      val right = spark.range(15001)
        .select(when($"id" === 0, lit("HOT"))
          .otherwise(concat(lit("k"), $"id" * 20)).as("key"), $"id".as("rid"))
      val joined = left.join(right, "key")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key join as skewed:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("d13: the gated skew query splits its hot bucket under production AQE thresholds") {
    // the hot bucket needs enough BYTES to clear a skew threshold — use the
    // sf0.01 corpus (hot bucket = 100 docs), not the 50-doc test default
    val skewSf = "/root/testdata/sf0.01"
    // baseline result under default conf (what the driver gate sees)
    val baseline = rows(Dedup.skewPairs(spark, skewSf))
    // the SAME query function, with skew thresholds scaled to test-corpus
    // bytes (a production job sets the same knobs in MB): the hinted
    // sort-merge self-join must be runtime-split on the planted hot
    // bucket — and splitting may not change a single output row
    val conf = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the partial agg riding the join's stage makes the split "add a
      // shuffle" in the rule's accounting — production jobs running this
      // report shape set force, exactly as documented on the operator
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128b")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Dedup.skewPairs(spark, skewSf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"),
        s"d13's self-join must sort-merge (broadcast dodges the skew):\n${plan.take(1000)}")
      assert(plan.contains("skew=true"),
        s"hot bucket not runtime-split:\n${plan.take(1200)}")
      assert(rows(df) === baseline, "skew splitting changed the result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("p10: z-order files are rectangles pruning BOTH dimensions; one-column sort prunes one") {
    // sf0.01: 150 users × 720 hours — both dimensions carry real bits
    val dir = "/root/testdata/sf0.01"
    val (users, hx) = ((3L, 9L), (100L, 299L))

    /** per-file (min,max) of both dimensions → fraction of files whose
      * stat range intersects the predicate — exactly what parquet
      * row-group pruning consults. */
    def fracs(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val stats = df
        .groupBy(col("_metadata.file_path").as("f"))
        .agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
          min(col("hx")).as("hlo"), max(col("hx")).as("hhi"))
        .collect()
      assert(stats.length > 4, s"expected many files, got ${stats.length}")
      def overlap(lo: Long, hi: Long, a: Long, b: Long) = lo <= b && hi >= a
      val fu = stats.count(r => overlap(r.getLong(1), r.getLong(2), users._1, users._2))
        .toDouble / stats.length
      val fh = stats.count(r => overlap(r.getLong(3), r.getLong(4), hx._1, hx._2))
        .toDouble / stats.length
      (fu, fh)
    }

    val (z, _) = Persist.zorderedEvents(spark, dir)
    val (zu, zh) = fracs(z)
    // contrast layout: range-sorted by user_id ONLY (same file count)
    val linPath = java.nio.file.Files.createTempDirectory("lin-layout").toString
    z.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(linPath)
    val (lu, lh) = fracs(spark.read.parquet(linPath))

    // z-order: both dimensions prune (each file is a z-curve rectangle)
    assert(zu < 0.8, s"z-order user-pruning fraction $zu — no user locality")
    assert(zh < 0.8, s"z-order hour-pruning fraction $zh — no hour locality")
    // user-sorted: user prunes hard, the hour dimension cannot prune
    assert(lu < 0.5, s"user-sorted layout should prune users, got $lu")
    assert(lh > 0.9, s"user-sorted layout should NOT prune hours, got $lh")
    assert(zh < lh, "z-order must beat the one-column sort on the second dimension")
  }
}
