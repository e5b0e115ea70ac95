package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Knn.flatSearch(Graft.init(spark), "/root/testdata/sf0.001", "cosine")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Vector core
    "v1_knn_cosine_flat" -> ((s, d) => Knn.flatSearch(s, d, "cosine")),
    "v2_knn_l2_flat" -> ((s, d) => Knn.flatSearch(s, d, "l2")),
    "v3_knn_dot_flat" -> ((s, d) => Knn.flatSearch(s, d, "dot")),
    "v4_knn_manhattan_flat" -> ((s, d) => Knn.flatSearch(s, d, "manhattan")),
    "v12_knn_join" -> ((s, d) => Knn.knnJoin(s, d)),
    "v16_filtered_knn" -> ((s, d) => Knn.filteredSearch(s, d)),
    "v16b_filtered_ivf" -> ((s, d) => Persist.filteredIvfSearch(s, d)),
    "v16c_filtered_lsh" -> ((s, d) => Lsh.filteredSearch(s, d)),
    "v17_sq8_search" -> ((s, d) => Knn.sq8Search(s, d)),
    "v18_pq_search" -> ((s, d) => Pq.search(s, d)),
    "v18b_pq_trained_search" -> ((s, d) => Pq.searchTrained(s, d)),
    "v13_search_text" -> ((s, d) => SearchText.searchText(s, d)),
    "v5_vector_norms" -> ((s, d) => Vectors.norms(s, d)),
    "v6_ivf_assign" -> ((s, d) => Ivf.assign(s, d)),
    "v7_ivf_search" -> ((s, d) => Ivf.search(s, d)),
    "v8_ivf_kmeans" -> ((s, d) => Ivf.kmeans(s, d)),
    "v14_ivf_trained_search" -> ((s, d) => Ivf.searchTrained(s, d)),
    "v9_simhash_keys" -> ((s, d) => Lsh.buildKeys(s, d)),
    "v10_lsh_search" -> ((s, d) => Lsh.search(s, d)),
    "v11_sim_join_threshold" -> ((s, d) => Lsh.simJoin(s, d)),
    "v15_search_with_payload" -> ((s, d) => Library.searchWithPayload(s, d)),
    // Multi-library (per-library index scope)
    "l1_library_knn" -> ((s, d) => Library.libraryKnn(s, d)),
    "l2_library_ivf_build" -> ((s, d) => Library.libraryIvfBuild(s, d)),
    "l3_library_dispatch" -> ((s, d) => Library.libraryDispatchSearch(s, d)),
    // Index persistence round-trips (build → write → reload → search)
    "p1_lsh_persist_search" -> ((s, d) => Persist.lshPersistSearch(s, d)),
    "p2_minhash_persist_pairs" -> ((s, d) => Persist.minhashPersistPairs(s, d)),
    "p3_ivf_persist_search" -> ((s, d) => Persist.ivfPersistSearch(s, d)),
    "p4_lsh_incremental" -> ((s, d) => Persist.lshIncrementalSearch(s, d)),
    // Dedup suite
    "d1_dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "d2_dedup_minhash" -> ((s, d) => Dedup.minhash(s, d)),
    "d3_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "d4_dedup_simhash_text" -> ((s, d) => Dedup.simhashText(s, d)),
    "d5_dedup_embedding" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "d6_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "d7_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    // Text analysis
    "t1_lang_id" -> ((s, d) => Text.langId(s, d)),
    "t2_quality_score" -> ((s, d) => Text.quality(s, d)),
    "t3_token_count" -> ((s, d) => Text.tokenCount(s, d)),
    "t4_fingerprint" -> ((s, d) => Text.fingerprint(s, d)),
    "t5_top_ngrams" -> ((s, d) => Text.topNgrams(s, d)),
    "t6_dataset_split" -> ((s, d) => Text.datasetSplit(s, d)),
    "t7_tfidf_top_terms" -> ((s, d) => Text.tfidfTopTerms(s, d)),
    "t8_stratified_sample" -> ((s, d) => Text.stratifiedSample(s, d)),
    "t9_chunk_text" -> ((s, d) => Text.chunkText(s, d)),
    // Events / temporal
    "e1_tumbling_window" -> ((s, d) => Events.tumblingWindow(s, d)),
    "e2_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "e3_topk_per_group" -> ((s, d) => Events.topkPerUser(s, d)),
    "e4_asof_join" -> ((s, d) => Events.asofJoin(s, d)),
    "e5_hopping_window" -> ((s, d) => Events.hoppingWindow(s, d)),
    // CRUD / service semantics
    "c1_upsert_latest_wins" -> ((s, d) => Crud.upsertLatestWins(s, d)),
    "c2_delete_cascade" -> ((s, d) => Crud.deleteCascade(s, d)),
    "c3_point_lookup" -> ((s, d) => Crud.pointLookup(s, d)),
    "c4_library_stats" -> ((s, d) => Crud.libraryStats(s, d)),
    "u1_upsert_then_search" -> ((s, d) => Crud.upsertThenSearch(s, d)),
    "c6_snapshot_asof" -> ((s, d) => Crud.snapshotAsOf(s, d)),
    "c7_list_page" -> ((s, d) => Crud.listPage(s, d)),
    "c8_library_delete_cascade" -> ((s, d) => Crud.libraryDeleteCascade(s, d)),
    // Multimodal (stubbed decode, real plumbing; rows-only check)
    "m1_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "m2_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    // Composite curation pipeline (dedup → quality gate → split → stats)
    "f1_training_pipeline" -> ((s, d) => Pipeline.trainingPipeline(s, d)),
    "f2_near_dedup_corpus" -> ((s, d) => Pipeline.nearDedupCorpus(s, d)),
    // Relational core
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q2_join_broadcast" -> ((s, d) => Relational.q2JoinBroadcast(s, d)),
    "q3_top_revenue" -> ((s, d) => Relational.q3TopRevenue(s, d)),
    "q4_window" -> ((s, d) => Relational.q4Window(s, d)),
    "q5_semi_anti" -> ((s, d) => Relational.q5SemiAnti(s, d)),
    "q6_conditional_agg" -> ((s, d) => Relational.q6ConditionalAgg(s, d)),
    "q7_distinct" -> ((s, d) => Relational.q7Distinct(s, d)),
    "q8_rollup" -> ((s, d) => Relational.q8Rollup(s, d)),
    "q9_percentiles" -> ((s, d) => Relational.q9Percentiles(s, d)),
  )

  /** DuckDB-runnable oracle SQL per query (same output schema + order). */
  def oracleSql: Map[String, String] = Map(
    "v1_knn_cosine_flat" -> Knn.oracleFlat("cosine"),
    "v2_knn_l2_flat" -> Knn.oracleFlat("l2"),
    "v3_knn_dot_flat" -> Knn.oracleFlat("dot"),
    "v4_knn_manhattan_flat" -> Knn.oracleFlat("manhattan"),
    "v12_knn_join" -> Knn.oracleFlat("cosine", k = 5, nQueries = 200, excludeSelf = true),
    "v16_filtered_knn" -> Knn.filteredSearchOracle(),
    "v16b_filtered_ivf" -> Persist.filteredIvfSearchOracle(),
    "v16c_filtered_lsh" -> Lsh.filteredSearchOracle(),
    "v17_sq8_search" -> Knn.sq8SearchOracle(),
    "v18_pq_search" -> Pq.searchOracle(),
    "v13_search_text" -> SearchText.searchTextOracle(),
    "v5_vector_norms" -> Vectors.normsOracle,
    "v6_ivf_assign" -> Ivf.assignOracle,
    "v7_ivf_search" -> Ivf.searchOracle(),
    // v8_ivf_kmeans: iterative training — rows-only check (no oracle)
    "v9_simhash_keys" -> Lsh.buildKeysOracle(),
    "v10_lsh_search" -> Lsh.searchOracle(),
    "v11_sim_join_threshold" -> Lsh.simJoinOracle(),
    "v15_search_with_payload" -> Library.searchWithPayloadOracle(),
    "l1_library_knn" -> Library.libraryKnnOracle(),
    "l2_library_ivf_build" -> Library.libraryIvfBuildOracle(),
    "l3_library_dispatch" -> Library.libraryDispatchSearchOracle(),
    "p1_lsh_persist_search" -> Persist.lshPersistSearchOracle(),
    "p2_minhash_persist_pairs" -> Persist.minhashPersistPairsOracle(),
    "p3_ivf_persist_search" -> Persist.ivfPersistSearchOracle(),
    "p4_lsh_incremental" -> Persist.lshIncrementalSearchOracle(),
    "d1_dedup_exact" -> Dedup.exactOracle,
    "d2_dedup_minhash" -> Dedup.minhashOracle,
    "d3_dedup_minhash_lsh" -> Dedup.minhashLshOracle(),
    "d4_dedup_simhash_text" -> Dedup.simhashTextOracle(),
    "d5_dedup_embedding" -> Dedup.embeddingNearDupOracle(),
    "d6_ngram_jaccard" -> Dedup.ngramJaccardOracle(),
    "d7_dup_clusters" -> Dedup.dupClustersOracle(),
    "t1_lang_id" -> Text.langIdOracle,
    "t2_quality_score" -> Text.qualityOracle,
    "t3_token_count" -> Text.tokenCountOracle,
    "t4_fingerprint" -> Text.fingerprintOracle,
    "t5_top_ngrams" -> Text.topNgramsOracle(),
    "t6_dataset_split" -> Text.datasetSplitOracle,
    "t7_tfidf_top_terms" -> Text.tfidfTopTermsOracle(),
    "t8_stratified_sample" -> Text.stratifiedSampleOracle(),
    "t9_chunk_text" -> Text.chunkTextOracle(),
    "e1_tumbling_window" -> Events.tumblingWindowOracle,
    "e2_sessionize" -> Events.sessionizeOracle,
    "e3_topk_per_group" -> Events.topkPerUserOracle(),
    "e4_asof_join" -> Events.asofJoinOracle,
    "e5_hopping_window" -> Events.hoppingWindowOracle(),
    "c1_upsert_latest_wins" -> Crud.upsertLatestWinsOracle,
    "c2_delete_cascade" -> Crud.deleteCascadeOracle,
    "c3_point_lookup" -> Crud.pointLookupOracle(),
    "c4_library_stats" -> Crud.libraryStatsOracle,
    "u1_upsert_then_search" -> Crud.upsertThenSearchOracle(),
    "c6_snapshot_asof" -> Crud.snapshotAsOfOracle(),
    "c7_list_page" -> Crud.listPageOracle(),
    "c8_library_delete_cascade" -> Crud.libraryDeleteCascadeOracle(),
    // m1_binary_meta: binary mapPartitions pipeline — rows-only check
    "f1_training_pipeline" -> Pipeline.trainingPipelineOracle(),
    "f2_near_dedup_corpus" -> Pipeline.nearDedupCorpusOracle(),
    "q1_agg" -> Relational.q1Oracle,
    "q2_join_broadcast" -> Relational.q2Oracle,
    "q3_top_revenue" -> Relational.q3Oracle,
    "q4_window" -> Relational.q4Oracle,
    "q5_semi_anti" -> Relational.q5Oracle,
    "q6_conditional_agg" -> Relational.q6Oracle,
    "q7_distinct" -> Relational.q7Oracle,
    "q8_rollup" -> Relational.q8Oracle,
    "q9_percentiles" -> Relational.q9Oracle,
  )
}
