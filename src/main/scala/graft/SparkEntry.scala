package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05RegionalRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary(_, _)),
    "q02_filter_project" -> (Relational.q02FilterProject(_, _)),
    "q03_top_revenue" -> (Relational.q03TopRevenue(_, _)),
    "q04_order_priority" -> (Relational.q04OrderPriority(_, _)),
    "q05_regional_revenue" -> (Relational.q05RegionalRevenue(_, _)),
    "q06_forecast_revenue" -> (Relational.q06ForecastRevenue(_, _)),
    "q07_window_rank" -> (Relational.q07WindowRank(_, _)),
    "q08_distinct_count" -> (Relational.q08DistinctCount(_, _)),
    "q09_set_ops" -> (Relational.q09SetOps(_, _)),
    "q10_rollup" -> (Relational.q10Rollup(_, _)),
    "q11_having" -> (Relational.q11Having(_, _)),
    "q12_conditional_agg" -> (Relational.q12ConditionalAgg(_, _)),
    "q13_outer_join_hist" -> (Relational.q13OuterJoinHist(_, _)),
    "q14_anti_join" -> (Relational.q14AntiJoin(_, _)),
    "q15_top_supplier" -> (Relational.q15TopSupplier(_, _)),
    "q16_sort_limit" -> (Relational.q16SortLimit(_, _)),
    "q17_avg_compare" -> (Relational.q17AvgCompare(_, _)),
    "q18_large_orders" -> (Relational.q18LargeOrders(_, _)),
    "q19_disjunctive" -> (Relational.q19Disjunctive(_, _)),
    "q20_in_subquery" -> (Relational.q20InSubquery(_, _)),
    "q21_string_funcs" -> (Relational.q21StringFuncs(_, _)),
    "q22_regex_extract" -> (Relational.q22RegexExtract(_, _)),
    "q23_events_window" -> (Relational.q23EventsWindow(_, _)),
    "q24_sessionize" -> (Relational.q24Sessionize(_, _)),
    "q25_upsert_latest" -> (Relational.q25UpsertLatest(_, _)),
    "q26_cube" -> (Relational.q26Cube(_, _)),
    "q27_percentile" -> (Relational.q27Percentile(_, _)),
    // C. LLM-training-data pipeline operators
    "t01_token_count" -> (TextOps.t01TokenCount(_, _)),
    "t02_quality_score" -> (TextOps.t02QualityScore(_, _)),
    "t03_lang_id" -> (TextOps.t03LangId(_, _)),
    "d01_dedup_exact" -> (Dedup.d01DedupExact(_, _)),
    "d02_dedup_minhash" -> ((s, dir) => Dedup.d02DedupMinhashDemo(s, dir)),
    "d03_dedup_simhash" -> ((s, dir) => Dedup.d03DedupSimhashDemo(s, dir)),
    "d04_ngram_jaccard" -> ((s, dir) => Dedup.d04NgramJaccard(s, dir)),
    "d05_embed_neardup" -> ((s, dir) => Dedup.d05EmbedNeardup(s, dir)),
    "d06_embed_neardup_lsh" -> ((s, dir) => Dedup.d06EmbedNeardupDemo(s, dir)),
    "d07_dedup_clusters" -> ((s, dir) => Dedup.d07DedupClusters(s, dir)),
    "d08_substring_dedup" -> ((s, dir) => Dedup.d08SubstringDedup(s, dir)),
    "d10_semantic_dedup" -> ((s, dir) => Dedup.d10SemanticDedupDemo(s, dir)),
    "d11_incr_dedup" -> ((s, dir) => Dedup.d11IncrementalDedupDemo(s, dir)),
    "d13_indexed_admit" -> ((s, dir) => Dedup.d13IndexedAdmitDemo(s, dir)),
    "d09_substring_apply" -> ((s, dir) => Dedup.d09SubstringApply(s, dir)),
    "s01_ann_bruteforce" -> ((s, dir) => Ann.s01AnnBruteforce(s, dir)),
    "s02_ann_lsh" -> ((s, dir) => Ann.s02AnnLsh(s, dir)),
    "s03_knn_join" -> ((s, dir) => Ann.s03KnnJoin(s, dir)),
    "s04_ann_ivf" -> ((s, dir) => Ann.s04AnnIvf(s, dir)),
    "s05_knn_join_lsh" -> ((s, dir) => Ann.s05KnnJoinLsh(s, dir)),
    "s06_knn_join_ivf" -> ((s, dir) => Ann.s06KnnJoinIvf(s, dir)),
    "s07_ann_lsh_indexed" -> ((s, dir) => Ann.s07AnnLshIndexedDemo(s, dir)),
    "s08_ann_ivf_indexed" -> ((s, dir) => Ann.s08AnnIvfIndexedDemo(s, dir)),
    "s09_ann_quantized" -> ((s, dir) => Ann.s09AnnQuantized(s, dir)),
    "s10_ann_pq" -> ((s, dir) => Ann.s10AnnPq(s, dir)),
    "s11_ann_ivf_pq" -> ((s, dir) => Ann.s11AnnIvfPq(s, dir)),
    "s12_ann_filtered" -> ((s, dir) => Ann.s12AnnFiltered(s, dir)),
    "s13_ann_filtered_ivf" -> ((s, dir) => Ann.s13AnnFilteredIvf(s, dir)),
    "t04_fingerprint" -> (TextOps.t04Fingerprint(_, _)),
    "c01_clean_corpus" -> ((s, dir) => Corpus.c01CleanCorpus(s, dir)),
    "c02_mixture_plan" -> ((s, dir) => Corpus.c02MixturePlan(s, dir)),
    "c03_contamination" -> ((s, dir) => Corpus.c03Contamination(s, dir)),
    "c04_redact_pii" -> ((s, dir) => Corpus.c04RedactPii(s, dir)),
    "c05_mixture_build" -> ((s, dir) => Corpus.c05MixtureBuild(s, dir)),
    "t05_vocab_topk" -> ((s, dir) => TextOps.t05VocabTopK(s, dir)),
    "m01_multimodal" -> (Multimodal.m01Multimodal(_, _)),
    "m02_frame_sample" -> ((s, dir) => Multimodal.m02FrameSample(s, dir)),
    "m03_audio_windows" -> ((s, dir) => Multimodal.m03AudioWindows(s, dir)),
    "m04_phash_dedup" -> ((s, dir) => Multimodal.m04PhashDedup(s, dir)),
    "m11_type_sniff" -> ((s, dir) => Multimodal.m11TypeSniff(s, dir)),
    "m12_png_scrub" -> ((s, dir) => Multimodal.m12PngScrub(s, dir)),
    "m15_jpeg_scrub" -> ((s, dir) => Multimodal.m15JpegScrub(s, dir)),
    "m16_dct_dedup" -> ((s, dir) => Multimodal.m16DctDedup(s, dir)),
    "m13_image_pool" -> ((s, dir) => Multimodal.m13ImagePool(s, dir)),
    "m14_audio_decimate" -> ((s, dir) => Multimodal.m14AudioDecimate(s, dir)),
    "q28_approx_distinct" -> (Approx.q28ApproxDistinct(_, _)),
    "q29_asof_join" -> (AsofJoin.q29AsofJoin(_, _)),
    "q30_range_join" -> (RangeJoin.q30RangeJoin(_, _)),
    "q31_window_funcs" -> (Relational.q31WindowFuncs(_, _)),
    "q32_grouping_sets" -> (Relational.q32GroupingSets(_, _)),
    "q33_multi_exists" -> (Relational.q33MultiExists(_, _)),
    "q34_json_extract" -> (Relational.q34JsonExtract(_, _)),
    "q35_pivot" -> (Relational.q35Pivot(_, _)),
    "q36_unpivot" -> (Relational.q36Unpivot(_, _)),
    "q37_rolling_window" -> (Relational.q37RollingWindow(_, _)),
    "q38_incr_agg" -> (Relational.q38IncrAgg(_, _)),
    "q39_volume_shipping" -> (Relational.q39VolumeShipping(_, _)),
    "q40_market_share" -> (Relational.q40MarketShare(_, _)),
    "q41_funnel" -> (Relational.q41Funnel(_, _)),
    "q42_retention" -> (Relational.q42Retention(_, _)),
    "q43_purchase_cadence" -> (Relational.q43PurchaseCadence(_, _)),
    "q44_no_order_rich" -> (Relational.q44NoOrderRich(_, _)),
    "q45_gap_fill" -> (Relational.q45GapFill(_, _)),
    "q46_forward_fill" -> (Relational.q46ForwardFill(_, _)),
    "q47_session_paths" -> (Relational.q47SessionPaths(_, _)),
    "q48_markov_transitions" -> (Relational.q48MarkovTransitions(_, _)),
    "q49_promo_share" -> (Relational.q49PromoShare(_, _)),
    "q50_revenue_concentration" -> (Relational.q50RevenueConcentration(_, _)),
    "q51_product_profit" -> (Relational.q51ProductProfit(_, _)),
    "q52_returned_items" -> (Relational.q52ReturnedItems(_, _)),
    "t06_normalize" -> (TextOps.t06Normalize(_, _)),
    "t07_repetition" -> (TextOps.t07Repetition(_, _)),
    "t08_subword_tokenize" -> (TextOps.t08SubwordTokenize(_, _)),
    "t09_subword_ids" -> (TextOps.t09SubwordIds(_, _)),
    "t10_heavy_hitters" -> ((s, dir) => TextOps.t10HeavyHitters(s, dir)),
    "t11_bpe_train" -> ((s, dir) => TextOps.t11BpeTrain(s, dir)),
    "c06_mixture_subword" -> ((s, dir) => Corpus.c06MixtureSubword(s, dir)),
    "c09_pack_offsets" -> ((s, dir) => Corpus.c09PackOffsets(s, dir)),
    "c10_mixture_epochs" -> ((s, dir) => Corpus.c10MixtureEpochs(s, dir)),
    "c11_corpus_report" -> ((s, dir) => Corpus.c11CorpusReport(s, dir)),
    "c12_pack_sequences" -> ((s, dir) => Corpus.c12PackSequences(s, dir)),
    "c13_leakproof_split" -> ((s, dir) => Corpus.c13LeakproofSplit(s, dir)),
    "t12_bigram_novelty" -> ((s, dir) => TextOps.t12BigramNovelty(s, dir)),
    "t13_source_overlap" -> ((s, dir) => TextOps.t13SourceOverlap(s, dir)),
    "t14_tfidf_keywords" -> ((s, dir) => TextOps.t14TfidfKeywords(s, dir)),
    "d12_keep_best_dedup" -> ((s, dir) => Dedup.d12KeepBestDedup(s, dir)),
    "t16_chunk_split" -> ((s, dir) => TextOps.t16ChunkSplit(s, dir)),
    "t17_html_strip" -> ((s, dir) => TextOps.t17HtmlStrip(s, dir)),
    "t18_unicode_scrub" -> ((s, dir) => TextOps.t18UnicodeScrub(s, dir)),
    "t19_token_entropy" -> ((s, dir) => TextOps.t19TokenEntropy(s, dir)),
    "t20_sentence_split" -> ((s, dir) => TextOps.t20SentenceSplit(s, dir)),
    "d14_fuzzy_join" -> ((s, dir) => FuzzyJoin.d14FuzzyJoin(s, dir)),
    "d15_url_dedup" -> ((s, dir) => Dedup.d15UrlDedup(s, dir)),
    "d16_line_dedup" -> ((s, dir) => Dedup.d16LineDedup(s, dir)),
    "d17_sentence_dedup" -> ((s, dir) => Dedup.d17SentenceDedup(s, dir)),
    "q53_revenue_deciles" -> (Relational.q53RevenueDeciles(_, _)),
    "q54_scd2" -> (Relational.q54Scd2(_, _)),
    "m06_dhash_dedup" -> ((s, dir) => Multimodal.m06DhashDedup(s, dir)),
    "m07_scene_detect" -> ((s, dir) => Multimodal.m07SceneDetect(s, dir)),
    "m08_audio_dedup" -> ((s, dir) => Multimodal.m08AudioDedup(s, dir)),
    "m09_video_dedup" -> ((s, dir) => Multimodal.m09VideoDedup(s, dir)),
    "m10_keyframe_sample" -> ((s, dir) => Multimodal.m10KeyframeSample(s, dir)),
    "c07_decontaminate" -> ((s, dir) => Corpus.c07Decontaminate(s, dir)),
    "c14_importance_weights" -> ((s, dir) => Corpus.c14ImportanceWeights(s, dir)),
    "t15_lm_score" -> ((s, dir) => TextOps.t15LmScore(s, dir)),
    "c15_curriculum_phases" -> ((s, dir) => Corpus.c15CurriculumPhases(s, dir)),
    "c08_mixture_temperature" -> ((s, dir) => Corpus.c08TemperatureMixture(s, dir)),
    "c16_quality_classifier" -> ((s, dir) => Corpus.c16QualityClassifier(s, dir)),
    "s14_kmeans_distributed" -> ((s, dir) => Ann.s14KmeansDistributed(s, dir)),
    "s15_mmr_rerank" -> ((s, dir) => Ann.s15MmrRerank(s, dir)),
    "s16_hybrid_search" -> ((s, dir) => HybridSearch.s16HybridSearch(s, dir)),
    "c18_balanced_sample" -> ((s, dir) => Corpus.c18BalancedSample(s, dir)),
    "c17_semantic_decontam" -> ((s, dir) => Corpus.c17SemanticDecontam(s, dir)),
    "c19_drift_report" -> ((s, dir) => Corpus.c19DriftReport(s, dir)),
    "c20_gopher_rules" -> ((s, dir) => Corpus.c20GopherRules(s, dir)),
    "c21_canary_scan" -> ((s, dir) => Corpus.c21CanaryScan(s, dir)),
    "c22_domain_mixture" -> ((s, dir) => Corpus.c22DomainMixture(s, dir)),
    "c23_shard_export" -> ((s, dir) => Corpus.c23ShardExport(s, dir)),
    "c24_boundary_masks" -> ((s, dir) => Corpus.c24BoundaryMasks(s, dir)),
    "t21_viterbi_tokenize" -> ((s, dir) => TextOps.t21ViterbiTokenize(s, dir)),
    "t23_unigram_train" -> ((s, dir) => TextOps.t23UnigramTrain(s, dir)),
    "t24_main_content" -> ((s, dir) => TextOps.t24MainContent(s, dir)),
    "t03b_script_id" -> ((s, dir) => TextOps.t03bScriptId(s, dir)),
    "q55_tree_flatten" -> (Relational.q55TreeFlatten(_, _)),
    "g01_pagerank" -> ((s, dir) => Graph.g01PageRank(s, dir)),
    "g02_hits" -> ((s, dir) => Graph.g02Hits(s, dir)),
    "g03_link_extract" -> ((s, dir) => Graph.g03LinkExtract(s, dir)),
    "g04_host_communities" -> ((s, dir) => Graph.g04HostCommunities(s, dir)),
    "g05_robots_gate" -> ((s, dir) => Graph.g05RobotsGate(s, dir)),
    "g06_robots_txt" -> ((s, dir) => Graph.g06RobotsTxt(s, dir)),
    "g07_frontier_plan" -> ((s, dir) => Graph.g07FrontierPlan(s, dir)),
    "g08_sitemap_extract" -> ((s, dir) => Graph.g08SitemapExtract(s, dir)),
    "g09_discovered_plan" -> ((s, dir) => Graph.g09DiscoveredPlan(s, dir)),
    "g10_recrawl_plan" -> ((s, dir) => Graph.g10RecrawlPlan(s, dir)),
    "g11_trap_detect" -> ((s, dir) => Graph.g11TrapDetect(s, dir)),
    // g12: the persisted host-rank index probed through each consumer
    // (build-then-probe demos; row-identical to the inline twins)
    "g12_frontier_probe" -> ((s, dir) => Graph.g12FrontierProbeDemo(s, dir)),
    "g12_discovered_probe" ->
      ((s, dir) => Graph.g12DiscoveredProbeDemo(s, dir)),
    "g12_recrawl_probe" -> ((s, dir) => Graph.g12RecrawlProbeDemo(s, dir)),
    "g13_sitemap_discovery" ->
      ((s, dir) => Graph.g13SitemapDiscovery(s, dir)),
    "g14_crawl_delay" -> ((s, dir) => Graph.g14CrawlDelay(s, dir)),
    "c26_bloom_decontam" -> ((s, dir) => Corpus.c26BloomDecontam(s, dir)),
    "c27_dup_weights" -> ((s, dir) => Corpus.c27DupWeights(s, dir)),
    "t22_cms_topk" -> ((s, dir) => TextOps.t22CmsTopk(s, dir)),
    "s17_margin_mining" -> ((s, dir) => Ann.s17MarginMining(s, dir)),
    "c25_sft_pack" -> ((s, dir) => Corpus.c25SftPack(s, dir)),
    // nprobe=0 probes ALL cells: brute-equal by the equality law, so the
    // flat c17 oracle checks the whole indexed path end-to-end
    "c17_semantic_decontam_ivf" -> ((s, dir) => Corpus.c17SemanticDecontamIvf(s, dir)),
    // A. file-pipeline surface (manifest of the sf directory tree)
    "f01_manifest" -> ((s, dir) =>
      graft.sources.FilePipeline.catalog(s, dir).toDF()
        .select("path", "name", "rel_path", "ext", "size")
        .orderBy("path")),
    // f03/f05: the sync planner and audit rollup over manifests/audits
    // synthesized deterministically from the documents table — plain
    // relational surfaces, fully oracle-checkable in DuckDB
    "f03_sync_plan" -> ((s, dir) =>
      graft.sources.FilePipeline.f03SyncPlanDemo(s, dir)),
    "f05_audit_rollup" -> ((s, dir) =>
      graft.sources.FilePipeline.f05AuditDemo(s, dir)),
    // f10: JSONL intake with corrupt-line quarantine over real files
    "f11_csv_ingest" -> ((s, dir) =>
      sources.CsvSource.f11CsvIngest(s, dir)),
    "f12_tar_intake" -> ((s, dir) =>
      sources.TarSource.f12TarIntake(s, dir)),
    "f13_warc_intake" -> ((s, dir) =>
      sources.WarcSource.f13WarcIntake(s, dir)),
    // f16: the WARC write half — manifest + full export→intake
    // round-trip (the oracle hash proves byte preservation)
    "f16_warc_export" -> ((s, dir) =>
      sources.WarcSource.f16WarcExportDemo(s, dir)),
    "f16_warc_roundtrip" -> ((s, dir) =>
      sources.WarcSource.f16WarcRoundtrip(s, dir)),
    "c28_ccnet_buckets" -> ((s, dir) => Corpus.c28CcnetBuckets(s, dir)),
    "f10_jsonl_ingest" -> ((s, dir) =>
      graft.sources.JsonlSource.f10JsonlIngest(s, dir)),
    // f07: paged-REST enumeration over the deterministic synthetic
    // endpoint (the sf dir has no HTTP surface; the fixture exercises
    // the same pagination/BFS path the HTTP fetcher uses)
    "f07_paged_manifest" -> ((s, _) =>
      graft.sources.PagedSource.pagedCatalog(s,
        graft.sources.PagedSource.SyntheticFetcher(
          dirs = 8, filesPerDir = 25, pageSize = 7)).toDF()
        .orderBy("path"))
  )

  /** DuckDB-equivalent SQL for the driver's correctness gate. */
  def oracleSql: Map[String, String] = Oracles.sql
}
