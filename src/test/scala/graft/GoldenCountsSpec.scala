package graft

/** Golden row-count pins for every declared query at sf0.001.
  *
  * Counts were captured from a CORRECTNESS-green build (round 2, all
  * oracle-backed queries hash-matching DuckDB), so each pin is a cheap
  * behavioral fingerprint: any refactor that changes a query's
  * grouping keys, filters, join type, or dedup threshold moves its
  * row count and fails here immediately — long before the driver's
  * sf0.01 differential run.
  *
  * The pins are EXACT row counts, not bounds: sf0.001 inputs are
  * fixed files and every query is deterministic by the §2.7
  * discipline (total-order sort, no sampling). If testdata is ever
  * regenerated these must be re-captured — that is the one legitimate
  * reason to edit this file.
  */
class GoldenCountsSpec extends SparkTestBase {

  private val golden: Map[String, Long] = Map(
    "sli_filter_project" -> 57L,
    "sli_minute_downsample" -> 1000L,
    "sli_weighted_avg" -> 5L,
    "slo_day_report" -> 150L,
    "slo_breach_count" -> 5L,
    "slo_compliance_pct" -> 5L,
    "sli_latest_per_user" -> 15L,
    "sli_rolling_7d" -> 150L,
    "sli_sessionize" -> 15L,
    "slo_hourly_tumble" -> 868L,
    "error_budget_burn" -> 5L,
    "rev_by_region" -> 5L,
    "top10_customers" -> 10L,
    "semi_join_urgent" -> 5L,
    "anti_join_no_p_orders" -> 4L,
    "outer_join_linecount" -> 13L,
    "range_join_shipwindow" -> 5L,
    "asof_prior_view" -> 15L,
    "rollup_region_nation" -> 31L,
    "cube_flag_status" -> 12L,
    "set_ops_customers" -> 3L,
    "distinct_exact" -> 5L,
    "supplier_nation_rev" -> 10L,
    "rank_parts" -> 75L,
    "string_funcs" -> 25L,
    "date_funcs" -> 80L,
    "math_funcs" -> 3L,
    "json_extract_agg" -> 10L,
    "percentile_value" -> 5L,
    "props_map_agg" -> 5L,
    "grouping_sets_mix" -> 36L,
    "window_lag_delta" -> 5L,
    "moving_avg_rows" -> 5L,
    "topk_words" -> 20L,
    "dedup_docs" -> 5L,
    "near_dup_pairs" -> 5L,
    "cosine_topk" -> 10L,
    "text_stats" -> 5L,
    "ngram_jaccard" -> 5L,
    "emb_near_dup" -> 1L,
    "knn_join_exact" -> 600L,
    "media_bytes_stats" -> 5L,
    "lang_id" -> 10L,
    "quality_score" -> 5L,
    "token_count" -> 5L,
    "doc_fingerprint" -> 5L,
    "hash_split" -> 15L,
    "regex_token_profile" -> 5L,
    "curate_corpus" -> 15L,
    "distinct_hll" -> 5L,
    "near_dup_minhash" -> 5L,
    "simhash_dups" -> 5L,
    "source_overlap" -> 5L,
    "percentile_approx_value" -> 5L,
    "ann_cosine_topk" -> 10L,
    "sketch_rollup" -> 5L,
    "srp_near_dup" -> 1L,
    "salted_join" -> 10L,
    // r6 hot-key salted twin: same nation rollup grain
    "salted_hot_join" -> 10L,
    "ann_knn_join" -> 150L,
    "curate_corpus_neardup" -> 15L,
    "slo_report_maintained" -> 150L,
    "interval_join_views" -> 2L,
    "burn_rate_alerts" -> 5L,
    "heavy_hitters" -> 30L,
    "pivot_day_type" -> 30L,
    "unpivot_type_stats" -> 5L,
    "stratified_sample" -> 5L,
    "quantile_sketch_rollup" -> 5L,
    "gap_fill_minutes" -> 5L,
    "weekly_retention" -> 5L,
    "ntile_quartiles" -> 20L,
    "tfidf_top_terms" -> 5L,
    "seq_pack_buckets" -> 4L,
    "repetition_stats" -> 5L,
    "contamination_check" -> 5L,
    "pii_scrub" -> 5L,
    "segment_dedup" -> 20L,
    "dedup_clusters" -> 7L,
    "cluster_keep_best" -> 7L,
    "semantic_dedup" -> 51L,
    "corpus_mix_sample" -> 20L,
    "bloom_prefilter_dedup" -> 5L,
    "zscore_anomaly" -> 115L,
    "above_brand_avg" -> 25L,
    "range_frame_daily" -> 150L,
    "pq_topk" -> 10L,
    "ivfpq_topk" -> 10L,
    "budget_carryover" -> 150L,
    // r6 clamp-scan swap: identical grain to the recursive form
    "budget_carryover_scan" -> 150L,
    "props_variant_stats" -> 5L,
    "sql_udf_slo" -> 5L,
    "array_funcs" -> 5L,
    "try_funcs" -> 5L,
    "phash_dups" -> 1L,
    "dist_moments" -> 5L,
    "listagg_sources" -> 5L,
    "lateral_topn" -> 50L,
    "filtered_aggs" -> 5L,
    "unigram_logprob" -> 20L,
    "token_kl_sources" -> 20L,
    "length_trim_outliers" -> 20L,
    "ewma_smooth" -> 150L,
    "rolling_p95" -> 150L,
    "hist_buckets" -> 92L,
    "regr_value_trend" -> 5L,
    "minmax_by_day" -> 5L,
    "mad_robust" -> 5L,
    "bitbool_aggs" -> 5L,
    "zipf_slope" -> 20L,
    "quantile_norm_chars" -> 200L,
    "rolling_active_users" -> 30L,
    "breach_streaks" -> 44L,
    "copurchase_pairs" -> 20L,
    "funnel_steps" -> 1L,
    "pareto_share" -> 1L,
    // r6 PrefixOps swap demonstration: same single-row report
    "pareto_share_prefix" -> 1L,
    "time_to_convert" -> 1L,
    "peak_concurrency" -> 30L,
    "ship_latency" -> 5L,
    "copurchase_pagerank" -> 20L,
    "cohort_retention" -> 7L,
    "new_vs_returning" -> 30L,
    "seasonal_dow_index" -> 35L,
    "repeat_cadence" -> 1L,
    "event_transitions" -> 25L,
    "session_paths" -> 10L,
    "ab_test_conversion" -> 1L,
    "entropy_ttr" -> 20L,
    "fuzzy_name_pairs" -> 140L,
    "rfm_segments" -> 38L,
    "interarrival_stats" -> 5L,
    "dq_profile" -> 6L,
    // r5 sketch-swap variants: same grains as their exact twins
    "dq_profile_hll" -> 6L,
    "rolling_active_users_sketch" -> 30L,
    "mad_robust_gk" -> 5L,
    // r5 filtered ANN: top-10 within the label=7 slice
    "ann_filtered_topk" -> 10L,
    // r5 lexical retrieval: top-15 BM25
    "bm25_search" -> 15L,
    // r5 hybrid retrieval: top-15 fused (RRF) ranking
    "hybrid_rrf" -> 15L,
    // r5 duplicate-text fraction: one row per source
    "dup_ngram_coverage" -> 20L,
    // r5 directed containment: one row per lang
    "containment_pairs" -> 5L,
    // r6 LSH-Ensemble twin: per-lang report, all 5 langs have pairs
    "containment_lsh" -> 5L,
    // r5 χ² discriminative terms: top-5 per lang
    "chi2_terms" -> 25L,
    // r5 PMI collocations: global top-10
    "bigram_pmi" -> 10L,
    // r5 association rules: global top-10 by lift
    "lift_rules" -> 10L,
    // r5 LSH closure: per-lang summary (all 5 langs have clusters)
    "lsh_dedup_clusters" -> 5L,
    // r5 clustering: k=8, no cluster empties out in 3 rounds
    "kmeans_assign" -> 8L,
    // r5 triangle census: single-row graph report
    "triangle_parts" -> 1L,
    // r5 CUSUM: one row per event type
    "cusum_changepoint" -> 5L,
    // r5 DSIR: one row per source
    "dsir_weights" -> 20L,
    // r5 percent_rank premium tail: the sf0.001 fixture has 4–12
    // parts per brand, and at each of those sizes exactly the
    // top-ranked part clears pct_rank ≥ 0.95 — one qualifying part
    // per brand × 25 brands (verified against DuckDB)
    "price_position" -> 25L,
    // r5 Q21 shape: top-10 blamed suppliers
    "blame_supplier" -> 10L,
    // r5 degree distribution: log2 buckets 2..5 populated at this sf
    "degree_dist" -> 4L,
    // r5 Tukey fences: one row per event type
    "iqr_outliers" -> 5L,
    // r5 Q22 shape: 5 nations have dormant rich customers at this sf
    "idle_rich_customers" -> 5L,
    // r5 novelty decay: 10 ingestion buckets (500 docs / 50)
    "shingle_novelty" -> 10L,
    // r5 source redundancy: global top-10 pairs
    "source_cosine_pairs" -> 10L,
    // r5 Gini: one row per market segment
    "revenue_gini_by_segment" -> 5L,
    // r5 assortativity: single-row graph report
    "degree_assortativity" -> 1L,
    // r5 char entropy: one row per lang
    "char_entropy" -> 5L,
    // r6 Q10 shape: top-20 cut (1996 'R'-flag customers exceed 20)
    "returned_revenue" -> 20L,
    // r6 Q17 shape: one row per brand (all 25 brands have trickle
    // lines at sf0.001)
    "small_qty_revenue" -> 25L,
    // r6 Q18 shape: 5 orders exceed 300 total qty at sf0.001 (< the
    // 20-row cut; the count grows with the corpus into the cut)
    "bulk_orders" -> 5L,
    // r6 Q15 shape: a single supplier holds the 3-month max
    "top_supplier_window" -> 1L,
    // r6 Q14 shape: 12 ship months in 1996
    "promo_share_monthly" -> 12L,
    // r6 Q8 shape: 7 order years (1995–2001)
    "nation_market_share" -> 7L,
    // r6 PSI drift: one row per event type
    "psi_drift" -> 5L,
    // r6 survival curve: 5 langs × 6 thresholds
    "length_survival" -> 30L,
    // r6 Q2 shape: 39 (part, cheapest-supplier) rows over the 33
    // PROMO parts with sales at sf0.001 (r2-grid min ties keep >1
    // supplier for some parts)
    "cheapest_supplier" -> 39L,
    // r6 Q7 shape: NATION_3↔NATION_12 trade in 13 of the 14
    // (direction, year) cells at sf0.001
    "nation_trade_volume" -> 13L,
    // r6 Q11 shape: 2 parts clear 1.5× the average part revenue at
    // sf0.001 (the synthetic revenue distribution is near-uniform)
    "major_parts" -> 2L,
    // r6 Q16 shape: 6 types × 6 size bands, one (type, band) cell
    // empty at sf0.001
    "supplier_variety" -> 35L,
    // r6 Q20 shape: all 10 sf0.001 suppliers dominate ≥1 part's 1996
    // quantity (10 suppliers over 200 parts ⇒ majority holders are
    // common; the share thins as supplier count scales)
    "dominant_suppliers" -> 10L,
    // r6 split leakage: one row per lang on the bounded slice
    "split_leakage" -> 5L,
    // r6 ES weighted sample: 10 winners per lang
    "weighted_sample" -> 50L,
    // r6 k-core: single-row report
    "kcore_parts" -> 1L,
    // r6 Holt scan: same (type, day) grain as locf/interp
    "holt_smooth" -> 150L,
    // r6 link prediction: top-10 cut
    "common_neighbor_recs" -> 10L,
    // r7 MMR diverse selection: k=10 picks
    "mmr_diverse_topk" -> 10L,
    // r7 hub-cap variant: still a global top-10
    "common_neighbor_recs_capped" -> 10L,
    // r6 BFS: the dense sf0.001 support graph has eccentricity 2
    // from the hub and is connected (hops 0,1,2 — no -1 row)
    "hub_distance" -> 3L,
    // r6 skyline: 5 Pareto-optimal parts in the 200-part catalog
    "skyline_parts" -> 5L,
    // r7 two-phase twin: same skyline, by construction
    "skyline_parts_2p" -> 5L,
    // r6 Benford: all 9 leading digits occur among the 1.5k orders
    "benford_digits" -> 9L,
    // r6 bigram LM: one row per source
    "bigram_logprob" -> 20L,
    // r7 open-vocab lane: same per-source grain
    "bigram_logprob_pruned" -> 20L,
    // r6 Holt residual anomalies: one row per type
    "holt_anomaly" -> 5L,
    // r6 drawdown: one row per type
    "value_drawdown" -> 5L,
    // r6 KM survival: one row per horizon
    "survival_conversion" -> 6L,
    // r6 Mann-Whitney: single test-report row
    "mwu_value_test" -> 1L,
    // r6 entity resolution: 8 multi-name entities at sf0.001
    "name_entity_clusters" -> 8L,
    // r6 isotonic fit: one row per discount grid value
    "isotonic_return_rate" -> 11L,
    // r6 Theil-Sen: one row per type
    "theilsen_trend" -> 5L,
    // r7 sampled-pairs variant: one row per event type
    "theilsen_trend_sampled" -> 5L,
    // r6 Kolmogorov-Smirnov: single test-report row
    "ks_value_test" -> 1L,
    // r7 k-group omnibus tests + rank correlation: single report rows
    "anova_value_test" -> 1L,
    "kruskal_value_test" -> 1L,
    "spearman_value_hour" -> 1L,
    // r7 periodogram: one row per daily harmonic k=1..6
    "dft_periodogram" -> 6L,
    // r7 dedup report: sf0.001 docs are all unique -> one size-1 row
    // (sf0.1 grows a size-2 row — the honest distribution)
    "dup_cluster_sizes" -> 1L,
    // r7 embedding-eval family: one row per label / single report row
    "emb_quantize_error" -> 10L,
    "matryoshka_recall" -> 1L,
    "knn_label_eval" -> 10L,
    // r7 tokenizer-training profile: top-20 char pairs
    "bpe_merge_candidates" -> 20L,
    // r7 local-closure profile: one row per width-5 degree bucket
    "clustering_coeff" -> 10L,
    // r7 uncertainty quantification: one interval / CI row per type
    "conformal_interval" -> 5L,
    "bootstrap_ci_mean" -> 5L,
    // r7 tail index: single estimator row
    "hill_tail_index" -> 1L,
    // r7 SCD2 report: one row per populated value band
    "scd2_versions" -> 13L,
    // r7 incremental ingest report: one row per lang
    "incremental_dedup" -> 5L,
    // r7 drift attribution: top-20 token movers
    "token_drift_movers" -> 20L,
    // r7 robust-location family: one report row per type
    "median_ci_binomial" -> 5L,
    "trimmed_mean" -> 5L,
    // r7 ranking metric: one row per query-label class
    "ndcg_label_eval" -> 10L,
    "burn_forecast" -> 5L,
    "flap_rate" -> 5L,
    "seasonal_decompose" -> 5L,
    "locf_impute" -> 150L,
    // r5 linear interpolation: same (type, day) grain as locf
    "interp_impute" -> 150L,
    "purchase_attribution" -> 5L,
    "quantile_disc_mode" -> 5L,
    "curation_funnel" -> 4L,
    "emb_stats" -> 1L,
    "weighted_median_price" -> 3L,
    "daily_percentile_bands" -> 5L,
    "type_corr_matrix" -> 10L,
    "value_autocorr" -> 5L,
    "label_separation" -> 10L,
    "vocab_growth" -> 10L,
    "skew_profile" -> 4L,
    "revenue_discount_band" -> 11L,
    "orders_backlog" -> 1638L,
    "supplier_hhi" -> 6L,
    "max_gap_minutes" -> 5L,
  )

  test("golden map covers exactly the declared query set") {
    assert(golden.keySet == SparkEntry.queries.keySet,
      s"drift: missing pins ${SparkEntry.queries.keySet -- golden.keySet}, " +
        s"stale pins ${golden.keySet -- SparkEntry.queries.keySet}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"golden row count: $name") {
      val n = fn(spark, sf).count()
      assert(golden.get(name).contains(n),
        s"$name returned $n rows, golden pin is ${golden.get(name)}")
    }
  }
}
