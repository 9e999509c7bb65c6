"""Query registry: name → Callable[(SparkSession, sf_dir), DataFrame].

The single source of truth consumed by __spark_entry__.queries().
Every entry here should have a matching oracle in `oracles.ORACLES`
unless genuinely non-SQL-expressible (driver then records a weaker
rows-only check).

ORDERING MATTERS: the round driver samples the FIRST 50 entries for
its external CORRECTNESS check. Round 10's window finishes the
grade-freshness rotation the round-9 verdict prescribed: the three
round-9 late additions that have never been externally graded
(temperature mix, duplicate cap, streaming digest), the one query
whose latest grade predates the type-strict oracle era
(q_profile_values_approx, r4), this round's thirteen NEW queries
(quantile-knob dedup prune, containment dedup, substring-level dedup
match + repair + incremental store variant, repetition trim,
intra-doc span report + trim, KMV source-overlap matrix, JS
source-divergence matrix, Arrow-path NFC normalization, the
streaming anchor-store ingest twin, the corpus dedup dashboard), and
33 of the round-5-graded block. The window holds exactly 50, so the
LAST 17 round-5 entries (sample_stratified through sessionize) could not fit alongside the
new queries — they sit immediately below the fold, FIRST in line for
round 11's window together with the round-7 block. Freshest grades (round 8, then the
round-9-graded §2 core/streaming/digest set) come last. Every entry
passes the identical type-strict DuckDB-oracle comparison in
tests/test_queries_vs_oracle.py regardless of position.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import queries as q

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    # --- (0) new in round 11 (graded window, never externally graded)
    "q_containment_quantile": q.q_containment_quantile,
    "q_dup_attribution": q.q_dup_attribution,
    "q_corpus_card": q.q_corpus_card,
    "q_ann_recall": q.q_ann_recall,
    # --- (1) never externally graded: round-9 late additions
    "q_mix_temperature": q.q_mix_temperature,
    "q_dedup_cap": q.q_dedup_cap,
    "q_stream_tdigest": q.q_stream_tdigest,
    # --- (2) last grade predates the type-strict oracle (r4)
    "q_profile_values_approx": q.q_profile_values_approx,
    # --- (3) new this round
    "q_dedup_ngram_quantile": q.q_dedup_ngram_quantile,
    "q_dedup_containment": q.q_dedup_containment,
    "q_dedup_report": q.q_dedup_report,
    "q_substring_dedup": q.q_substring_dedup,
    "q_substring_repair": q.q_substring_repair,
    "q_incremental_substring": q.q_incremental_substring,
    "q_stream_substring_ingest": q.q_stream_substring_ingest,
    "q_repetition_trim": q.q_repetition_trim,
    "q_intra_repeats": q.q_intra_repeats,
    "q_intra_repeat_trim": q.q_intra_repeat_trim,
    "q_source_overlap_matrix": q.q_source_overlap_matrix,
    "q_source_divergence": q.q_source_divergence,
    "q_nfc_normalize": q.q_nfc_normalize,
    # --- (4) round-5-graded rotation (33 of 50 fit this window)
    "q_dedup_simhash": q.q_dedup_simhash,
    "q_dedup_near_clusters": q.q_dedup_near_clusters,
    "q_stream_store_merge": q.q_stream_store_merge,
    "q_stream_ivf_append": q.q_stream_ivf_append,
    "q_funnel": q.q_funnel,
    "q_store_merge": q.q_store_merge,
    "q_store_compact": q.q_store_compact,
    "q_store_diff": q.q_store_diff,
    "q_store_history": q.q_store_history,
    "q_store_incremental_agg": q.q_store_incremental_agg,
    "q_geo_radius_join": q.q_geo_radius_join,
    "q_pagerank": q.q_pagerank,
    "q_pagerank_dangling": q.q_pagerank_dangling,
    "q_pagerank_weighted": q.q_pagerank_weighted,
    "q_flow_routed": q.q_flow_routed,
    "q_funnel_windowed": q.q_funnel_windowed,
    "q_geo_radius_auto": q.q_geo_radius_auto,
    "q_asof_enrich": q.q_asof_enrich,
    "q_ann_topk": q.q_ann_topk,
    "q_ivf_topk": q.q_ivf_topk,
    "q_ivf_topk_trained": q.q_ivf_topk_trained,
    "q_sim_topk": q.q_sim_topk,
    "q_semantic_dedup": q.q_semantic_dedup,
    "q_cluster_embeddings": q.q_cluster_embeddings,
    "q_lm_score": q.q_lm_score,
    "q_stream_interval_join": q.q_stream_interval_join,
    "q_stream_chunk_documents": q.q_stream_chunk_documents,
    "q_stream_first_seen_stateful": q.q_stream_first_seen_stateful,
    "q_stream_enrich_static": q.q_stream_enrich_static,
    "q_flow_llm_pipeline": q.q_flow_llm_pipeline,
    "q_flow_asof": q.q_flow_asof,
    "q_duplicate_passages": q.q_duplicate_passages,
    "q_hash_split": q.q_hash_split,
    # --- below the driver's first-50 fold ------------------------------
    # round-5-graded remainder — first in line for the round-11 window:
    "q_sample_stratified": q.q_sample_stratified,
    "q_mix_token_budget": q.q_mix_token_budget,
    "q_chunk_documents": q.q_chunk_documents,
    "q_pack_sequences": q.q_pack_sequences,
    "q_decontaminate": q.q_decontaminate,
    "q_decontaminate_bloom": q.q_decontaminate_bloom,
    "q_repetition_ratio": q.q_repetition_ratio,
    "q_weighted_sample": q.q_weighted_sample,
    "q_range_pairs": q.q_range_pairs,
    "q_bin_rollup": q.q_bin_rollup,
    "q_pivot_daily": q.q_pivot_daily,
    "q_retention_cohorts": q.q_retention_cohorts,
    "q_salted_join": q.q_salted_join,
    "q_zorder_scan": q.q_zorder_scan,
    "q_equidepth_histogram": q.q_equidepth_histogram,
    "q_equidepth_approx": q.q_equidepth_approx,
    "q_sessionize": q.q_sessionize,
    # round-7-graded (rotates into round 11 after the seventeen above):
    "q_hll_distinct": q.q_hll_distinct,
    "q_hll_merge": q.q_hll_merge,
    "q_cms_counts": q.q_cms_counts,
    "q_line_dedup": q.q_line_dedup,
    "q_gopher_rules": q.q_gopher_rules,
    "q_stream_hll": q.q_stream_hll,
    "q_stream_hll_windowed": q.q_stream_hll_windowed,
    "q_zscore": q.q_zscore,
    "q_unpivot": q.q_unpivot,
    "q_props_parse": q.q_props_parse,
    "q_shortest_paths": q.q_shortest_paths,
    "q_bucketed_join": q.q_bucketed_join,
    "q_market_share": q.q_market_share,
    "q_returned_items": q.q_returned_items,
    "q_topk_per_group": q.q_topk_per_group,
    "q_approx_distinct_profile": q.q_approx_distinct_profile,
    "q_semantic_decontaminate": q.q_semantic_decontaminate,
    "q_jsonl_roundtrip": q.q_jsonl_roundtrip,
    "q_union_evolve": q.q_union_evolve,
    "q_csv_roundtrip": q.q_csv_roundtrip,
    "q_quality_classifier": q.q_quality_classifier,
    "q_rolling_active_users": q.q_rolling_active_users,
    "q_anomaly_mad": q.q_anomaly_mad,
    "q_pq_topk": q.q_pq_topk,
    "q_stream_classifier": q.q_stream_classifier,
    "q_ivfpq_topk": q.q_ivfpq_topk,
    "q_group_quantiles": q.q_group_quantiles,
    "q_communities": q.q_communities,
    "q_token_count_bpe": q.q_token_count_bpe,
    "q_sessionize_chunked": q.q_sessionize_chunked,
    "q_funnel_restart": q.q_funnel_restart,
    "q_hot_keys": q.q_hot_keys,
    "q_dedup_minhash_capped": q.q_dedup_minhash_capped,
    "q_stream_funnel": q.q_stream_funnel,
    "q_validate_orders": q.q_validate_orders,
    "q_ewma_value": q.q_ewma_value,
    "q_anomaly_values": q.q_anomaly_values,
    "q_event_transitions": q.q_event_transitions,
    "q_stream_anomaly": q.q_stream_anomaly,
    "q_editdist_join": q.q_editdist_join,
    "q_triangle_count": q.q_triangle_count,
    "q_corr_matrix": q.q_corr_matrix,
    "q_embedding_near_dups": q.q_embedding_near_dups,
    "q_multimodal_features": q.q_multimodal_features,
    # round-8-graded:
    "q_rolling_hourly": q.q_rolling_hourly,
    "q_rolling_chunked": q.q_rolling_chunked,
    "q_resample_6h": q.q_resample_6h,
    "q_changepoint_cusum": q.q_changepoint_cusum,
    "q_cusum_chunked": q.q_cusum_chunked,
    "q_quality_buckets": q.q_quality_buckets,
    "q_stream_cusum": q.q_stream_cusum,
    "q_stream_rolling": q.q_stream_rolling,
    "q_semantic_decontaminate_fixed": q.q_semantic_decontaminate_fixed,
    "q_ngram_novelty": q.q_ngram_novelty,
    "q_boilerplate_rate": q.q_boilerplate_rate,
    "q_winsorize": q.q_winsorize,
    "q_order_priority": q.q_order_priority,
    "q_nation_volume": q.q_nation_volume,
    "q_product_profit": q.q_product_profit,
    "q_order_count_dist": q.q_order_count_dist,
    "q_promo_revenue": q.q_promo_revenue,
    "q_top_supplier": q.q_top_supplier,
    "q_small_qty_revenue": q.q_small_qty_revenue,
    "q_disjunctive_join": q.q_disjunctive_join,
    "q_waiting_orders": q.q_waiting_orders,
    "q_inactive_customers": q.q_inactive_customers,
    "q_kmv_distinct": q.q_kmv_distinct,
    "q_kmv_overlap": q.q_kmv_overlap,
    "q_seasonal_profile": q.q_seasonal_profile,
    "q_seasonal_anomaly": q.q_seasonal_anomaly,
    "q_bm25_topk": q.q_bm25_topk,
    "q_linear_trend": q.q_linear_trend,
    "q_hybrid_retrieval": q.q_hybrid_retrieval,
    "q_cube_profile": q.q_cube_profile,
    "q_dpp_join": q.q_dpp_join,
    "q_stream_seasonal_anomaly": q.q_stream_seasonal_anomaly,
    "q_group_split": q.q_group_split,
    "q_embedding_drift": q.q_embedding_drift,
    "q_hard_negatives": q.q_hard_negatives,
    "q_rank_normalize": q.q_rank_normalize,
    "q_chi2_terms": q.q_chi2_terms,
    "q_min_cost_supplier": q.q_min_cost_supplier,
    "q_set_ops": q.q_set_ops,
    "q_weighted_median": q.q_weighted_median,
    "q_last_touch": q.q_last_touch,
    "q_variant_props": q.q_variant_props,
    "q_dedup_ngram_prefix": q.q_dedup_ngram_prefix,
    "q_incremental_near_dedup": q.q_incremental_near_dedup,
    "q_grouping_sets": q.q_grouping_sets,
    "q_sla_bands": q.q_sla_bands,
    "q_time_to_convert": q.q_time_to_convert,
    "q_stream_rank_normalize": q.q_stream_rank_normalize,
    "q_attrs_typed": q.q_attrs_typed,
    "q_attrs_failure_routing": q.q_attrs_failure_routing,
    # round-9-graded (freshest — the §2 core + streaming + digest set):
    "q_attrs_json_body": q.q_attrs_json_body,
    "q_security_marking": q.q_security_marking,
    "q_bin_flagship": q.q_bin_flagship,
    "q_bin_numeric": q.q_bin_numeric,
    "q_bin_geotile": q.q_bin_geotile,
    "q_bin_multiple_mode": q.q_bin_multiple_mode,
    "q_bin_date_granularities": q.q_bin_date_granularities,
    "q_bin_failure_routing": q.q_bin_failure_routing,
    "q_bin_filenames": q.q_bin_filenames,
    "q_partial_update": q.q_partial_update,
    "q_partial_update_nested": q.q_partial_update_nested,
    "q_partial_update_routing": q.q_partial_update_routing,
    "q_partial_update_many": q.q_partial_update_many,
    "q_put_if_absent": q.q_put_if_absent,
    "q_scd2_dimension": q.q_scd2_dimension,
    "q_temporal_dim_join": q.q_temporal_dim_join,
    "q_flow_flagship": q.q_flow_flagship,
    "q_pricing_summary": q.q_pricing_summary,
    "q_shipping_priority": q.q_shipping_priority,
    "q_local_supplier_volume": q.q_local_supplier_volume,
    "q_revenue_forecast": q.q_revenue_forecast,
    "q_large_orders": q.q_large_orders,
    "q_text_stats": q.q_text_stats,
    "q_lang_id": q.q_lang_id,
    "q_quality": q.q_quality,
    "q_token_count": q.q_token_count,
    "q_fingerprint": q.q_fingerprint,
    "q_redact_pii": q.q_redact_pii,
    "q_strip_html": q.q_strip_html,
    "q_top_terms": q.q_top_terms,
    "q_table_profile": q.q_table_profile,
    "q_profile_values": q.q_profile_values,
    "q_vocab_stats": q.q_vocab_stats,
    "q_length_histogram": q.q_length_histogram,
    "q_cross_source_dups": q.q_cross_source_dups,
    "q_dedup_exact": q.q_dedup_exact,
    "q_dedup_canonical": q.q_dedup_canonical,
    "q_dedup_minhash": q.q_dedup_minhash,
    "q_dedup_ngram_jaccard": q.q_dedup_ngram_jaccard,
    "q_store_time_travel": q.q_store_time_travel,
    "q_store_put_if_absent": q.q_store_put_if_absent,
    "q_flow_store_merge": q.q_flow_store_merge,
    "q_stream_bin_flagship": q.q_stream_bin_flagship,
    "q_stream_bin_windowed": q.q_stream_bin_windowed,
    "q_stream_bin_sliding": q.q_stream_bin_sliding,
    "q_stream_first_seen": q.q_stream_first_seen,
    "q_stream_sessions": q.q_stream_sessions,
    "q_tdigest_daily": q.q_tdigest_daily,
    "q_tdigest_merge": q.q_tdigest_merge,
    "q_stream_late_data": q.q_stream_late_data,
}


def register(name: str, fn: QueryFn) -> None:
    QUERIES[name] = fn
