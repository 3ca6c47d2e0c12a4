"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC merge at sf0.001; ``queries`` /
``oracle_sql`` expose every operator from SURVEY.md §2 for the DuckDB
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import (
    corpus_stats,
    dedup,
    text,
)
from aws_big_data_blog_dmscdc_walkthrough_spark.plans import (
    analytics,
    cdc_queries,
    corpus_ml,
    llm_queries,
    tpch_ext,
    tpch_rest,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the CDC latest-wins merge on sf0.001."""
    return cdc_queries.cdc_merge(spark, "/root/testdata/sf0.001")


def _fresh(fn: Callable) -> Callable:
    """Release the previous query's persisted intermediates before
    building the next plan — keeps a long-lived session (the driver runs
    all ~40 entries in one) from accreting caches. Safe: by the time the
    next entry is requested, the prior entry's result has been consumed."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        dedup.release_persisted()
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _fresh(v) for k, v in _queries_raw().items()}


def secondary_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-checked queries NOT in the driver gate registry.

    The driver's correctness gate records at most 50 entries per round
    (rounds 3-4 silently truncated past the cap), so :func:`queries` is
    pruned to exactly the 50 first-class capabilities and these TPC-H
    tail shapes — plan-shape variants of joins/aggs already gated above —
    live here instead. They keep full DuckDB-oracle verification every
    round via ``tests/test_queries.py``, which parametrizes over the
    union of both registries; only the driver-side gate skips them.
    """
    return {k: _fresh(v) for k, v in _secondary_raw().items()}


def _queries_raw() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver gate's per-round cap. Every key here
    # gets a CORRECTNESS row each round; everything else is pytest-gated
    # via secondary_queries(). Do not grow past 50: the round-3/4 gates
    # recorded the first 50 and silently dropped the rest.
    return {
        # CDC engine (SURVEY §2 #1-6)
        "cdc_initial_stamp": cdc_queries.cdc_initial_stamp,
        "cdc_dedup_latest": cdc_queries.cdc_dedup_latest,
        "cdc_insert_only": cdc_queries.cdc_insert_only,
        "cdc_merge": cdc_queries.cdc_merge,
        "cdc_impacted": cdc_queries.cdc_impacted,
        "cdc_merge_soft_delete": cdc_queries.cdc_merge_soft_delete,
        # Dedup + similarity (SURVEY §2 #19-25, #54, #65)
        "dedup_exact": llm_queries.dedup_exact,
        "dedup_ngram_jaccard": llm_queries.dedup_ngram_jaccard,
        "dedup_minhash_lsh": llm_queries.dedup_minhash_lsh,
        "dedup_simhash": llm_queries.dedup_simhash,
        "dedup_embedding_cosine": llm_queries.dedup_embedding_cosine,
        "dedup_clusters": llm_queries.dedup_clusters,
        "ann_cosine_topk": llm_queries.ann_cosine_topk,
        "ann_lsh_topk": llm_queries.ann_lsh_topk,
        "ann_ivf_topk": llm_queries.ann_ivf_topk,
        "ann_batch_topk": llm_queries.ann_batch_topk,
        "emb_label_centroids": llm_queries.emb_label_centroids,
        "pipeline_curate_corpus": llm_queries.pipeline_curate_corpus,
        # Text analysis (SURVEY §2 #26-29, #41, #58, #59, #61)
        "text_word_topk": text.text_word_topk,
        "text_tokens": text.text_tokens,
        "text_quality": text.text_quality,
        "text_langid": text.text_langid,
        "text_bm25": corpus_stats.text_bm25,
        # Analytics surface (SURVEY §2 #12-18, #31-34, #40, #44-45,
        # #47-48, #51-52, #62-64)
        "q1_pricing_summary": analytics.q1_pricing_summary,
        "q3_shipping_priority": analytics.q3_shipping_priority,
        "q5_local_supplier_volume": analytics.q5_local_supplier_volume,
        "q_top_customers_per_nation": analytics.q_top_customers_per_nation,
        "q_events_tumbling": analytics.q_events_tumbling,
        "q_events_sessionize": analytics.q_events_sessionize,
        "q_orders_rollup": analytics.q_orders_rollup,
        "q_customers_no_orders": analytics.q_customers_no_orders,
        "q_orders_above_avg": analytics.q_orders_above_avg,
        # ROUND-15 DEBUT SLOTS (16-slot rotation, per the round-13
        # verdict). Demoted to secondary_queries() after hash-matching
        # in CORRECTNESS_r14: the sixteen round-14 debuts
        # (q_orders_mad_outliers, q_events_funnel_windowed,
        # q_events_conversion_latency, q_events_wilson,
        # corpus_vocab_overlap, corpus_fertility, dedup_cluster_sizes,
        # q_orders_histogram, corpus_repetition_indices,
        # corpus_zipf_spine, q_copurchase_assortativity,
        # corpus_chi2_keywords, q_orders_benford, corpus_source_tvd,
        # q_customer_cadence, corpus_burstiness — all 16 hash-green in
        # r14). Debuts: the round-14 rotation plan's never-driver-gated
        # block of sixteen, keeping every oracled query driver-gated at
        # least once per two-to-three rounds until the never-gated set
        # is empty.
        "q_basket_affinity": analytics.q_basket_affinity,
        "q_events_decay_score": analytics.q_events_decay_score,
        "q_events_attribution": analytics.q_events_attribution,
        "q_events_attribution_linear": analytics.q_events_attribution_linear,
        "q_events_transitions": analytics.q_events_transitions,
        "q_customer_rfm": analytics.q_customer_rfm,
        "q_customer_feature_matrix": analytics.q_customer_feature_matrix,
        "corpus_lang_mismatch": text.corpus_lang_mismatch,
        "text_bigram_surprisal": text.text_bigram_surprisal,
        "sample_weighted": text.sample_weighted,
        "dedup_containment": llm_queries.dedup_containment,
        "dedup_unicode": llm_queries.dedup_unicode,
        "q_part_fuzzy_levenshtein": llm_queries.q_part_fuzzy_levenshtein,
        "eval_centroid_classifier": corpus_ml.eval_centroid_classifier,
        "corpus_quality_filter": text.corpus_quality_filter,
        "corpus_lexical_diversity": corpus_ml.corpus_lexical_diversity,
        "q_events_filter_scan": analytics.q_events_filter_scan,
        "text_bigrams": text.text_bigrams,
    }


def _secondary_raw() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # TPC-H tail shapes + value-ranks + decontamination: pytest-oracled,
    # outside the driver cap (plan-shape variants of gated joins/aggs,
    # plus ops added after the cap filled).
    return {
        # rotated out of the driver gate after hash-matching in round 14
        # (16-slot rotation): the sixteen round-14 debuts;
        # pytest-oracled here every round
        "q_orders_mad_outliers": analytics.q_orders_mad_outliers,
        "q_events_funnel_windowed": analytics.q_events_funnel_windowed,
        "q_events_conversion_latency": analytics.q_events_conversion_latency,
        "q_events_wilson": analytics.q_events_wilson,
        "corpus_vocab_overlap": corpus_ml.corpus_vocab_overlap,
        "corpus_fertility": corpus_ml.corpus_fertility,
        "dedup_cluster_sizes": llm_queries.dedup_cluster_sizes,
        "q_orders_histogram": analytics.q_orders_histogram,
        "corpus_repetition_indices": corpus_ml.corpus_repetition_indices,
        "corpus_zipf_spine": corpus_ml.corpus_zipf_spine,
        "q_copurchase_assortativity": analytics.q_copurchase_assortativity,
        "corpus_chi2_keywords": corpus_ml.corpus_chi2_keywords,
        "q_orders_benford": analytics.q_orders_benford,
        "corpus_source_tvd": corpus_ml.corpus_source_tvd,
        "q_customer_cadence": analytics.q_customer_cadence,
        "corpus_burstiness": corpus_ml.corpus_burstiness,
        # rotated out after round 13 (widened 16-slot rotation): the
        # eight round-13 debuts + eight
        # long-proven veterans; pytest-oracled here every round
        "q_events_peak_concurrency": analytics.q_events_peak_concurrency,
        "q_orders_mom_growth": analytics.q_orders_mom_growth,
        "dedup_bag_of_words": llm_queries.dedup_bag_of_words,
        "q_orders_histogram_eqdepth": analytics.q_orders_histogram_eqdepth,
        "q_orders_drift_tvd": analytics.q_orders_drift_tvd,
        "emb_covariance": corpus_ml.emb_covariance,
        "q_events_session_paths": analytics.q_events_session_paths,
        "q_orders_percentile": analytics.q_orders_percentile,
        "q_events_json_extract": analytics.q_events_json_extract,
        "q_events_asof_order": analytics.q_events_asof_order,
        "q_events_range_join": analytics.q_events_range_join,
        "q17_small_quantity_revenue": analytics.q17_small_quantity_revenue,
        "q18_large_volume_customers": analytics.q18_large_volume_customers,
        "text_fingerprint": text.text_fingerprint,
        "text_tfidf_topk": corpus_stats.text_tfidf_topk,
        "text_chunks": corpus_stats.text_chunks,
        "corpus_decontaminate": llm_queries.corpus_decontaminate,
        "dedup_keep_best": llm_queries.dedup_keep_best,
        "corpus_source_stats": llm_queries.corpus_source_stats,
        # rows-only (Spark HLL++ and DuckDB HLL are not bit-comparable;
        # the exact twin q_events_daily_users is the value-level gate)
        "q_events_daily_users_approx": analytics.q_events_daily_users_approx,
        "q_customer_value_ranks": tpch_ext.q_customer_value_ranks,
        "q4_order_priority": tpch_ext.q4_order_priority,
        "q7_volume_shipping": tpch_ext.q7_volume_shipping,
        "q8_market_share": tpch_ext.q8_market_share,
        "q10_returned_items": tpch_ext.q10_returned_items,
        "q14_promo_revenue": tpch_ext.q14_promo_revenue,
        "q16_parts_supplier_count": tpch_ext.q16_parts_supplier_count,
        "q19_disjunctive_revenue": tpch_ext.q19_disjunctive_revenue,
        "q22_idle_customers": tpch_ext.q22_idle_customers,
        "q6_forecast_revenue": tpch_rest.q6_forecast_revenue,
        "q12_priority_by_linestatus": tpch_rest.q12_priority_by_linestatus,
        "q20_part_promotion_suppliers": tpch_rest.q20_part_promotion_suppliers,
        # rotated back out of the driver gate after hash-matching in
        # round 6 (see _queries_raw); pytest-oracled here every round
        "q2_min_cost_supplier": tpch_rest.q2_min_cost_supplier,
        "q9_product_profit": tpch_rest.q9_product_profit,
        "q11_important_stock": tpch_rest.q11_important_stock,
        "q13_customer_distribution": tpch_rest.q13_customer_distribution,
        "q15_top_supplier": tpch_rest.q15_top_supplier,
        "q21_waiting_suppliers": tpch_rest.q21_waiting_suppliers,
        # round-6 additions (SURVEY §2 #76-77, #79)
        "corpus_split_counts": text.corpus_split_counts,
        "corpus_pack_sequences": text.corpus_pack_sequences,
        "dedup_incremental": llm_queries.dedup_incremental,
        "emb_quantize": llm_queries.emb_quantize,
        # round-7 additions (SURVEY §2 #81-83)
        "text_repetition": text.text_repetition,
        "corpus_token_budget": text.corpus_token_budget,
        # displaced from the driver gate by the round-7 debut slots
        # (hash-green in r06; rotate back in round 8)
        "q_events_daily_users": analytics.q_events_daily_users,
        "q_orders_median_price": analytics.q_orders_median_price,
        "sample_stratified": text.sample_stratified,
        "sketch_count_min": text.sketch_count_min,
        # round-7 addition (SURVEY §2 #88)
        "dedup_source_matrix": llm_queries.dedup_source_matrix,
        # rotated out of the driver gate after hash-matching in round 9
        # (SURVEY §2 #95, #96, #91, #92); pytest-oracled here every round
        "q_events_funnel": analytics.q_events_funnel,
        "q_events_retention": analytics.q_events_retention,
        "text_surprisal": text.text_surprisal,
        "corpus_temperature_mix": text.corpus_temperature_mix,
        # rotated out of the driver gate after hash-matching in round 8
        # (SURVEY §2 #89, #90, #94, #100); pytest-oracled here every round
        "cdc_scd2": cdc_queries.cdc_scd2,
        "cdc_snapshot_diff": cdc_queries.cdc_snapshot_diff,
        "cdc_incremental_agg": cdc_queries.cdc_incremental_agg,
        "lake_expectations": cdc_queries.lake_expectations,
        # rotated out of the driver gate after hash-matching in round 7
        # (SURVEY §2 #84-#87); pytest-oracled here every round
        "dedup_semantic": llm_queries.dedup_semantic,
        "dedup_substring": llm_queries.dedup_substring,
        "text_quality_classifier": text.text_quality_classifier,
        "ann_pq_topk": llm_queries.ann_pq_topk,
        # rotated out of the driver gate after hash-matching in round 10
        # (SURVEY §2 #93, #99, #103, #101); pytest-oracled here every
        # round
        "q_lineitem_bloom_semi": analytics.q_lineitem_bloom_semi,
        "emb_hard_negatives": llm_queries.emb_hard_negatives,
        "lake_profile": cdc_queries.lake_profile,
        "q_events_gapfill": analytics.q_events_gapfill,
        # rows-only (sketch internals differ across engines by design;
        # the tolerance pytest pins values against the exact percentile)
        "q_orders_price_quantiles_approx": analytics.q_orders_price_quantiles_approx,
        # round-8 additions (SURVEY §2 #106-#110)
        "text_paragraph_dedup": corpus_ml.text_paragraph_dedup,
        "emb_random_projection": corpus_ml.emb_random_projection,
        "q_events_user_anomaly": corpus_ml.q_events_user_anomaly,
        "emb_knn_label_propagation": corpus_ml.emb_knn_label_propagation,
        "corpus_source_top_terms": corpus_ml.corpus_source_top_terms,
        "corpus_split_leakage": corpus_ml.corpus_split_leakage,
        # round-9 addition (SURVEY §2 #113): corpus-scale KNN propagation
        # (_all = fixed-plane oracle vehicle; _auto = the corpus-scaled
        # production form, rows-only — no SQL oracle can carry a
        # data-dependent plane count)
        "emb_knn_propagate_all": corpus_ml.emb_knn_propagate_all,
        "emb_knn_propagate_auto": corpus_ml.emb_knn_propagate_auto,
        # round-9 addition (SURVEY §2 #115): per-label embedding outliers
        "emb_label_outliers": corpus_ml.emb_label_outliers,
        # round-9 additions (SURVEY §2 #116-#117): transition matrix + RFM
        # round-9 addition (SURVEY §2 #118): lang metadata audit
        # round-9 addition (SURVEY §2 #119): bigram LM surprisal
        # round-10 additions (SURVEY §2 #120-#124, #127-#129)
        # (round-11 additions #132-#137, #140-#146 moved to the driver
        # gate as round-14 debuts: q_events_conversion_latency,
        # q_events_wilson, corpus_vocab_overlap, corpus_fertility,
        # dedup_cluster_sizes, q_orders_histogram, q_orders_mad_outliers,
        # q_events_funnel_windowed)
        # rotated out of the driver gate after hash-matching in round 12
        # (the eight r12 debuts); pytest-oracled here every round
        "dedup_tf_cosine": llm_queries.dedup_tf_cosine,
        "text_heavy_hitters": text.text_heavy_hitters,
        "q_part_triangles": analytics.q_part_triangles,
        "q_events_rolling_distinct": analytics.q_events_rolling_distinct,
        "q_customer_gini": analytics.q_customer_gini,
        "lake_integrity": cdc_queries.lake_integrity_report,
        "lake_key_profile": cdc_queries.lake_key_profile,
        "eval_ann_mrr": corpus_ml.eval_ann_mrr,
        # rows-only (shuffle-order double sums; numpy-pinned in pytest)
        "q_part_pagerank": analytics.q_part_pagerank,
        # rotated out of the driver gate after hash-matching in round 11
        # (SURVEY §2 #102, #104, #105, #111 + four long-gated plan-shape
        # variants); pytest-oracled here every round
        "q_events_skew_report": analytics.q_events_skew_report,
        "q_part_fuzzy_match": llm_queries.q_part_fuzzy_match,
        "eval_langid_report": llm_queries.eval_langid_report,
        "corpus_collocations": corpus_ml.corpus_collocations,
        "q_events_sliding": analytics.q_events_sliding,
        "q_events_moving_avg": analytics.q_events_moving_avg,
        "q_events_pivot": analytics.q_events_pivot,
        "q_orders_set_ops": analytics.q_orders_set_ops,
        # round-12 additions (SURVEY §2 #159-#165)
        "q_events_daily_anomaly": analytics.q_events_daily_anomaly,
        "q_part_neighbors": analytics.q_part_neighbors,
        "q_events_trigrams": analytics.q_events_trigrams,
        "eval_auc_length": corpus_ml.eval_auc_length,
        "eval_lang_kappa": llm_queries.eval_lang_kappa,
        # round-13 additions (corpus_repetition_indices,
        # corpus_zipf_spine, corpus_chi2_keywords,
        # q_copurchase_assortativity, q_orders_benford,
        # corpus_source_tvd, q_customer_cadence and the #163 burstiness
        # rewrite moved to the driver gate as round-14 debuts)
        "corpus_ingest_novelty": corpus_ml.corpus_ingest_novelty,
        "dedup_cluster_source_span": llm_queries.dedup_cluster_source_span,
        # rows-only (#174: greedy MMR objective is not SQL-expressible;
        # deterministic rows — numpy-pinned + hand-checked in pytest)
        "ann_mmr_topk": llm_queries.ann_mmr_topk,
        # round-14 additions (SURVEY §2 #184-#189)
        "q_orders_autocorr": analytics.q_orders_autocorr,
        "q_events_bot_burst": analytics.q_events_bot_burst,
        "q_supplier_reliability": analytics.q_supplier_reliability,
        "corpus_source_balance": corpus_ml.corpus_source_balance,
        "corpus_doclen_histogram": corpus_ml.corpus_doclen_histogram,
        "emb_centroid_distances": llm_queries.emb_centroid_distances,
        # rows-only (#190: the k-core peel is a fixpoint loop, not
        # SQL-expressible; deterministic rows — invariants in pytest)
        "q_part_kcore": analytics.q_part_kcore,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_initial_stamp": cdc_queries.CDC_INITIAL_STAMP_SQL,
        "cdc_dedup_latest": cdc_queries.CDC_DEDUP_LATEST_SQL,
        "cdc_insert_only": cdc_queries.CDC_INSERT_ONLY_SQL,
        "cdc_merge": cdc_queries.CDC_MERGE_SQL,
        "cdc_impacted": cdc_queries.CDC_IMPACTED_SQL,
        "cdc_merge_soft_delete": cdc_queries.CDC_MERGE_SOFT_DELETE_SQL,
        "q1_pricing_summary": analytics.Q1_SQL,
        "q3_shipping_priority": analytics.Q3_SQL,
        "q5_local_supplier_volume": analytics.Q5_SQL,
        "q_top_customers_per_nation": analytics.Q_TOP_CUSTOMERS_SQL,
        "q_events_tumbling": analytics.Q_EVENTS_TUMBLING_SQL,
        "q_events_sessionize": analytics.Q_EVENTS_SESSIONIZE_SQL,
        "q_orders_rollup": analytics.Q_ORDERS_ROLLUP_SQL,
        "q_customers_no_orders": analytics.Q_CUSTOMERS_NO_ORDERS_SQL,
        "q_orders_above_avg": analytics.Q_ORDERS_ABOVE_AVG_SQL,
        # round-15 debuts (never driver-gated before this round;
        # 16-slot rotation)
        "q_basket_affinity": analytics.Q_BASKET_AFFINITY_SQL,
        "q_events_decay_score": analytics.Q_EVENTS_DECAY_SCORE_SQL,
        "q_events_attribution": analytics.Q_EVENTS_ATTRIBUTION_SQL,
        "q_events_attribution_linear": analytics.Q_EVENTS_ATTRIBUTION_LINEAR_SQL,
        "q_events_transitions": analytics.Q_EVENTS_TRANSITIONS_SQL,
        "q_customer_rfm": analytics.Q_CUSTOMER_RFM_SQL,
        "q_customer_feature_matrix": analytics.Q_CUSTOMER_FEATURE_MATRIX_SQL,
        "corpus_lang_mismatch": text.CORPUS_LANG_MISMATCH_SQL,
        "text_bigram_surprisal": text.TEXT_BIGRAM_SURPRISAL_SQL,
        "sample_weighted": text.SAMPLE_WEIGHTED_SQL,
        "dedup_containment": llm_queries.DEDUP_CONTAINMENT_SQL,
        "dedup_unicode": llm_queries.DEDUP_UNICODE_SQL,
        "q_part_fuzzy_levenshtein": llm_queries.Q_PART_FUZZY_LEVENSHTEIN_SQL,
        "eval_centroid_classifier": corpus_ml.EVAL_CENTROID_CLASSIFIER_SQL,
        "corpus_quality_filter": text.CORPUS_QUALITY_FILTER_SQL,
        "corpus_lexical_diversity": corpus_ml.CORPUS_LEXICAL_DIVERSITY_SQL,
        "q_events_filter_scan": analytics.Q_EVENTS_FILTER_SCAN_SQL,
        "text_bigrams": text.TEXT_BIGRAMS_SQL,
        "text_word_topk": text.TEXT_WORD_TOPK_SQL,
        "text_tokens": text.TEXT_TOKENS_SQL,
        "text_quality": text.TEXT_QUALITY_SQL,
        "text_langid": text.TEXT_LANGID_SQL,
        "text_bm25": corpus_stats.TEXT_BM25_SQL,
        "dedup_exact": llm_queries.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": llm_queries.DEDUP_NGRAM_JACCARD_SQL,
        "dedup_minhash_lsh": llm_queries.DEDUP_MINHASH_LSH_SQL,
        "dedup_simhash": llm_queries.DEDUP_SIMHASH_SQL,
        "dedup_embedding_cosine": llm_queries.DEDUP_EMBEDDING_COSINE_SQL,
        "dedup_clusters": llm_queries.DEDUP_CLUSTERS_SQL,
        "ann_cosine_topk": llm_queries.ANN_COSINE_TOPK_SQL,
        "ann_lsh_topk": llm_queries.ANN_LSH_TOPK_SQL,
        "ann_ivf_topk": llm_queries.ANN_IVF_TOPK_SQL,
        "ann_batch_topk": llm_queries.ANN_BATCH_TOPK_SQL,
        "emb_label_centroids": llm_queries.EMB_LABEL_CENTROIDS_SQL,
        "pipeline_curate_corpus": llm_queries.PIPELINE_CURATE_CORPUS_SQL,
    }


def secondary_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for :func:`secondary_queries` (pytest-side gate)."""
    return {
        # rotated out of the driver gate after hash-matching in round 14
        # (16-slot rotation)
        "q_orders_mad_outliers": analytics.Q_ORDERS_MAD_OUTLIERS_SQL,
        "q_events_funnel_windowed": analytics.Q_EVENTS_FUNNEL_WINDOWED_SQL,
        "q_events_conversion_latency": analytics.Q_EVENTS_CONVERSION_LATENCY_SQL,
        "q_events_wilson": analytics.Q_EVENTS_WILSON_SQL,
        "corpus_vocab_overlap": corpus_ml.CORPUS_VOCAB_OVERLAP_SQL,
        "corpus_fertility": corpus_ml.CORPUS_FERTILITY_SQL,
        "dedup_cluster_sizes": llm_queries.DEDUP_CLUSTER_SIZES_SQL,
        "q_orders_histogram": analytics.Q_ORDERS_HISTOGRAM_SQL,
        "corpus_repetition_indices": corpus_ml.CORPUS_REPETITION_INDICES_SQL,
        "corpus_zipf_spine": corpus_ml.CORPUS_ZIPF_SPINE_SQL,
        "q_copurchase_assortativity": analytics.Q_COPURCHASE_ASSORTATIVITY_SQL,
        "corpus_chi2_keywords": corpus_ml.CORPUS_CHI2_KEYWORDS_SQL,
        "q_orders_benford": analytics.Q_ORDERS_BENFORD_SQL,
        "corpus_source_tvd": corpus_ml.CORPUS_SOURCE_TVD_SQL,
        "q_customer_cadence": analytics.Q_CUSTOMER_CADENCE_SQL,
        "corpus_burstiness": corpus_ml.CORPUS_BURSTINESS_SQL,
        # rotated out of the driver gate after hash-matching in round 13
        # (widened 16-slot rotation)
        "q_events_peak_concurrency": analytics.Q_EVENTS_PEAK_CONCURRENCY_SQL,
        "q_orders_mom_growth": analytics.Q_ORDERS_MOM_GROWTH_SQL,
        "dedup_bag_of_words": llm_queries.DEDUP_BAG_OF_WORDS_SQL,
        "q_orders_histogram_eqdepth": analytics.Q_ORDERS_HISTOGRAM_EQDEPTH_SQL,
        "q_orders_drift_tvd": analytics.Q_ORDERS_DRIFT_TVD_SQL,
        "emb_covariance": corpus_ml.EMB_COVARIANCE_SQL,
        "q_events_session_paths": analytics.Q_EVENTS_SESSION_PATHS_SQL,
        "q_orders_percentile": analytics.Q_ORDERS_PERCENTILE_SQL,
        "q_events_json_extract": analytics.Q_EVENTS_JSON_EXTRACT_SQL,
        "q_events_asof_order": analytics.Q_EVENTS_ASOF_ORDER_SQL,
        "q_events_range_join": analytics.Q_EVENTS_RANGE_JOIN_SQL,
        "q17_small_quantity_revenue": analytics.Q17_SQL,
        "q18_large_volume_customers": analytics.Q18_SQL,
        "text_fingerprint": text.TEXT_FINGERPRINT_SQL,
        "text_tfidf_topk": corpus_stats.TEXT_TFIDF_TOPK_SQL,
        "text_chunks": corpus_stats.TEXT_CHUNKS_SQL,
        "corpus_decontaminate": llm_queries.CORPUS_DECONTAMINATE_SQL,
        "dedup_keep_best": llm_queries.DEDUP_KEEP_BEST_SQL,
        "corpus_source_stats": llm_queries.CORPUS_SOURCE_STATS_SQL,
        "q2_min_cost_supplier": tpch_rest.Q2_SQL,
        "q9_product_profit": tpch_rest.Q9_SQL,
        "q11_important_stock": tpch_rest.Q11_SQL,
        "q13_customer_distribution": tpch_rest.Q13_SQL,
        "q15_top_supplier": tpch_rest.Q15_SQL,
        "q21_waiting_suppliers": tpch_rest.Q21_SQL,
        "corpus_split_counts": text.CORPUS_SPLIT_COUNTS_SQL,
        "corpus_pack_sequences": text.CORPUS_PACK_SEQUENCES_SQL,
        "text_repetition": text.TEXT_REPETITION_SQL,
        "corpus_token_budget": text.CORPUS_TOKEN_BUDGET_SQL,
        "q_events_daily_users": analytics.Q_EVENTS_DAILY_USERS_SQL,
        "q_orders_median_price": analytics.Q_ORDERS_MEDIAN_PRICE_SQL,
        "sample_stratified": text.SAMPLE_STRATIFIED_SQL,
        "sketch_count_min": text.SKETCH_COUNT_MIN_SQL,
        "dedup_source_matrix": llm_queries.DEDUP_SOURCE_MATRIX_SQL,
        "cdc_scd2": cdc_queries.CDC_SCD2_SQL,
        "cdc_snapshot_diff": cdc_queries.CDC_SNAPSHOT_DIFF_SQL,
        "cdc_incremental_agg": cdc_queries.CDC_INCREMENTAL_AGG_SQL,
        "lake_expectations": cdc_queries.LAKE_EXPECTATIONS_SQL,
        "q_events_funnel": analytics.Q_EVENTS_FUNNEL_SQL,
        "q_events_retention": analytics.Q_EVENTS_RETENTION_SQL,
        "text_surprisal": text.TEXT_SURPRISAL_SQL,
        "corpus_temperature_mix": text.CORPUS_TEMPERATURE_MIX_SQL,
        "dedup_semantic": llm_queries.DEDUP_SEMANTIC_SQL,
        "dedup_substring": llm_queries.DEDUP_SUBSTRING_SQL,
        "text_quality_classifier": text.TEXT_QUALITY_CLASSIFIER_SQL,
        "ann_pq_topk": llm_queries.ANN_PQ_TOPK_SQL,
        "q_lineitem_bloom_semi": analytics.Q_LINEITEM_BLOOM_SEMI_SQL,
        "emb_hard_negatives": llm_queries.EMB_HARD_NEGATIVES_SQL,
        "lake_profile": cdc_queries.LAKE_PROFILE_SQL,
        "q_events_gapfill": analytics.Q_EVENTS_GAPFILL_SQL,
        "dedup_incremental": llm_queries.DEDUP_INCREMENTAL_SQL,
        "emb_quantize": llm_queries.EMB_QUANTIZE_SQL,
        "q_customer_value_ranks": tpch_ext.Q_CUSTOMER_VALUE_RANKS_SQL,
        "q4_order_priority": tpch_ext.Q4_SQL,
        "q7_volume_shipping": tpch_ext.Q7_SQL,
        "q8_market_share": tpch_ext.Q8_SQL,
        "q10_returned_items": tpch_ext.Q10_SQL,
        "q14_promo_revenue": tpch_ext.Q14_SQL,
        "q16_parts_supplier_count": tpch_ext.Q16_SQL,
        "q19_disjunctive_revenue": tpch_ext.Q19_SQL,
        "q22_idle_customers": tpch_ext.Q22_SQL,
        "q6_forecast_revenue": tpch_rest.Q6_SQL,
        "q12_priority_by_linestatus": tpch_rest.Q12_SQL,
        "q20_part_promotion_suppliers": tpch_rest.Q20_SQL,
        "text_paragraph_dedup": corpus_ml.TEXT_PARAGRAPH_DEDUP_SQL,
        "emb_random_projection": corpus_ml.EMB_RANDOM_PROJECTION_SQL,
        "q_events_user_anomaly": corpus_ml.Q_EVENTS_USER_ANOMALY_SQL,
        "emb_knn_label_propagation": corpus_ml.EMB_KNN_LABEL_PROPAGATION_SQL,
        "corpus_source_top_terms": corpus_ml.CORPUS_SOURCE_TOP_TERMS_SQL,
        "corpus_split_leakage": corpus_ml.CORPUS_SPLIT_LEAKAGE_SQL,
        "emb_knn_propagate_all": corpus_ml.EMB_KNN_PROPAGATE_ALL_SQL,
        "emb_label_outliers": corpus_ml.EMB_LABEL_OUTLIERS_SQL,
        # (round-11 additions #132-#146 moved to oracle_sql() as
        # round-14 gate debuts)
        # rotated out of the driver gate after hash-matching in round 12
        "dedup_tf_cosine": llm_queries.DEDUP_TF_COSINE_SQL,
        "text_heavy_hitters": text.TEXT_HEAVY_HITTERS_SQL,
        "q_part_triangles": analytics.Q_PART_TRIANGLES_SQL,
        "q_events_rolling_distinct": analytics.Q_EVENTS_ROLLING_DISTINCT_SQL,
        "q_customer_gini": analytics.Q_CUSTOMER_GINI_SQL,
        "lake_integrity": cdc_queries.LAKE_INTEGRITY_REPORT_SQL,
        "lake_key_profile": cdc_queries.LAKE_KEY_PROFILE_SQL,
        "eval_ann_mrr": corpus_ml.EVAL_ANN_MRR_SQL,
        # rotated out of the driver gate after hash-matching in round 11
        "q_events_skew_report": analytics.Q_EVENTS_SKEW_REPORT_SQL,
        "q_part_fuzzy_match": llm_queries.Q_PART_FUZZY_MATCH_SQL,
        "eval_langid_report": llm_queries.EVAL_LANGID_REPORT_SQL,
        "corpus_collocations": corpus_ml.CORPUS_COLLOCATIONS_SQL,
        "q_events_sliding": analytics.Q_EVENTS_SLIDING_SQL,
        "q_events_moving_avg": analytics.Q_EVENTS_MOVING_AVG_SQL,
        "q_events_pivot": analytics.Q_EVENTS_PIVOT_SQL,
        "q_orders_set_ops": analytics.Q_ORDERS_SET_OPS_SQL,
        # round-12 additions (SURVEY §2 #159-#165)
        "q_events_daily_anomaly": analytics.Q_EVENTS_DAILY_ANOMALY_SQL,
        "q_part_neighbors": analytics.Q_PART_NEIGHBORS_SQL,
        "q_events_trigrams": analytics.Q_EVENTS_TRIGRAMS_SQL,
        "eval_auc_length": corpus_ml.EVAL_AUC_LENGTH_SQL,
        "eval_lang_kappa": llm_queries.EVAL_LANG_KAPPA_SQL,
        # round-13 additions (most moved to oracle_sql() as round-14
        # gate debuts)
        "corpus_ingest_novelty": corpus_ml.CORPUS_INGEST_NOVELTY_SQL,
        "dedup_cluster_source_span": llm_queries.DEDUP_CLUSTER_SOURCE_SPAN_SQL,
        # round-14 additions (SURVEY §2 #184-#189)
        "q_orders_autocorr": analytics.Q_ORDERS_AUTOCORR_SQL,
        "q_events_bot_burst": analytics.Q_EVENTS_BOT_BURST_SQL,
        "q_supplier_reliability": analytics.Q_SUPPLIER_RELIABILITY_SQL,
        "corpus_source_balance": corpus_ml.CORPUS_SOURCE_BALANCE_SQL,
        "corpus_doclen_histogram": corpus_ml.CORPUS_DOCLEN_HISTOGRAM_SQL,
        "emb_centroid_distances": llm_queries.EMB_CENTROID_DISTANCES_SQL,
    }
