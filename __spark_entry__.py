"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly transfer-volume-shaped query
(SURVEY.md §2 A2/Q5) over sf0.001. ``queries()`` / ``oracle_sql()`` expose
the SURVEY §2 operator inventory + scale extensions, each phrased over the
driver's tables with a DuckDB oracle twin (see
``defi_etl_platform_sqlglot_implementation__spark/registry.py`` for the
float-parity policy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from defi_etl_platform_sqlglot_implementation__spark import registry
from defi_etl_platform_sqlglot_implementation__spark import registry_llm  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_tpch  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_ts  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_adv  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_sql2  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm2  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_decode  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm3  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_adv2  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_transpile  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_tpch2  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_tpch3  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_media  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm4  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm6  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm7  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm8  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm9  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm10  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm11  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm12  # noqa: F401 — fills registry dicts
from defi_etl_platform_sqlglot_implementation__spark import registry_llm13  # noqa: F401 — fills registry dicts


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["transfer_volume_hourly"](spark, "/root/testdata/sf0.001")


# Verification priority, re-derived from CORRECTNESS_r01∪r02∪r03∪r04:
# queries with no green driver row yet come first so a driver that caps its
# per-round check count at ~50 still gives every registered query at least
# one exact oracle row across rounds.  Head buckets:
#   1. the 5 r04 hash-fails — all one oracle bug (DuckDB SUM(BIGINT) →
#      HUGEINT → float64 in fetchdf vs Spark bigint; the driver hash
#      distinguishes 41870 from 41870.0), fixed in r5 by the transpiler's
#      integral-SUM → CAST(... AS BIGINT) DuckDB emission rule and a
#      direct cast in linestatus_priority_counts' oracle; re-run first;
#   2. the 20 r4-session-2 gates that have NEVER had a driver row (18
#      registered past the 50-slot cap + bpe_vocab / similarity_ann_ivf,
#      whose oracles were upgraded rows-only → exact after their last
#      row) — all local-exact at sf0.001/sf0.01/sf1 (STRESS_r04.txt);
#   3. queries whose implementation changed this round (re-keyed
#      embedding dedup blocking);
#   4. anything not listed below (i.e. new this round) via _ordered();
#   5. tail: the queries whose green row matches the current code.
_PRIORITY = [
    # -- bucket 1: r04 reds, oracle dtype bug fixed this round (5) --
    "transpiled_hourly_rollup", "transpiled_user_buckets",
    "transpiled_monthly_orders", "transpiled_rank_over",
    "linestatus_priority_counts",
    # -- bucket 2: never driver-checked (20) --
    "bfs_trade_distance", "bpe_encode_segments", "bpe_vocab",
    "curation_pipeline_v2", "dedup_incremental", "dedup_keep_canonical",
    "doc_bigram_logprob", "embedding_mean_pool", "gopher_quality_flags",
    "knn_label_accuracy", "minhash_containment", "multimodal_resize_real",
    "reciprocal_trade_pairs", "schema_evolution_read",
    "semdedup_pairs_probed", "semdedup_recall_probed",
    "similarity_ann_ivf", "similarity_ann_ivf_trained",
    "similarity_ann_recall_trained", "transpiled_listagg",
    # -- bucket 3: new/changed in r5 (label-blocked pair gate retired in
    #    favor of the composed cluster-blocked keep-verdict; the r04-green
    #    trained semdedup gates re-run because their oracle text changed —
    #    the _km_ctes float32→double cast fix) --
    "dedup_embedding_canonical",
    "semdedup_pairs_trained", "semdedup_recall_trained",
]


# Green driver row exists (r01 ∪ r02) and the implementation is unchanged
# since that row.  NOTE: every _PRIORITY bucket-2/2b query (changed after
# its green row) is deliberately ABSENT here — the convention is that
# changed-since-green means not-green, regardless of prior rows.
_DRIVER_GREEN = {
    "transfer_volume_hourly",
    "topk_parts_by_quantity", "hour_spine_join",
    "order_lineitem_pairing", "event_projection", "block_range_scan",
    "rolling_p90", "rolling_var_minperiods", "rolling_var_cvar",
    "rolling_var_cvar_partitioned", "var_cvar_scalar", "stress_test_table",
    "il_curve", "mev_scores", "distinct_counts", "summary_stats",
    "selector_map_lookup", "json_props_extract", "time_formats",
    "last_k_events", "routed_union", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash_signatures", "dedup_simhash_weighted",
    "dedup_char_jaccard", "dedup_simhash_pairs", "similarity_topk",
    "similarity_lsh_pairs", "text_profile", "lang_id", "doc_fingerprint",
    "multimodal_meta", "multimodal_decode_fake", "multimodal_decode_real",
    "multimodal_frame_sample", "rolling_p90_partitioned", "salted_group_sum",
    "hourly_daily_rollup", "dedup_embedding_cosine",
    "customers_without_urgent_orders", "brands_with_shipped_parts",
    "user_event_sets", "priority_top_orders", "asof_price_join",
    "session_stats", "sliding_window_range_join", "stratified_sample",
    "view_purchase_attribution", "user_event_gaps", "secondary_sort_deltas",
    "bernoulli_hash_sample", "reservoir_sample_global",
    "big_quantity_orders", "lone_late_suppliers",
    "order_price_quartiles", "rolling_hour_user_value", "event_type_pivot",
    "value_quantiles_by_type",
    "token_vocab_topk", "cohort_retention", "segment_name_listagg",
    "source_numeric_profile",
    "user_click_purchase_ratio", "contamination_overlap",
    "token_shard_assignment", "curation_funnel", "dedup_clusters",
    "transfer_decode_roundtrip", "swap_decode_roundtrip",
    # -- green in r03 (driver rows in CORRECTNESS_r03.json) --
    "rolling_var_minperiods_partitioned", "similarity_ann_ivf_fullprobe",
    "token_entropy", "salted_join_brand_qty", "asof_price_join_forward",
    "pagerank_nation_graph", "contamination_bloom_gated",
    "curation_pipeline_e2e", "source_mix_rebalance",
    "dedup_char_jaccard_capped",
    "similarity_ann_pq", "similarity_ann_recall",
    "transfer_volume_hourly_approx_check",
    # dedup_embedding_cosine_blocked: green r03, but re-keyed in r5
    # (cluster blocking) → _PRIORITY bucket 3, deliberately absent here
    "twap_per_user", "funnel_view_click_purchase", "event_transition_matrix",
    "hourly_locf_fill", "user_share_of_type_value",
    "value_quantiles_approx_check", "tfidf_top_terms",
    "doc_unigram_surprise", "doc_chunks", "embedding_int8_quantize",
    "doc_repetition_profile", "pii_scrub", "bm25_search",
    "inverted_index_postings", "weighted_sample_topk", "hybrid_search_rrf",
    "semdedup_pairs", "semdedup_recall", "token_freq_cms",
    "substring_dup_spans", "curation_clip_spans", "linear_model_confusion",
    "scd2_history", "grouping_sets_metrics",
    # -- green in r04 (driver rows in CORRECTNESS_r04.json; 45 of the 50
    #    window entries — the 5 fails are _PRIORITY bucket 1) --
    "winsorized_stats", "mad_robust", "ewma_user_value", "triangle_count",
    "column_profile", "dq_violations", "zorder_locality",
    "fuzzy_customer_pairs", "value_time_correlation", "lang_source_chi2",
    "ols_value_trend", "orders_snapshot_diff", "transpiled_position_concat",
    "bi_nation_trade_volume", "part_qty_share_threshold",
    "top_revenue_suppliers", "dominant_part_suppliers", "min_cost_supplier",
    "order_priority_check", "forecast_revenue_change", "nation_market_share",
    "product_type_profit", "returned_item_customers",
    "customer_order_distribution", "promo_revenue_share",
    "supplier_part_variety", "disjunctive_bracket_revenue",
    "image_ahash_signatures", "image_ahash_pairs",
    "audio_fingerprint_signatures", "audio_fingerprint_pairs",
    "swap_price_impact", "block_agg_daily", "region_enrichment",
    "avg_yearly_small_qty", "rich_idle_customers", "returnflag_cube",
    "order_price_histogram", "returnflag_metrics_unpivot",
    "pricing_summary", "shipping_priority", "local_supplier_volume",
    # semdedup_pairs_trained / semdedup_recall_trained: green r04, but
    # their oracle changed in r5 (_km_ctes cast fix) → _PRIORITY bucket 3
    "eip55_checksum_addresses",
    # rows-only by design (no oracle possible): keep at the tail — the
    # *_check companion carries the value evidence.  (bpe_vocab and
    # similarity_ann_ivf left this set in r4 session 2: both gained
    # exact DuckDB oracles — unrolled-CTE BPE training, full IVF
    # pipeline replication — so they re-run as "new".  Only the HLL
    # sketch query remains genuinely engine-specific.)
    "transfer_volume_hourly_approx",
}


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    new = {k: v for k, v in d.items()
           if k not in head and k not in _DRIVER_GREEN}  # new this round → next
    tail = {k: v for k, v in d.items() if k not in head and k not in new}
    return {**head, **new, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLES))
