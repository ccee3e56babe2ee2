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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["transfer_volume_hourly"](spark, "/root/testdata/sf0.001")


# Verification priority: queries with no green driver-CORRECTNESS row yet
# (never checked in r01, or errored there) come first, so a driver that caps
# its per-round check count still gives every registered query at least one
# exact-oracle row across rounds. Already-green queries go to the tail.
_PRIORITY = [
    # -- never driver-checked in r01 --
    "priority_top_orders", "asof_price_join", "session_stats",
    "sliding_window_range_join", "stratified_sample",
    "view_purchase_attribution", "user_event_gaps", "secondary_sort_deltas",
    "bernoulli_hash_sample", "reservoir_sample_global", "avg_yearly_small_qty",
    "big_quantity_orders", "lone_late_suppliers", "rich_idle_customers",
    "order_price_quartiles", "rolling_hour_user_value", "event_type_pivot",
    "returnflag_metrics_unpivot", "returnflag_cube", "value_quantiles_by_type",
    "token_vocab_topk", "cohort_retention", "segment_name_listagg",
    "order_price_histogram", "source_numeric_profile",
    "user_click_purchase_ratio", "contamination_overlap",
    "token_shard_assignment", "curation_funnel", "dedup_clusters",
    # -- errored in r01 (events-ts loader bug, fixed this round) --
    "transfer_volume_hourly", "hour_spine_join", "event_projection",
    "rolling_var_minperiods", "rolling_var_cvar", "var_cvar_scalar",
    "distinct_counts", "summary_stats", "selector_map_lookup",
    "json_props_extract", "time_formats", "last_k_events", "routed_union",
    "transfer_volume_hourly_approx", "hourly_daily_rollup", "user_event_sets",
    # -- round-2 additions, most valuable first (decode path had no driver
    #    evidence at all before these) --
    "transfer_decode_roundtrip", "swap_decode_roundtrip",
    "rolling_var_cvar_partitioned", "multimodal_decode_real",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    new = {k: v for k, v in d.items()
           if k not in head and k not in _R01_GREEN}  # new this round → next
    tail = {k: v for k, v in d.items() if k not in head and k not in new}
    return {**head, **new, **tail}


_R01_GREEN = {
    "swap_price_impact", "block_agg_daily", "topk_parts_by_quantity",
    "region_enrichment", "order_lineitem_pairing", "block_range_scan",
    "rolling_p90", "rolling_p90_partitioned", "stress_test_table", "il_curve",
    "mev_scores", "dedup_minhash_lsh", "pricing_summary", "dedup_exact",
    "dedup_ngram_jaccard", "similarity_ann_ivf",  # rows-only recorded r01
    "dedup_simhash_signatures", "dedup_simhash_weighted", "dedup_char_jaccard",
    "dedup_simhash_pairs", "similarity_topk", "similarity_lsh_pairs",
    "text_profile", "lang_id", "doc_fingerprint", "multimodal_meta",
    "multimodal_decode_fake", "multimodal_frame_sample", "salted_group_sum",
    "dedup_embedding_cosine", "shipping_priority", "local_supplier_volume",
    "customers_without_urgent_orders", "brands_with_shipped_parts",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLES))
