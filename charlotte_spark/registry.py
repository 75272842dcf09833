"""Query registry — the engine's declared, oracle-checked surface.

Every operator from SURVEY.md §2 registers here as a named query with
(a) a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) the equivalent DuckDB SQL (or ``None`` for genuinely
non-SQL-expressible ops, which get a weaker rows-only check).

``__spark_entry__.py`` and the pytest oracle harness both iterate this
registry, so the local test gate is the driver's gate.

Determinism rules (SURVEY §2) enforced by convention in every entry:
- total-order ORDER BY over a unique key on both sides;
- float aggregates wrapped in round(x, 2) (or 4 for similarity scores);
- explicit NULLS FIRST/LAST everywhere a sort key is nullable;
- timestamps projected as 'yyyy-MM-dd HH:mm:ss' UTC strings;
- arrays in output joined to strings after array_sort;
- any hash used in query *logic* is a portable expression (md5-based),
  never an engine-native hash().
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over views region..embeddings; None => rows-only
    tags: tuple[str, ...] = ()  # SURVEY §2 row ids, e.g. ("D24", "R20")
    approximate: bool = False  # A-rows: error-bounded, not hash-equal


REGISTRY: dict[str, Query] = {}

# Modules that define queries; imported lazily by load_all_queries().
_QUERY_MODULES = (
    "charlotte_spark.queries.relational",
    "charlotte_spark.queries.composites",
    "charlotte_spark.queries.sources_sinks",
    "charlotte_spark.queries.joins",
    "charlotte_spark.queries.aggregates",
    "charlotte_spark.queries.windows",
    "charlotte_spark.queries.sortlimit",
    "charlotte_spark.queries.setops",
    "charlotte_spark.queries.scalar_funcs",
    "charlotte_spark.queries.udf_surface",
    "charlotte_spark.queries.dedup",
    "charlotte_spark.queries.similarity",
    "charlotte_spark.queries.textstats",
    "charlotte_spark.queries.multimodal",
    "charlotte_spark.queries.traindata",
    "charlotte_spark.queries.reshape",
    "charlotte_spark.queries.dataops",
    "charlotte_spark.queries.statsops",
    "charlotte_spark.queries.sketches",
    "charlotte_spark.queries.graph",
    "charlotte_spark.queries.eventanalytics",
    "charlotte_spark.queries.corpus_search",
    "charlotte_spark.queries.streaming_queries",
    "charlotte_spark.queries.charlotte_pipeline",
)


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    approximate: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), approximate)
        return fn

    return deco


# Explicit enumeration order for the driver contract. The driver's
# correctness gate checks the FIRST 50 entries of ``queries()`` each
# round (CORRECTNESS_r01-r03 keys == list(queries())[:50]), so insertion
# order decides which SURVEY rows get driver evidence. Round-4 rotation
# (VERDICT r03, Next-round #1): slots 1-2 confirm the two r03-red rows
# (d46 floor/ceil BIGINT oracle cast, d75 array_join output); slots 3-50
# are 48 of the 49 hash-checkable queries that have never appeared in
# any driver window — the whole D88-D115 cluster plus the dedicated
# window/scalar/dedup variants. The one deferred candidate is
# d68_topk_bruteforce (secondary variant; its SURVEY row D68 is already
# driver-green via d68_ivf_topk) — it leads the post-window tail for
# r05. Everything not listed follows in module registration order
# (all driver-green in r01-r03 already).
DRIVER_ORDER: tuple[str, ...] = (
    # -- fix confirmations (red in r03) --
    "d46_math_functions",
    "d75_embedding_quantize",
    # -- never-driver-verified hash-checkable queries --
    "r_charlotte_graceful_drain",
    "d88_pii_redaction",
    "d89_intradoc_line_dedup",
    "a90_heavy_hitters",
    "d91_pivot",
    "d91_unpivot",
    "d92_stream_stream_join",
    "d93_summary_stats",
    "a94_bloom_contamination",
    "d95_vocab_topk",
    "a96_countmin_sketch",
    "d97_pagerank",
    "d98_scd2_history",
    "d99_orc_roundtrip",
    "d100_temperature_sampling",
    "d101_shard_export",
    "d102_pca_power",
    "d103_conversion_funnel",
    "d104_cohort_retention",
    "d105_fuzzy_reconcile",
    "d106_pmi_collocations",
    "d107_inverted_index",
    "d108_sql_text_surface",
    "d109_recursive_cte",
    "d110_python_udtf",
    "d111_session_paths",
    "d112_histogram",
    "d113_chi_square",
    "d114_grouped_regression",
    "d115_ohlc_downsample",
    "d33_ranking_functions",
    "d35_running_aggregates",
    "d37_topk_per_group",
    "d38_multikey_sort",
    "d39_topk_limit",
    "d44_string_functions",
    "d45_datetime_functions",
    "d42_intersect",
    "d43_except",
    "d48_array_functions",
    "d66_simhash",
    "d66_ngram_jaccard",
    "a68_lsh_ann_topk",
    "d67_embedding_neardup",
    "d69_quality_score",
    "d69_token_count",
    "d69_fingerprint",
    "d71_language_stats",
    # ---- 50-slot window boundary ----
    # r05 candidates: the one deferred hash-checkable variant, then the
    # never-checked rows-only queries (weaker driver evidence), then the
    # r03 window (all driver-green r03) for re-confirmation.
    "d68_topk_bruteforce",
    # round-4 additions (D116-D121): local-green, first driver shot in r05
    "d116_dup_ngram_spans",
    "d117_bm25_retrieval",
    "d118_semantic_dedup",
    "d119_ewma_smoothing",
    "d120_robust_anomalies",
    "d121_snapshot_diff",
    "d122_weighted_sample",
    "d123_bigram_lm_score",
    "d124_span_removal",
    "d125_quantile_calibration",
    "d126_transform_with_state",
    "d127_text_binary_roundtrip",
    "d128_jsonl_roundtrip",
    "d129_schema_evolution",
    "d130_cidr_enrichment",
    "d131_incremental_dedup",
    "d132_skew_profile",
    "d133_equidepth_stats",
    "a134_selfjoin_size",
    "d135_distribution_windows",
    "d136_merge_upsert",
    "d137_gapfill_interpolate",
    "d138_triangle_count",
    "d139_ks_drift",
    "d140_k_anonymity",
    "d141_constraint_audit",
    "d142_zorder_layout",
    "d143_woe_iv_binning",
    "d144_ab_proportion_test",
    "d145_benford_audit",
    "d146_association_rules",
    "d147_total_reconciliation",
    "d148_seasonal_baseline",
    "d149_corrupt_quarantine",
    "d150_fd_profiling",
    "d151_touch_attribution",
    "d152_winsorize_scale",
    "d153_time_travel",
    "d154_bounce_dwell",
    "d155_growth_accounting",
    "d156_revenue_concentration",
    "d58_cid_sequencer_stream",
    "r_charlotte_rollover_hook",
    "r_charlotte_event_records",
    "d72_decode_pipeline",
    "q12_late_shipment_priority",
    "d27_grouping_sets",
    "d34_lag_lead",
    "d36_range_frame",
    "d40_hash_sample",
    "d41_union_all_distinct",
    "d42_intersect_all",
    "d43_except_all",
    "d47_conditional_null",
    "d48_explode",
    "d49_map_functions",
    "d50_json_functions",
    "d51_hash_encoding",
    "d52_ip_str_to_long",
    "d61_scalar_pandas_udf",
    "d62_apply_in_pandas",
    "d63_grouped_agg_udaf",
    "d64_udtf_explode",
    "d65_exact_dedup",
    "a66_minhash_lsh_neardup",
    "d74_neardup_clusters",
    "d67_cosine_pairwise",
    "d68_ivf_topk",
    "d69_normalize_tokenize",
    "d70_tf_idf",
    "d71_langid_heuristic",
    "d72_binary_fingerprint",
    "d73_doc_chunking",
    "d76_quality_repetition",
    "d77_stratified_sample",
    "d78_train_val_test_split",
    "d79_contamination_screen",
    "d80_sequence_packing",
    "d81_mixture_rebalance",
    "a83_hll_sketch_union",
    "d85_frame_sampling",
    "d86_kmeans",
    "d53_tumbling_window",
    "d54_sliding_window",
    "d55_session_window",
    "d56_watermark_late_drop",
    "d57_streaming_dedup",
    "d59_stream_static_join",
    "d82_custom_stateful_sessions",
    "d60_foreachbatch_upsert",
    "r_charlotte_ingest_decode",
    "r_charlotte_batch_pipeline",
    "r_charlotte_text_mode",
)

# How many leading entries of queries() the driver's correctness gate
# has historically checked; tests assert the window composition.
DRIVER_WINDOW = 50


def load_all_queries() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry,
    enumerated in driver-priority order (``DRIVER_ORDER`` first, then
    remaining queries in module registration order)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    ordered: dict[str, Query] = {}
    for name in DRIVER_ORDER:
        ordered[name] = REGISTRY[name]  # KeyError = typo in DRIVER_ORDER
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
