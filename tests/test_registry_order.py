"""Registry enumeration order IS the driver contract.

The driver's correctness gate checks the first ``DRIVER_WINDOW`` entries
of ``__spark_entry__.queries()`` in insertion order (verified against
CORRECTNESS_r01/r02: keys == list(queries())[:50]), so the order is a
load-bearing artifact — these tests pin it.
"""

from __future__ import annotations

from charlotte_spark.registry import DRIVER_ORDER, DRIVER_WINDOW, load_all_queries


def test_driver_order_names_exist_and_unique():
    reg = load_all_queries()
    assert len(set(DRIVER_ORDER)) == len(DRIVER_ORDER), "duplicate in DRIVER_ORDER"
    missing = [n for n in DRIVER_ORDER if n not in reg]
    assert not missing, f"DRIVER_ORDER names not registered: {missing}"


def test_enumeration_puts_driver_order_first():
    names = list(load_all_queries())
    assert tuple(names[: len(DRIVER_ORDER)]) == DRIVER_ORDER
    # Reordering must not drop or duplicate anything.
    assert len(names) == len(set(names))


def test_window_covers_fixes_and_never_verified_rows():
    """Round-9 rotation (VERDICT r08 #1): slots 1-16 are the only
    queries with zero driver evidence (the r8 additions d165-d180,
    incl. the streaming a172 sketch) — green rows complete coverage at
    203/203 SURVEY rows; slots 17-50 refresh the 34 oldest-evidence
    queries (the r03 block) so no query's latest green ages past six
    rounds."""
    window = list(load_all_queries())[:DRIVER_WINDOW]
    # The never-driver-checked r8 additions lead the window.
    assert window[:16] == [
        "d165_char_entropy",
        "d166_containment_ratio",
        "d167_grouped_split",
        "d168_media_type_sniff",
        "d169_json_field_inventory",
        "d170_dedup_yield",
        "d171_compaction_planner",
        "a172_streaming_hll_window",
        "d173_token_budget_waterfill",
        "d174_mergeable_moments",
        "d175_embedding_dim_profile",
        "d176_minhash_calibration",
        "d177_zipf_fit",
        "d178_centroid_dispersion",
        "d179_longest_prefix_match",
        "d180_xml_roundtrip",
    ]
    # A sample of the stale-r03 refresh block must all be inside.
    for must in (
        "a66_minhash_lsh_neardup",
        "a83_hll_sketch_union",
        "d41_union_all_distinct",
        "d47_conditional_null",
        "d49_map_functions",
        "d51_hash_encoding",
        "d54_sliding_window",
        "d56_watermark_late_drop",
        "d59_stream_static_join",
        "d62_apply_in_pandas",
        "d65_exact_dedup",
        "d74_neardup_clusters",
    ):
        assert must in window, f"{must} fell out of the driver window"
    # Every window slot must be hash-checkable: the whole rows-only
    # class was retired in r7 (all 227 queries carry oracles).
    reg = load_all_queries()
    rows_only = [n for n in window if reg[n].oracle is None]
    assert not rows_only, f"rows-only slots: {rows_only}"
    # Nothing already driver-green in r06-r08 may occupy a slot.
    for stale in ("d157_url_curation", "d25_global_agg", "d15_broadcast_dim_join"):
        assert stale not in window, f"{stale} wastes a window slot"


def test_spark_entry_exposes_ordered_queries():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qnames = list(mod.queries())
    assert tuple(qnames[: len(DRIVER_ORDER)]) == DRIVER_ORDER
    # Every oracle key must name a registered query.
    assert set(mod.oracle_sql()) <= set(qnames)


def test_survey_rows_and_registry_tags_agree():
    """SURVEY.md §2 is the correctness contract the judge walks line by
    line: every R/D/A row id in the §2 tables must be claimed by at
    least one registered query's tags, and every tag a query declares
    must name a row that exists in SURVEY.md — so the inventory and the
    implementation cannot drift apart silently."""
    import pathlib
    import re

    survey = (pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    row_ids = set()
    for line in survey.splitlines():
        m = re.match(r"\|\s*([RDA]\d+)\s*\|", line)
        if m:
            row_ids.add(m.group(1))
    assert len(row_ids) > 150, f"SURVEY table parse looks broken: {len(row_ids)} rows"

    tagged = set()
    for q in load_all_queries().values():
        tagged.update(q.tags)

    unclaimed = sorted(r for r in row_ids if r not in tagged)
    assert not unclaimed, f"SURVEY rows with no registered query: {unclaimed}"
    dangling = sorted(t for t in tagged if t not in row_ids)
    assert not dangling, f"query tags naming no SURVEY row: {dangling}"
