"""Plan-quality invariants (SCALE.md): a change that silently degrades
a headline plan — losing pushdown, de-broadcasting a dim join, turning
a bounded BNLJ into an unbounded one — fails here, not at 100 TB.
"""

from __future__ import annotations

import pytest

from charlotte_spark.plans.audit import audit_plan
from charlotte_spark.registry import load_all_queries

REG = load_all_queries()


@pytest.fixture(scope="module")
def audits(spark, sf_dir):
    def get(name):
        return audit_plan(REG[name].fn(spark, sf_dir))

    return get


def test_q1_pushdown_and_pruning(audits):
    a = audits("q1_pricing_summary")
    li = next(s for s in a["scans"] if "lineitem" in s["path"])
    assert any("l_shipdate" in f for f in li["pushed_filters"]), (
        "shipdate filter must reach the parquet scan"
    )
    # 7 of lineitem's 16 columns — column pruning in effect
    assert len(li["read_columns"]) <= 8
    assert a["partial_aggregate"], "groupBy must have a map-side partial phase"


def test_dim_join_broadcasts(audits):
    a = audits("d15_broadcast_dim_join")
    assert a["broadcast_hash_join"], "dimension join must be a broadcast hash join"
    assert not a["nested_loop_join"]


def test_groupby_partial_agg(audits):
    assert audits("d24_groupby_multi_agg")["partial_aggregate"]


def test_asof_join_is_not_quadratic(audits):
    """D21 as-of is the union+window formulation — no nested-loop join
    may appear (that would be the quadratic range-join shape)."""
    assert not audits("d21_asof_join")["nested_loop_join"]


def test_nonequi_joins_have_bounded_side(audits, spark, sf_dir):
    """BNLJ is allowed only where one side is deliberately bounded:
    the range join (D20) and topk probes (D68) filter one input hard."""
    for name in ("d20_range_join", "d68_topk_bruteforce"):
        a = audits(name)
        if not a["nested_loop_join"]:
            continue
        bounded = any(
            s["pushed_filters"] and len(s["read_columns"]) > 0 for s in a["scans"]
        )
        assert bounded, f"{name}: BNLJ without a filtered (bounded) scan side"


def test_scan_prunes_columns_everywhere(audits):
    """Representative projection query reads only what it returns."""
    a = audits("d7_select_rename")
    for s in a["scans"]:
        assert len(s["read_columns"]) <= 6, (
            f"scan of {s['path']} reads {len(s['read_columns'])} columns"
        )
