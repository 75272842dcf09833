"""Physical-plan auditing (SURVEY §4.2/§4.3, SCALE.md evidence).

Catalyst owns optimization (zero custom rules — SURVEY §4.2); this
module makes the *properties we rely on at 100 TB* assertable:
predicate pushdown reached the scan, column pruning narrowed the
ReadSchema, dimension joins broadcast, aggregates have a partial
(map-side) phase, and nested-loop joins only appear where an input is
deliberately bounded. tests/test_plans.py pins these per headline
query so a regression that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(df: DataFrame) -> dict:
    """Extract the scale-relevant facts from a physical plan."""
    p = formatted_plan(df)
    scans = []
    # formatted explain prints one block per scan node; parse each block
    for seg in re.split(r"\(\d+\) ", p):
        if not seg.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location: \S+ \[file:([^\]]+)\]", seg)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", seg)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", seg)
        scans.append(
            {
                "path": loc.group(1) if loc else "",
                "pushed_filters": [
                    f.strip()
                    for f in (pushed.group(1) if pushed else "").split(",")
                    if f.strip()
                ],
                "read_columns": [
                    c.split(":")[0].strip()
                    for c in (schema.group(1) if schema else "").split(",")
                    if c.strip()
                ],
            }
        )
    return {
        "scans": scans,
        "broadcast_hash_join": "BroadcastHashJoin" in p,
        "sort_merge_join": "SortMergeJoin" in p,
        "shuffled_hash_join": "ShuffledHashJoin" in p,
        "nested_loop_join": "BroadcastNestedLoopJoin" in p
        or "CartesianProduct" in p,
        "partial_aggregate": bool(
            re.search(r"HashAggregate.*?Functions \[\d+\]: \[partial_", p, re.S)
        ),
        "n_exchanges": len(re.findall(r"\bExchange\b|\(Exchange", p)),
        "plan": p,
    }
