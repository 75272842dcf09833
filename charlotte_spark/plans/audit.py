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


def _top_level_brackets(s: str) -> list[str]:
    """Split ``[a], [b, [c]], [d]`` into top-level bracket groups."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def extract_windows(plan: str) -> list[dict]:
    """Window (WindowExec) nodes with their partition spec.

    An unpartitioned Window moves ALL input rows to one partition — the
    class of plan that silently stops scaling (VERDICT r13 missing #3).
    The formatted node prints ``Arguments: [fns], [partition], [order]``
    with empty specs OMITTED, so two bracket groups are ambiguous:
    ``[fns], [order]`` (unpartitioned, the hazard) vs ``[fns],
    [partition]`` (partitioned, no order — the w_all whole-group fold).
    Order specs always carry a sort direction (``x ASC NULLS FIRST``),
    partition specs never do — that token disambiguates. AQE prints
    cached subtrees twice; callers interested in the *set* of window
    shapes should dedupe (the audit reports distinct specs).
    """
    out, seen = [], set()
    # Split at LINE-START node headers only: "(N) " also occurs inside
    # expressions ("count(1) windowspecdefinition(...)"), which would
    # truncate the Arguments line mid-function.
    for seg in re.split(r"(?m)^\(\d+\) ", plan):
        head = seg.split("\n", 1)[0].strip()
        # "Window" / "Window [codegen id : N]" — but not WindowGroupLimit
        # (a rank-limit pushdown helper, bounded by construction).
        if not head.split()[:1] == ["Window"]:
            continue
        m = re.search(r"Arguments: (.*)", seg)
        if not m:
            continue
        groups = _top_level_brackets(m.group(1))

        def _is_order_spec(g: str) -> bool:
            return bool(re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)", g))

        if len(groups) >= 3:
            part_group = groups[1]
        elif len(groups) == 2 and not _is_order_spec(groups[1]):
            part_group = groups[1]  # partitioned, no order (w_all fold)
        else:
            part_group = ""
        partition_cols = [
            re.sub(r"#\d+L?", "", c).strip()
            for c in part_group.split(",")
            if c.strip()
        ]
        key = (groups[0] if groups else "", tuple(partition_cols))
        if key in seen:
            continue
        seen.add(key)
        fns_full = groups[0] if groups else ""
        out.append(
            {
                "functions": fns_full[:120],
                # classified on the UNTRUNCATED string (ADVICE r14): a
                # long function list whose _pid reference falls past the
                # 120-char display cut must still read as a prefix fold
                "is_prefix": "_pid" in fns_full,
                "partition_cols": partition_cols,
                "partitioned": bool(partition_cols),
            }
        )
    return out


def audit_plan(df: DataFrame) -> dict:
    """Extract the scale-relevant facts from a physical plan."""
    p = formatted_plan(df)
    windows = extract_windows(p)
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
        "windows": windows,
        "n_unpartitioned_windows": sum(
            1 for w in windows if not w["partitioned"]
        ),
        "n_exchanges": len(re.findall(r"\bExchange\b|\(Exchange", p)),
        "plan": p,
    }
