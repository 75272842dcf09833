"""Hot-reloadable dimension maps (R13-R15).

The reference's ``Maps`` class parses sid-msg.map / gen-msg.map /
classification.config with mtime-based reload
(/root/reference/charlotte/__init__.py:155-211). Our equivalents: the
same text formats parsed into small DataFrames, re-read each micro
batch inside foreachBatch (they are KBs — re-reading is cheaper than
invalidation bookkeeping) and broadcast into the enrichment join.

File formats (public snort conventions):
- sig map:   ``sid || msg [|| ref ...]``          (sid-msg.map)
- gen map:   ``gid || alert_id || msg``           (gen-msg.map, merged)
- class map: ``config classification: name,desc,priority`` (classification.config)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CLASS_MAP, SIG_MAP
from ..session import local_df


def parse_sig_map_lines(lines, gid_default: int = 1):
    rows = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split("||")]
        if len(parts) < 2:
            continue
        rows.append((gid_default, int(parts[0]), 1, 0, 0, parts[1]))
    return rows


def parse_gen_map_lines(lines):
    rows = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split("||")]
        if len(parts) < 3:
            continue
        rows.append((int(parts[0]), int(parts[1]), 1, 0, 0, parts[2]))
    return rows


def parse_class_map_lines(lines):
    rows = []
    classid = 0
    for line in lines:
        line = line.strip()
        if not line.startswith("config classification:"):
            continue
        classid += 1
        body = line.split(":", 1)[1].strip()
        name = body.split(",")[0].strip()
        rows.append((classid, name))
    return rows


def load_maps(
    spark: SparkSession,
    sig_map_path: str | None,
    gen_map_path: str | None,
    class_map_path: str | None,
) -> tuple[DataFrame, DataFrame]:
    """(sig_map_df, class_map_df) — called per batch (R15 reload)."""
    sig_rows = []
    if sig_map_path and os.path.exists(sig_map_path):
        with open(sig_map_path) as f:
            sig_rows += parse_sig_map_lines(f)
    if gen_map_path and os.path.exists(gen_map_path):
        with open(gen_map_path) as f:
            sig_rows += parse_gen_map_lines(f)
    class_rows = []
    if class_map_path and os.path.exists(class_map_path):
        with open(class_map_path) as f:
            class_rows = parse_class_map_lines(f)
    sig_df = local_df(spark, sig_rows, SIG_MAP)
    class_df = local_df(spark, class_rows, CLASS_MAP)
    return sig_df, class_df
