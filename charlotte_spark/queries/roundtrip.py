"""Round-trip digest harness for queries whose inputs SQL cannot
recompute (unified2 spools, Python-side stub codecs).

The D136/D149 oracle pattern recomputes the expected answer in DuckDB
from the driver's source tables. That is impossible when the input is
a binary spool or a mapInPandas decode — so these queries materialize
their row-level output to parquet, fold it to per-group md5 digests in
Spark, and register an oracle that independently folds the SAME
parquet with DuckDB's own md5/string_agg pipeline. Two engines
aggregating the same materialized rows means a nondeterministic
pipeline, a parquet type-mapping bug, or a digest-fold bug all surface
as a driver hash mismatch — hash-grade evidence instead of a rows-only
count. The row-level SEMANTICS are still covered by the golden tests
(tests/test_charlotte.py, tests/test_multimodal.py), which compare
against straight-line reimplementations of the reference
(/root/reference/charlotte/__init__.py:463-538).

Scale note: the materialization is one map-only parquet write of the
query's own output (no extra shuffle), and the digest fold is a keyed
groupBy — the same cost class as returning the rows themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..streaming.harness import _scratch_root

RT_DIR = _scratch_root("CHARLOTTE_RT_TMP", "charlotte_rt")


def rt_path(name: str) -> str:
    return f"{RT_DIR}/rt_{name}"


def rt_oracle(name: str, group_col: str) -> str:
    """DuckDB side: fold the Spark-written parquet with DuckDB's OWN
    md5/string_agg aggregation pipeline."""
    return f"""
    SELECT {group_col},
           CAST(count(*) AS BIGINT) AS n_rows,
           md5(string_agg(payload, ',' ORDER BY payload)) AS digest
    FROM read_parquet('{rt_path(name)}/*.parquet')
    GROUP BY {group_col} ORDER BY {group_col}
    """


def rt_digest(df: DataFrame, name: str, group_col: str) -> DataFrame:
    """Spark side: materialize the row-level frame (columns:
    ``group_col`` + ``payload`` string) to parquet, read it back, and
    fold to (group, n_rows, md5-of-sorted-payloads) — the counterpart
    of ``rt_oracle(name, group_col)``."""
    out = rt_path(name)
    df.write.mode("overwrite").parquet(out)
    back = df.sparkSession.read.parquet(out)
    return (
        back.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list("payload")))).alias(
                "digest"
            ),
        )
        .orderBy(group_col)
    )
