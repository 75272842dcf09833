"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query executes fully via the noop sink (no driver-side collect), so
the measured time is scan→compute→materialize, the same work a cluster
job would do. First query run twice (JVM/codegen warmup excluded from
per-query numbers but the warmup run is reported separately).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from charlotte_spark.registry import load_all_queries
from charlotte_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one representative per operator family (kept in sync with
# charlotte_spark/queries/* as coverage widens).
HEADLINE = [
    "q1_pricing_summary",
    "d1_scan_checksum_lineitem",
    "d8_computed_projection",
    "d13_distinct",
]


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    reg = load_all_queries()
    names = [n for n in HEADLINE if n in reg]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n.strip() for n in extra.split(",") if n.strip() in reg]

    spark = get_spark("charlotte-spark-bench", cpus=CPUS)

    # warmup: run the first query once to absorb JVM/codegen startup
    warm0 = time.perf_counter()
    reg[names[0]].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    warmup = time.perf_counter() - warm0

    times: dict[str, float] = {}
    for name in names:
        runs = [_run(reg[name].fn(spark, SF_DIR)) for _ in range(3)]
        times[name] = round(sorted(runs)[1], 3)  # median of 3

    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else None
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "warmup_sec": round(warmup, 3),
        "n_queries": len(times),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
