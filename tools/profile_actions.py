"""Per-action profiler for a registry query (guide §1: measure first).

Monkeypatches every eager DataFrame action (count/collect/first/head,
DataFrameWriter.save/parquet, checkpoint) to record wall time and the
repo-side caller, then runs one query and prints the action ledger.
This attributes a multi-action query's wall time (arrival loops run
10-30 driver actions) to individual sites, which the bench's single
end-to-end number cannot do.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_actions.py <query> [runs]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, DataFrameWriter  # noqa: E402

from charlotte_spark.registry import load_all_queries  # noqa: E402
from charlotte_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEDGER: list[tuple[str, str, float]] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/charlotte_spark/" in fn or fn.endswith("bench.py"):
            return f"{os.path.relpath(fn, '/root/repo')}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        LEDGER.append((name, _caller(), time.perf_counter() - t0))
        return out

    setattr(cls, name, timed)


try:  # Spark 4: the ABC's methods are overridden by the classic class
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF
except ImportError:
    _ClassicDF = DataFrame
for m in ("count", "collect", "first", "head", "checkpoint", "localCheckpoint"):
    _wrap(_ClassicDF, m)
for m in ("save", "parquet", "orc", "json", "csv", "text"):
    _wrap(DataFrameWriter, m)


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reg = load_all_queries()
    spark = get_spark("profile-actions", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    q = reg[name]
    for r in range(runs):
        LEDGER.clear()
        t0 = time.perf_counter()
        plan_done = None
        df = q.fn(spark, SF_DIR)
        plan_done = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        if r < runs - 1:
            continue  # warm runs: discard, keep last
        print(f"\n=== {name} run {r}: total {total:.3f}s "
              f"(build-phase {plan_done - t0:.3f}s, noop {total - (plan_done - t0):.3f}s)")
        acted = 0.0
        for op, site, dt in LEDGER:
            if dt >= 0.02:
                print(f"  {dt:7.3f}s  {op:10s} {site}")
            acted += dt
        print(f"  ledger sum {acted:.3f}s over {len(LEDGER)} actions; "
              f"unattributed {total - acted:.3f}s")


if __name__ == "__main__":
    main()
