"""Measured BATCH-COUNT scaling for the d182 restart choreography.

VERDICT r13 #6: d182's bench cost is deliberate stream-restart
choreography (crash between sink commit and checkpoint commit, resume,
exactly-once audit) — fixed-stage floored at sf0.1, so its scaling
story was unmeasured. Two axes:

1. RUN axis: wall time of an uninterrupted availableNow streaming run
   (one spool file per micro-batch) vs the number of micro-batches —
   expected exponent <= ~1.0 (per-batch apply cost is constant; the
   stream-start fixed cost pulls the fit BELOW 1).
2. RESUME axis (the state-invariance flag): crash after all but two
   files have applied, then time ONLY the recovery segment — the
   re-delivered batch (ledger skip) plus the two remaining files.
   Recovery reads the checkpoint offsets and the O(sensors) sequencer
   state, NOT the applied history, so the expected exponent vs total
   pre-crash batches is ~0. A recovery that replays or re-scans
   history would show ~1.0 and fail the bound.

The per-batch ledger (one applied-batch marker row per micro-batch) is
the one O(batches) structure; it is probed by batch_id equality, never
scanned, which is what the flat resume fit demonstrates.

Usage: python tools/scale_restart.py [runs_per_point]
Writes one JSON line; merged into SCALE_TREND_r{N}.json by the round
workflow (key "restart").
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from charlotte_spark.queries.charlotte_pipeline import (  # noqa: E402
    _fresh_db,
    u2_fixture,
)
from charlotte_spark.session import get_spark  # noqa: E402
from charlotte_spark.sources.u2_spark import read_spools  # noqa: E402
from charlotte_spark.streaming.maps import load_maps  # noqa: E402
from charlotte_spark.streaming.snorby import apply_batch, enrich  # noqa: E402

N_FILES_SCALES = (4, 8, 16)  # total micro-batches = 2n - 1 per point
EVENTS_PER_FILE = 40
RUN_EXP_BOUND = 1.35    # same wobble band as the other scale tools
RESUME_EXP_BOUND = 0.5  # invariance: recovery must not scale with history


def _fit(xs, ys) -> float:
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    return sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
        (a - mx) ** 2 for a in lx
    )


def _stream(spark, fx, db, ckpt, sink_wrap=None):
    """One availableNow pass, one spool file per micro-batch."""
    alerts = read_spools(
        spark, fx["spools"], streaming=True, max_files_per_trigger=1
    )

    def sink(batch_df, batch_id):
        sig_map, class_map = load_maps(
            spark, fx["sig_map"], fx["gen_map"], fx["class_map"]
        )
        apply_batch(db, enrich(batch_df, sig_map, class_map), batch_id)

    q = (
        alerts.writeStream.foreachBatch(sink_wrap(sink) if sink_wrap else sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run(runs_per_point: int = 2) -> dict:
    spark = get_spark("charlotte-scale-restart")
    spark.sparkContext.setLogLevel("ERROR")

    full_sec: dict[str, float] = {}
    resume_sec: dict[str, float] = {}
    batches: dict[str, int] = {}
    for n in N_FILES_SCALES:
        fx = u2_fixture(n_files=n, events_per_file=EVENTS_PER_FILE)
        total = n + max(1, n - 1)  # sensor_a + sensor_b files
        batches[str(n)] = total

        best_full = math.inf
        best_resume = math.inf
        for r in range(runs_per_point):
            # -------- RUN axis: uninterrupted pass --------
            db = _fresh_db(spark, f"scale_restart_full_{n}_{r}")
            ckpt = f"{db.path}_ckpt"
            shutil.rmtree(ckpt, ignore_errors=True)
            t0 = time.time()
            _stream(spark, fx, db, ckpt)
            best_full = min(best_full, time.time() - t0)
            shutil.rmtree(db.path, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

            # -------- RESUME axis: crash late, time recovery --------
            db = _fresh_db(spark, f"scale_restart_crash_{n}_{r}")
            ckpt = f"{db.path}_ckpt"
            shutil.rmtree(ckpt, ignore_errors=True)
            applied = {"n": 0}
            crash_after = total - 2  # history grows with n; tail is fixed

            def wrap(sink):
                def crashing(batch_df, batch_id):
                    sink(batch_df, batch_id)
                    applied["n"] += 1
                    if applied["n"] == crash_after:
                        # after apply+ledger commit, before checkpoint
                        # commit: the d182 crash point
                        raise RuntimeError("injected crash after commit")

                return crashing

            # the fired flag lives OUTSIDE the try so the "did not
            # fire" failure cannot be swallowed by the except arm's own
            # sentinel match (ADVICE r14)
            fired = False
            try:
                _stream(spark, fx, db, ckpt, sink_wrap=wrap)
            except Exception as e:
                if "injected crash" not in str(e):
                    raise
                fired = True
            if not fired:
                raise AssertionError("injected crash did not fire")
            t0 = time.time()
            _stream(spark, fx, db, ckpt)  # re-delivery skip + 2 files
            best_resume = min(best_resume, time.time() - t0)
            shutil.rmtree(db.path, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

        full_sec[str(n)] = round(best_full, 3)
        resume_sec[str(n)] = round(best_resume, 3)

    xs = [batches[str(n)] for n in N_FILES_SCALES]
    run_exp = round(_fit(xs, [full_sec[str(n)] for n in N_FILES_SCALES]), 3)
    resume_exp = round(_fit(xs, [resume_sec[str(n)] for n in N_FILES_SCALES]), 3)
    report = {
        "metric": "scale_trend_restart",
        "events_per_file": EVENTS_PER_FILE,
        "runs_per_point": runs_per_point,
        "n_files_scales": list(N_FILES_SCALES),
        "micro_batches": batches,
        "queries": {
            "d182_restart_exactly_once": {
                "round": "availableNow pass, 1 spool file per micro-batch;"
                         " resume = crash at batches-2, time recovery only",
                "full_run_sec": full_sec,
                "run_exponent": run_exp,
                "resume_sec": resume_sec,
                "resume_exponent": resume_exp,
                "state_invariant": resume_exp <= RESUME_EXP_BOUND,
            }
        },
        "run_bound": RUN_EXP_BOUND,
        "resume_bound": RESUME_EXP_BOUND,
    }
    assert run_exp <= RUN_EXP_BOUND, f"super-linear batch-count axis: {report}"
    assert resume_exp <= RESUME_EXP_BOUND, (
        f"recovery cost scales with history: {report}"
    )
    return report


if __name__ == "__main__":
    print(json.dumps(run(int(sys.argv[1]) if len(sys.argv) > 1 else 2)))
