"""Same-host A/B bench adjudicator (VERDICT r09 #2, standing tool).

Cross-round per-query movers on this VM are usually host noise: CPU
steal swings same-code timings up to 3x between windows (BASELINE.md
r03/r04; the r7 "ingest dip" and r9 a134/d123 movers were each
adjudicated by a manual worktree A/B). This tool makes that
adjudication one command:

    python tools/bench_ab.py --ref <prev-commit> \
        --queries a134_selfjoin_size,d123_bigram_lm_score [--rounds 5]

It checks the ref out into a temporary git worktree and runs the SAME
bench subset against HEAD and the ref in interleaved A/B/B/A order
(so a drifting host penalizes both sides equally), one fresh process
per run (a second SparkSession in one JVM would reuse the first's
conf). Per side it reports the median, the in-tool CPU-steal
percentage sampled around every run, and a verdict per query:

    ratio inside [1/NOISE_BAND, NOISE_BAND]  -> "noise"
    ratio above NOISE_BAND                   -> "regression"
    ratio below 1/NOISE_BAND                 -> "improvement"

NOISE_BAND defaults to the documented 1.5x cross-window band.
Exit code 1 iff any query adjudicates "regression".
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE_BAND = 1.5


def _cpu_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        f = [int(x) for x in fh.readline().split()[1:9]]
    return sum(f), f[7]  # (total, steal)


def _run_bench(cwd: str, queries: list[str], sf_dir: str, cpus: str) -> dict:
    """One bench.py subprocess in ``cwd``; returns per-query seconds
    plus the steal%% observed across the run."""
    env = dict(os.environ)
    env.update(
        BENCH_QUERIES=",".join(queries),
        BENCH_RUNS="1",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=cpus,
    )
    env.pop("PYTHONPATH", None)  # each side imports ITS OWN charlotte_spark
    t0, s0 = _cpu_jiffies()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    t1, s1 = _cpu_jiffies()
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    parsed = json.loads(line)
    steal = 100.0 * (s1 - s0) / max(t1 - t0, 1)
    return {"queries": parsed["queries"], "steal_pct": round(steal, 2)}


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", required=True, help="git ref for the B side")
    ap.add_argument(
        "--queries",
        required=True,
        help="comma-list of registered query names (<=10: the bench "
        "summary line only carries the 10 slowest)",
    )
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    if len(queries) > 10:
        ap.error("pass <=10 queries (bench summary line carries 10 slowest)")

    sha = subprocess.run(
        ["git", "rev-parse", "--short", args.ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = f"/tmp/bench_ab_{sha}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.ref],
            cwd=REPO, check=True,
        )

    sides = {"head": REPO, "ref": wt}
    times: dict[str, dict[str, list[float]]] = {
        q: {"head": [], "ref": []} for q in queries
    }
    steals: list[float] = []
    try:
        for rnd in range(args.rounds):
            # interleave A/B then B/A so slow host windows hit both sides
            order = ["head", "ref"] if rnd % 2 == 0 else ["ref", "head"]
            for side in order:
                res = _run_bench(sides[side], queries, args.sf_dir, args.cpus)
                steals.append(res["steal_pct"])
                for q in queries:
                    times[q][side].append(res["queries"][q])
                qline = " ".join(
                    "{}={:.2f}s".format(q, res["queries"][q]) for q in queries
                )
                print(
                    f"round {rnd + 1}/{args.rounds} {side:4s}"
                    f" steal={res['steal_pct']:5.2f}% {qline}",
                    file=sys.stderr,
                )
    finally:
        if not args.keep_worktree:
            shutil.rmtree(wt, ignore_errors=True)
            subprocess.run(["git", "worktree", "prune"], cwd=REPO, check=False)

    report = {
        "ref": sha,
        "rounds": args.rounds,
        "noise_band": NOISE_BAND,
        "steal_pct_max": max(steals),
        "steal_pct_median": _median(steals),
        "queries": {},
    }
    any_regression = False
    for q in queries:
        h, r = _median(times[q]["head"]), _median(times[q]["ref"])
        ratio = h / max(r, 1e-9)
        verdict = (
            "noise"
            if 1 / NOISE_BAND <= ratio <= NOISE_BAND
            else ("regression" if ratio > NOISE_BAND else "improvement")
        )
        any_regression |= verdict == "regression"
        report["queries"][q] = {
            "head_median_sec": round(h, 3),
            "ref_median_sec": round(r, 3),
            "ratio": round(ratio, 3),
            "verdict": verdict,
            "head_runs": [round(x, 3) for x in sorted(times[q]["head"])],
            "ref_runs": [round(x, 3) for x in sorted(times[q]["ref"])],
        }
    print(json.dumps(report, indent=1, sort_keys=True))
    return 1 if any_regression else 0


if __name__ == "__main__":
    sys.exit(main())
