"""Same-host A/B bench adjudicator (VERDICT r09 #2, standing tool).

Cross-round per-query movers on this VM are usually host noise: CPU
steal swings same-code timings up to 3x between windows (BASELINE.md
r03/r04; the r7 "ingest dip" and r9 a134/d123 movers were each
adjudicated by a manual worktree A/B). This tool makes that
adjudication one command:

    python tools/bench_ab.py --ref <prev-commit> \
        --queries a134_selfjoin_size,d123_bigram_lm_score [--rounds 5]

Auto mode (VERDICT r10 #6) selects the movers itself from two
BENCH_DETAIL-format artifacts — every common-subset query whose
cross-round ratio leaves the noise band AND whose absolute delta
clears the fixed-stage floor (movers whose whole swing is < MIN_DELTA
seconds are sub-stage-latency jitter at sf0.1, not adjudicable):

    python tools/bench_ab.py --ref <prev-commit> \
        --auto-from OLD_BENCH_DETAIL.json [--new-bench BENCH_DETAIL.json]

Auto mode always emits a report with an ``auto_selected`` section
(possibly empty movers) so every round's artifact records that the
adjudication RAN, not just what it found. ORDERING (VERDICT r13 #3):
run auto mode only AFTER the round's final full bench has promoted
BENCH_DETAIL.json (bench.py prints ``detail_promoted`` per run); the
section stamps the new-side blob's sha256 so a select-before-promote
violation is detectable against the committed detail.

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
# Movers must also clear this absolute cross-round delta: at sf0.1 the
# per-action fixed stage latency is ~0.3-0.8 s, so a 1.5x ratio on a
# 0.4 s query is stage jitter, not a plan change (BASELINE.md).
MIN_DELTA_SEC = 0.25
MAX_AUTO_MOVERS = 10


def _cpu_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        f = [int(x) for x in fh.readline().split()[1:9]]
    return sum(f), f[7]  # (total, steal)


def _registered_names() -> set[str]:
    """HEAD-side registry names (fail-fast validation, ADVICE r10 #3)."""
    sys.path.insert(0, REPO)
    try:
        from charlotte_spark.registry import load_all_queries

        return set(load_all_queries())
    finally:
        sys.path.pop(0)


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
    missing = [q for q in queries if q not in parsed["queries"]]
    if missing:
        # A side whose registry predates a query silently drops it from
        # the subset filter; surface that as the actual failure instead
        # of a KeyError after paying for more rounds (ADVICE r10 #3).
        raise SystemExit(
            f"bench in {cwd} did not run {missing} — not registered on that side"
        )
    steal = 100.0 * (s1 - s0) / max(t1 - t0, 1)
    return {"queries": parsed["queries"], "steal_pct": round(steal, 2)}


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _auto_select(old_detail: str, new_detail: str) -> tuple[list[str], dict]:
    """Movers = common-subset queries beyond the noise band AND the
    absolute-delta floor, largest swing first, capped (with the cap
    spill recorded — no silent truncation)."""
    with open(old_detail) as fh:
        old = json.load(fh)["queries"]
    with open(new_detail) as fh:
        new = json.load(fh)["queries"]
    common = sorted(set(old) & set(new))
    movers = []
    for q in common:
        o, n = float(old[q]), float(new[q])
        ratio = n / max(o, 1e-9)
        if (ratio > NOISE_BAND or ratio < 1 / NOISE_BAND) and abs(n - o) >= MIN_DELTA_SEC:
            movers.append((abs(n - o), q, round(ratio, 3), o, n))
    movers.sort(reverse=True)
    selected = [q for _, q, _, _, _ in movers[:MAX_AUTO_MOVERS]]
    # Stamp WHICH new-side blob was adjudicated (VERDICT r13 #3): in
    # r13 the auto-select ran before the round's final bench promoted a
    # fresh BENCH_DETAIL.json, so a mover introduced by that refresh
    # (a83) skipped adjudication unnoticed. The sha makes any
    # select-then-promote ordering violation visible after the fact:
    # compare it against the committed detail's hash.
    import hashlib

    with open(new_detail, "rb") as fh:
        new_sha = hashlib.sha256(fh.read()).hexdigest()[:16]
    section = {
        "band": NOISE_BAND,
        "min_delta_sec": MIN_DELTA_SEC,
        "new_bench_path": os.path.basename(new_detail),
        "new_bench_sha256": new_sha,
        "common_subset": len(common),
        "movers": [
            {"query": q, "ratio": r, "old_sec": o, "new_sec": n}
            for _, q, r, o, n in movers
        ],
        "selected": selected,
        "dropped_over_cap": [q for _, q, _, _, _ in movers[MAX_AUTO_MOVERS:]],
    }
    return selected, section


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", required=True, help="git ref for the B side")
    ap.add_argument(
        "--queries",
        help="comma-list of registered query names (<=10: the bench "
        "summary line only carries the 10 slowest)",
    )
    ap.add_argument(
        "--auto-from",
        metavar="OLD_BENCH_DETAIL",
        help="auto-select movers vs this previous-round BENCH_DETAIL "
        "(VERDICT r10 #6); mutually additive with --queries",
    )
    ap.add_argument(
        "--new-bench",
        default=os.path.join(REPO, "BENCH_DETAIL.json"),
        help="current-round BENCH_DETAIL for auto mode (default: repo's)",
    )
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    queries = [q.strip() for q in (args.queries or "").split(",") if q.strip()]
    auto_section = None
    if args.auto_from:
        auto, auto_section = _auto_select(args.auto_from, args.new_bench)
        queries = list(dict.fromkeys(queries + auto))
    if not queries and auto_section is None:
        ap.error("pass --queries and/or --auto-from")
    # Fail fast on misspelled names BEFORE paying for a bench run:
    # bench.py's subset filter silently drops unknown names, which used
    # to surface as a bare KeyError after the first run (ADVICE r10 #3).
    unknown = sorted(set(queries) - _registered_names())
    if unknown:
        ap.error(f"unknown query names (not in the HEAD registry): {unknown}")
    if len(queries) > 10:
        ap.error("pass <=10 queries (bench summary line carries 10 slowest)")

    sha = subprocess.run(
        ["git", "rev-parse", "--short", args.ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()

    report = {
        "ref": sha,
        "rounds": args.rounds,
        "noise_band": NOISE_BAND,
        "queries": {},
    }
    if auto_section is not None:
        report["auto_selected"] = auto_section

    if not queries:  # auto mode found nothing to adjudicate — still report
        report.update(steal_pct_max=None, steal_pct_median=None)
        print(json.dumps(report, indent=1, sort_keys=True))
        return 0

    wt = f"/tmp/bench_ab_{sha}"
    if not os.path.isdir(wt):
        # capture: git prints "HEAD is now at ..." on stdout, which would
        # corrupt the JSON report when the tool's output is redirected
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.ref],
            cwd=REPO, check=True, capture_output=True,
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

    report["steal_pct_max"] = max(steals)
    report["steal_pct_median"] = _median(steals)
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
