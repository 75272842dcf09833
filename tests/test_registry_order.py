"""Registry enumeration order IS the driver contract.

The driver's correctness gate checks the first ``DRIVER_WINDOW`` entries
of ``__spark_entry__.queries()`` in insertion order (verified against
CORRECTNESS_r01/r02: keys == list(queries())[:50]), so the order is a
load-bearing artifact — these tests pin it.
"""

from __future__ import annotations

from charlotte_spark.registry import DRIVER_ORDER, DRIVER_WINDOW, load_all_queries


def test_driver_order_names_exist_and_unique():
    reg = load_all_queries()
    assert len(set(DRIVER_ORDER)) == len(DRIVER_ORDER), "duplicate in DRIVER_ORDER"
    missing = [n for n in DRIVER_ORDER if n not in reg]
    assert not missing, f"DRIVER_ORDER names not registered: {missing}"


def test_enumeration_puts_driver_order_first():
    names = list(load_all_queries())
    assert tuple(names[: len(DRIVER_ORDER)]) == DRIVER_ORDER
    # Reordering must not drop or duplicate anything.
    assert len(names) == len(set(names))


def test_window_covers_fixes_and_never_verified_rows():
    """Round-14 rotation (VERDICT r13 #1): slots 1-9 are the nine r13
    additions (never driver-checked), slots 10-21 the 12 r08-evidence
    leftovers the r13 window could not fit, slots 22-50 the 29 oldest
    r09-evidence rows. Green rows take driver-confirmed coverage to
    247/247 SURVEY rows with no evidence older than r9."""
    window = list(load_all_queries())[:DRIVER_WINDOW]
    # The nine never-driver-checked r13 additions occupy slots 1-9.
    assert window[:9] == [
        "d216_dp_noisy_release",
        "d217_tokenizer_fertility",
        "d218_salt_planner",
        "d219_hilbert_layout",
        "d220_nn_similarity_histogram",
        "d221_token_bucket_throttle",
        "d222_quality_survivor_policy",
        "d223_decayed_heavy_hitters",
        "a224_join_size_estimate",
    ]
    # The 12 r08-evidence leftovers occupy slots 10-21.
    for must in (
        "d19_cross_join",
        "d20_range_join",
        "d21_asof_join",
        "d22_interval_join",
        "d23_self_join",
        "d24_groupby_multi_agg",
        "d84_bucketed_colocated_join",
        "d87_salted_skew_join",
        "q1_pricing_summary",
        "q2_min_cost_supplier",
        "q9_product_type_profit",
        "q21_waiting_supplier",
    ):
        assert must in window[9:21], f"{must} missing from slots 10-21"
    # r09-evidence backfill fills slots 22-50.
    for must in (
        "d165_char_entropy",
        "a66_minhash_lsh_neardup",
        "a83_hll_sketch_union",
        "d50_json_functions",
    ):
        assert must in window[21:], f"{must} fell out of the driver window"
    # Every window slot must be hash-checkable: the whole rows-only
    # class was retired in r7 (all queries carry oracles).
    reg = load_all_queries()
    rows_only = [n for n in window if reg[n].oracle is None]
    assert not rows_only, f"rows-only slots: {rows_only}"
    # Nothing already driver-green in r10-r13 may occupy a slot.
    for stale in ("d215_semantic_dedup_arrival", "d181_lsh_arrival_loop",
                  "d88_pii_redaction", "d183_curation_dag",
                  "d33_ranking_functions", "d105_fuzzy_reconcile",
                  "q3_shipping_priority", "d188_bpe_merges",
                  "d212_cluster_chaining_audit", "a134_selfjoin_size",
                  "d156_revenue_concentration", "a160_hll_intersection",
                  "d14_inner_equijoin"):
        assert stale not in window, f"{stale} wastes a window slot"


def _rotation_violations(
    window: list[str], rest: list[str], latest: dict[str, int]
) -> list[str]:
    """Greedy most-stale rotation invariants over driver evidence.

    Returns a list of violation strings (empty = window is a valid
    greedy most-stale selection and the post-boundary list leads with
    exactly the one-window leftover debt, never-checked rows first).
    Pure function so both round phases can be unit-tested directly
    (VERDICT r12 #2).
    """
    violations: list[str] = []
    out_never = [n for n in rest if n not in latest]

    in_checked = [latest[n] for n in window if n in latest]
    out_rounds = [latest[n] for n in rest if n in latest]
    if in_checked and out_rounds and max(in_checked) > min(out_rounds):
        violations.append(
            "window holds a query with newer evidence than one outside it: "
            f"max(in)={max(in_checked)} > min(out)={min(out_rounds)}"
        )

    # Debt that ties with the window's stalest row must clear next round.
    stalest = max(in_checked) if in_checked else (
        min(out_rounds) if out_rounds else 0
    )
    debt = out_never + [n for n in rest if latest.get(n, stalest + 1) <= stalest]
    if len(debt) > len(window):
        violations.append(f"stale debt exceeds one window: {len(debt)}")
    # The post-boundary list must lead with exactly that debt —
    # never-checked first — so the next rotation inherits it by taking
    # the next DRIVER_WINDOW names.
    elif rest[: len(debt)] != debt:
        violations.append(
            "post-boundary list does not lead with the stale leftovers: "
            f"{rest[:len(debt)]} != {debt}"
        )
    return violations


def _commit_time_evidence(
    window: list[str], per_round: dict[int, set[str]]
) -> dict[str, int]:
    """Latest evidence round per query AS OF window-commit time.

    The greedy most-stale invariant is only satisfiable at round START:
    the moment the driver writes this round's CORRECTNESS artifact, the
    still-current window "holds newer evidence than the leftovers
    outside it" by construction (VERDICT r12 "What's wrong" #1 — the
    test went red at the end of every round). Phase detection: every
    TRAILING artifact whose key set equals the current window is a
    post-commit run OF this window — staleness is evaluated against
    the rounds strictly before the first of them (the pre-run state
    the rotation was committed under). Trailing plural (r16): the
    window is frozen across OPTIMIZATION rounds — rotating it would
    change the driver's checked set, which those rounds' rules forbid —
    so one window legitimately accumulates several consecutive
    artifacts (r14 + r15 here); the r14-era newest-only rule
    misclassified the second one as aging evidence and went red at r16
    start with no registry change at all.
    """
    if not per_round:
        return {}
    rounds = sorted(per_round)
    while rounds and per_round[rounds[-1]] == set(window):
        rounds.pop()
    latest: dict[str, int] = {}
    for rnd in rounds:
        for k in per_round[rnd]:
            latest[k] = max(latest.get(k, 0), rnd)
    return latest


def test_window_is_greedy_most_stale():
    """Rotation-debt schedule (VERDICT r11 #4): the driver window must
    be a greedy most-stale-first selection over driver evidence, so
    each round's rotation auto-inherits the leftovers of the previous
    one (the 12 r08-evidence rows left out of the r13 window lead the
    post-boundary list and MUST enter the r14 window).

    Invariants, computed from the committed CORRECTNESS_r*.json files
    at WINDOW-COMMIT time (see _commit_time_evidence — this round's own
    driver artifact must not age the rows outside the window):
      1. every never-driver-checked query is inside the window OR leads
         the post-boundary list (a row added mid-round, AFTER the
         window was committed to clearing older debt — it has no
         evidence, so it is the stalest debt and must be inherited
         first);
      2. no out-of-window CHECKED query is STALER than any in-window
         checked query (greedy selection — ties may fall either side);
      3. the out-of-window stale debt (never-checked rows first, then
         checked rows tying the window's stalest) fits in ONE future
         window and is exactly the post-boundary prefix, so no query's
         evidence can age more than one extra rotation.
    """
    import glob
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    per_round: dict[int, set[str]] = {}
    for f in glob.glob(str(root / "CORRECTNESS_r*.json")):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        per_round[rnd] = set(json.load(open(f)))
    assert per_round, "no CORRECTNESS artifacts found"

    names = list(load_all_queries())
    window, rest = names[:DRIVER_WINDOW], names[DRIVER_WINDOW:]
    latest = _commit_time_evidence(window, per_round)
    assert latest, "no pre-window CORRECTNESS evidence found"
    violations = _rotation_violations(window, rest, latest)
    assert not violations, "; ".join(violations)


def test_rotation_invariants_round_start_phase():
    """Unit case, round-start phase (VERDICT r12 #2): the newest
    artifact covers the PREVIOUS window, so all evidence counts — and a
    window that skips stale debt is still caught."""
    per_round = {1: {"a", "b"}, 2: {"c", "d"}}
    window = ["a", "b"]  # r1 evidence: the stalest rows — valid greedy
    rest = ["c", "d"]
    latest = _commit_time_evidence(window, per_round)
    assert latest == {"a": 1, "b": 1, "c": 2, "d": 2}
    assert _rotation_violations(window, rest, latest) == []
    # A window occupying a slot with r2 evidence while an r1 row waits
    # outside is NOT greedy most-stale.
    bad_window, bad_rest = ["a", "c"], ["b", "d"]
    latest = _commit_time_evidence(bad_window, per_round)
    assert _rotation_violations(bad_window, bad_rest, latest)


def test_rotation_invariants_round_end_phase():
    """Unit case, round-end phase (VERDICT r12 #2): the newest artifact
    IS the current window, so staleness is evaluated pre-run — the
    just-verified window must not read as newer than the leftovers, but
    a window that genuinely skipped stale debt still fails."""
    # Window {a,b} held r1 evidence at commit time; the driver then
    # wrote round-3 evidence for exactly that window.
    per_round = {1: {"a", "b"}, 2: {"c", "d"}, 3: {"a", "b"}}
    window, rest = ["a", "b"], ["c", "d"]
    latest = _commit_time_evidence(window, per_round)
    assert latest == {"a": 1, "b": 1, "c": 2, "d": 2}, (
        "round-3 evidence must be excluded: it postdates window commit"
    )
    assert _rotation_violations(window, rest, latest) == []
    # Same phase, but the committed window had skipped the stale row
    # "b" (r1) in favour of "c" (r2): still a violation after the
    # phase correction.
    per_round_bad = {1: {"a", "b"}, 2: {"c", "d"}, 3: {"a", "c"}}
    bad_window, bad_rest = ["a", "c"], ["b", "d"]
    latest = _commit_time_evidence(bad_window, per_round_bad)
    assert latest == {"a": 1, "b": 1, "c": 2, "d": 2}
    assert _rotation_violations(bad_window, bad_rest, latest)
    # Never-checked rows must lead the post-boundary list even in the
    # end phase (a row added mid-round, e.g. d215 at r12): "c" is a
    # checked row tying the window's stalest tier, "x" has no evidence.
    per_round_new = {1: {"a", "b", "c"}, 2: {"a", "b"}}
    window2, rest2 = ["a", "b"], ["x", "c"]  # x never checked, leads
    latest2 = _commit_time_evidence(window2, per_round_new)
    assert latest2 == {"a": 1, "b": 1, "c": 1}
    assert _rotation_violations(window2, rest2, latest2) == []
    rest2_bad = ["c", "x"]  # never-checked row NOT leading
    assert _rotation_violations(window2, rest2_bad, latest2)


def test_spark_entry_exposes_ordered_queries():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qnames = list(mod.queries())
    assert tuple(qnames[: len(DRIVER_ORDER)]) == DRIVER_ORDER
    # Every oracle key must name a registered query.
    assert set(mod.oracle_sql()) <= set(qnames)


def test_survey_rows_and_registry_tags_agree():
    """SURVEY.md §2 is the correctness contract the judge walks line by
    line: every R/D/A row id in the §2 tables must be claimed by at
    least one registered query's tags, and every tag a query declares
    must name a row that exists in SURVEY.md — so the inventory and the
    implementation cannot drift apart silently."""
    import pathlib
    import re

    survey = (pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    row_ids = set()
    for line in survey.splitlines():
        m = re.match(r"\|\s*([RDA]\d+)\s*\|", line)
        if m:
            row_ids.add(m.group(1))
    assert len(row_ids) > 150, f"SURVEY table parse looks broken: {len(row_ids)} rows"

    tagged = set()
    for q in load_all_queries().values():
        tagged.update(q.tags)

    unclaimed = sorted(r for r in row_ids if r not in tagged)
    assert not unclaimed, f"SURVEY rows with no registered query: {unclaimed}"
    dangling = sorted(t for t in tagged if t not in row_ids)
    assert not dangling, f"query tags naming no SURVEY row: {dangling}"
