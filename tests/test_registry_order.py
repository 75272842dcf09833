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
    """Round-12 rotation (VERDICT r11 #1): slots 1-27 are the 27
    round-11 additions D188-D214 (incl. A201/A211) — the only queries
    with zero driver evidence; green rows take driver-confirmed
    coverage to 237/237 SURVEY rows. Slots 28-50 backfill with 23 of
    the 34 oldest (r07-evidence) rows: a134, d133, then d135-d155."""
    window = list(load_all_queries())[:DRIVER_WINDOW]
    # The never-driver-checked r11 additions lead the window.
    assert window[0] == "d188_bpe_merges"
    assert window[26] == "d214_hard_negative_mining"
    for must in (
        "d193_bpe_tokenize",
        "d195_cdc_chunking",
        "d200_chunk_index_loop",
        "a201_histogram_quantile_sketch",
        "a211_horvitz_thompson_total",
        "d212_cluster_chaining_audit",
    ):
        assert must in window[:27], f"{must} missing from slots 1-27"
    # The verdict-named r07 backfill.
    assert window[27:29] == ["a134_selfjoin_size", "d133_equidepth_stats"]
    for must in (
        "d135_distribution_windows",
        "d140_k_anonymity",
        "d146_association_rules",
        "d153_time_travel",
        "d155_growth_accounting",
    ):
        assert must in window[27:], f"{must} fell out of the driver window"
    # Every window slot must be hash-checkable: the whole rows-only
    # class was retired in r7 (all queries carry oracles).
    reg = load_all_queries()
    rows_only = [n for n in window if reg[n].oracle is None]
    assert not rows_only, f"rows-only slots: {rows_only}"
    # Nothing already driver-green in r08-r11 may occupy a slot.
    for stale in ("d157_url_curation", "d25_global_agg", "d165_char_entropy",
                  "d181_lsh_arrival_loop", "d88_pii_redaction",
                  "d183_curation_dag", "d33_ranking_functions",
                  "d105_fuzzy_reconcile", "q3_shipping_priority"):
        assert stale not in window, f"{stale} wastes a window slot"


def test_window_is_greedy_most_stale(tmp_path):
    """Rotation-debt schedule (VERDICT r11 #4): the driver window must
    be a greedy most-stale-first selection over driver evidence, so
    each round's rotation auto-inherits the leftovers of the previous
    one (the 11 r07-evidence rows left out of the r12 window lead the
    post-boundary list and MUST enter the r13 window).

    Invariants, computed from the committed CORRECTNESS_r*.json files:
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
    latest: dict[str, int] = {}
    for f in glob.glob(str(root / "CORRECTNESS_r*.json")):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    assert latest, "no CORRECTNESS artifacts found"

    names = list(load_all_queries())
    window, rest = names[:DRIVER_WINDOW], names[DRIVER_WINDOW:]

    out_never = [n for n in rest if n not in latest]

    in_checked = [latest[n] for n in window if n in latest]
    out_rounds = [latest[n] for n in rest if n in latest]
    if in_checked and out_rounds:
        assert max(in_checked) <= min(out_rounds), (
            "window holds a query with newer evidence than one outside it: "
            f"max(in)={max(in_checked)} > min(out)={min(out_rounds)}"
        )

    # Debt that ties with the window's stalest row must clear next round.
    stalest = max(in_checked) if in_checked else min(out_rounds)
    debt = out_never + [n for n in rest if latest.get(n, stalest + 1) <= stalest]
    assert len(debt) <= DRIVER_WINDOW, f"stale debt exceeds one window: {len(debt)}"
    # And the post-boundary list must lead with exactly that debt —
    # never-checked first — so the next rotation inherits it by taking
    # the next DRIVER_WINDOW names.
    assert rest[: len(debt)] == debt, (
        "post-boundary list does not lead with the stale leftovers: "
        f"{rest[:len(debt)]} != {debt}"
    )


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
