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
    window = list(load_all_queries())[:DRIVER_WINDOW]
    # The two previously-red rows must be retried first.
    assert window[0] == "q12_late_shipment_priority"
    assert window[1] == "d27_grouping_sets"
    # The window must reach the streaming + LLM-data surface that has
    # never had a driver row (VERDICT r02, Next-round #1).
    for must in (
        "d53_tumbling_window",
        "d82_custom_stateful_sessions",
        "d65_exact_dedup",
        "a66_minhash_lsh_neardup",
        "d86_kmeans",
        "r_charlotte_batch_pipeline",
    ):
        assert must in window, f"{must} fell out of the driver window"


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
