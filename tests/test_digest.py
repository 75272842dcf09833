"""Unit tests for the shared two-level bucketed digest
(charlotte_spark/functions/digest.py) — the D157 fold factored into the
round-trip family (VERDICT r08 #2). The six production call sites are
covered end-to-end by test_oracle.py; these tests pin the helper's edge
semantics the corpora don't exercise: NULL payloads, all-NULL groups,
duplicate payloads, and the global (no group) fold.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from charlotte_spark.functions.digest import sql_two_level_digest, two_level_digest


@pytest.fixture(scope="module")
def duck_mixed():
    rows = (
        [("a", "x1"), ("a", None), ("b", None), ("b", None), ("a", "x1")]
        + [("a", f"p{i}") for i in range(40)]
        + [("c", f"q{i % 7}") for i in range(30)]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, payload VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    yield rows, con
    con.close()


def test_grouped_digest_matches_duckdb_with_nulls(spark, duck_mixed):
    """NULL payloads are counted but not digested in BOTH engines, and a
    group whose payloads are all NULL ('b') yields a NULL digest in
    both (the explicit when(size=0) guard mirrors DuckDB's
    md5(string_agg(...)) -> NULL on empty input)."""
    rows, con = duck_mixed
    df = spark.createDataFrame(rows, "g string, payload string")
    got = [
        (r["g"], r["n_rows"], r["digest"])
        for r in two_level_digest(df, ["g"], F.col("payload")).collect()
    ]
    want = con.execute(sql_two_level_digest("t", ["g"], "payload")).fetchall()
    assert got == want
    by_g = dict((g, (n, d)) for g, n, d in got)
    assert by_g["b"] == (2, None), "all-NULL group must count rows, digest NULL"
    assert by_g["a"][0] == 43, "NULL and duplicate payloads must both be counted"


def test_global_digest_and_sums_match_duckdb(spark, duck_mixed):
    rows, con = duck_mixed
    df = spark.createDataFrame(rows, "g string, payload string").withColumn(
        "w", F.length("payload")
    )
    got = two_level_digest(
        df,
        [],
        F.col("payload"),
        count_alias="n",
        digest_alias="d",
        sum_cols={"tw": "w"},
    ).collect()
    sql = sql_two_level_digest(
        "(SELECT *, length(payload) AS w FROM t)",
        [],
        "payload",
        count_alias="n",
        digest_alias="d",
        sum_exprs={"tw": "w"},
    )
    want = con.execute(sql).fetchall()
    assert [(r["n"], r["d"], r["tw"]) for r in got] == want


def test_global_digest_on_empty_input_counts_zero(spark):
    """ADVICE r09 #3: with group_cols=[] and an EMPTY input, the level-2
    count and carried sums must come back 0 (not NULL) in BOTH engines —
    consumers (d121/d127 accounting) treat the count as an integer. The
    digest itself stays NULL (empty multiset)."""
    df = spark.createDataFrame([], "g string, payload string, w int").filter(
        F.lit(False)
    )
    got = two_level_digest(
        df, [], F.col("payload"), count_alias="n", sum_cols={"tw": "w"}
    ).collect()
    assert [(r["n"], r["digest"], r["tw"]) for r in got] == [(0, None, 0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (payload VARCHAR, w INT)")
    sql = sql_two_level_digest(
        "e", [], "payload", count_alias="n", sum_exprs={"tw": "w"}
    )
    assert con.execute(sql).fetchall() == [(0, None, 0)]
    con.close()


def test_digest_is_order_and_partitioning_independent(spark):
    rows = [("g", f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "g string, payload string").repartition(7)
    b = spark.createDataFrame(rows[::-1], "g string, payload string").repartition(2)
    da = two_level_digest(a, ["g"], F.col("payload")).collect()[0]["digest"]
    db = two_level_digest(b, ["g"], F.col("payload")).collect()[0]["digest"]
    assert da == db


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _payloads = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(
                st.none(),
                st.text(
                    alphabet="xyz,|0123456789 ",  # incl. the fold separator
                    min_size=0,
                    max_size=8,
                ),
            ),
        ),
        min_size=0,
        max_size=60,
    )

    @settings(max_examples=8, deadline=None)
    @given(rows=_payloads)
    def test_two_level_digest_property_matches_duckdb(spark, rows):
        """Property: for ANY multiset of (group, payload-or-NULL) rows —
        duplicates, empty strings, payloads containing the fold
        separator — the Spark two-level fold and the DuckDB SQL twin
        produce identical (group, count, digest) rows."""
        df = spark.createDataFrame(rows, "g string, payload string") if rows else (
            spark.createDataFrame([], "g string, payload string")
        )
        got = [
            (r["g"], r["n_rows"], r["digest"])
            for r in two_level_digest(df, ["g"], F.col("payload")).collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g VARCHAR, payload VARCHAR)")
        if rows:
            con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = con.execute(sql_two_level_digest("t", ["g"], "payload")).fetchall()
        con.close()
        assert got == want
