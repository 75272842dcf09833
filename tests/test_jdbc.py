"""JDBC surface against a REAL database (embedded Apache Derby):
D3/D5 round-trips are oracle-checked in test_oracle.py; here the FULL
charlotte pipeline runs against `JdbcSnorbyDB` — dim upserts, cid
sequencing, fact appends, idempotence markers, all through
`df.write.jdbc` / `spark.read.jdbc` with retry — and the resulting star
must equal the parquet-backed star row for row."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from charlotte_spark.queries.charlotte_pipeline import (
    _fresh_db,
    _star_summary,
    run_batch_pipeline,
    u2_fixture,
)
from charlotte_spark.sinks.jdbc import JdbcSnorbyDB
from charlotte_spark.streaming.maps import load_maps
from charlotte_spark.streaming.snorby import apply_batch, enrich
from charlotte_spark.sources.u2_spark import read_spools

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_snorby_pipeline_matches_parquet_star(spark):
    url = f"jdbc:derby:memory:snorby_{os.getpid()};create=true"
    jdb = JdbcSnorbyDB(spark, url, DERBY)

    fx = u2_fixture()
    alerts = read_spools(spark, fx["spools"], streaming=False)
    sig_map, class_map = load_maps(spark, fx["sig_map"], fx["gen_map"], fx["class_map"])
    apply_batch(jdb, enrich(alerts, sig_map, class_map), batch_id=0)
    # idempotent replay: the applied-batch marker must short-circuit
    apply_batch(jdb, enrich(alerts, sig_map, class_map), batch_id=0)

    ref_db = _fresh_db(spark, "jdbc_ref")
    run_batch_pipeline(spark, ref_db)

    cols = ["hostname", "cid", "sig_name", "sig_priority", "ts"]
    got = {
        tuple(r[c] for c in cols) for r in _star_summary(spark, jdb).collect()
    }
    want = {
        tuple(r[c] for c in cols) for r in _star_summary(spark, ref_db).collect()
    }
    assert got == want, (
        f"JDBC star diverges: {len(got)} vs {len(want)} rows; "
        f"extra={sorted(got - want)[:3]} missing={sorted(want - got)[:3]}"
    )
    # fact shards exist and are non-trivial over JDBC too
    n_ip = jdb.read("iphdr", "sid int").count()
    assert n_ip > 0
    assert jdb.applied_batches() == {0}
