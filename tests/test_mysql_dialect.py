"""MySQL dialect shim goldens (SURVEY §2.1 R21, VERDICT r06 #8).

No MySQL server exists in the sandbox, so the dialect layer is proven
the only way it can be: the rendered DDL/DML strings are pinned against
hand-checked MySQL statements, and the engine's Spark-side
dotted-quad→BIGINT conversion is pinned against known INET_ATON
vectors — the value the reference binds via ``inet_aton(%s)``
(/root/reference/charlotte/__init__.py:488) is exactly the value the
engine binds as a plain bigint parameter.
"""

from __future__ import annotations

import pytest

from charlotte_spark.sinks.mysql_dialect import (
    INET_ATON_VECTORS,
    STAR_TABLES,
    ddl_statements,
    render_create,
    render_insert,
    render_upsert,
)


def test_event_create_golden():
    assert render_create("event") == (
        "CREATE TABLE `event` (`sid` INT NOT NULL, `cid` BIGINT NOT NULL, "
        "`signature` INT, `timestamp` DATETIME, PRIMARY KEY (`sid`, `cid`))"
    )


def test_iphdr_create_golden():
    assert render_create("iphdr") == (
        "CREATE TABLE `iphdr` (`sid` INT NOT NULL, `cid` BIGINT NOT NULL, "
        "`ip_src` BIGINT, `ip_dst` BIGINT, `ip_ver` INT, `ip_hlen` INT, "
        "`ip_tos` INT, `ip_len` INT, `ip_id` INT, `ip_flags` INT, "
        "`ip_off` INT, `ip_ttl` INT, `ip_proto` INT, `ip_csum` INT, "
        "PRIMARY KEY (`sid`, `cid`))"
    )


def test_sensor_create_golden_and_derby_variant():
    assert render_create("sensor") == (
        "CREATE TABLE `sensor` (`sid` INT NOT NULL, `hostname` TEXT, "
        "`interface` TEXT, `detail` INT, `encoding` INT, `last_cid` BIGINT, "
        "PRIMARY KEY (`sid`))"
    )
    assert render_create("sensor", "derby") == (
        "CREATE TABLE sensor (sid INTEGER NOT NULL, "
        "hostname VARCHAR(32672), interface VARCHAR(32672), "
        "detail INTEGER, encoding INTEGER, last_cid BIGINT, "
        "PRIMARY KEY (sid))"
    )


def test_event_insert_golden():
    # The reference's statement (charlotte/__init__.py:473) with JDBC
    # placeholders and quoting: INSERT INTO event (sid, cid, signature,
    # timestamp) VALUES (%s, %s, %s, %s)
    assert render_insert("event") == (
        "INSERT INTO `event` (`sid`, `cid`, `signature`, `timestamp`) "
        "VALUES (?, ?, ?, ?)"
    )


def test_data_upsert_golden():
    assert render_upsert("data") == (
        "INSERT INTO `data` (`sid`, `cid`, `data_payload`) VALUES (?, ?, ?) "
        "ON DUPLICATE KEY UPDATE `data_payload` = VALUES(`data_payload`)"
    )


def test_keys_only_table_uses_insert_ignore():
    assert render_upsert("meta_batches") == (
        "INSERT IGNORE INTO `meta_batches` (`batch_id`) VALUES (?)"
    )


def test_ddl_covers_full_star():
    stmts = ddl_statements()
    assert len(stmts) == len(STAR_TABLES)
    assert all(s.startswith("CREATE TABLE `") for s in stmts)


def test_no_lob_primary_keys_anywhere():
    # Renders every table in both dialects — a schema change that puts
    # a TEXT/BLOB column into a key raises instead of emitting DDL
    # MySQL would reject at runtime.
    for t in STAR_TABLES:
        render_create(t, "mysql")
        render_create(t, "derby")


def test_ip_str_to_long_matches_inet_aton(spark):
    """The engine computes INET_ATON in Spark (whole-stage codegen) and
    binds the result as a dialect-free bigint — equivalence on golden
    vectors, plus round-trip through the inverse."""
    from pyspark.sql import functions as F

    from charlotte_spark.functions.net import ip_str_to_long, long_to_ip_str

    df = spark.createDataFrame(
        [(ip, want) for ip, want in INET_ATON_VECTORS], "ip string, want long"
    )
    got = df.select(
        "ip",
        "want",
        ip_str_to_long(F.col("ip")).alias("got"),
        long_to_ip_str(ip_str_to_long(F.col("ip"))).alias("back"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"], f"{r['ip']}: {r['got']} != {r['want']}"
        assert r["back"] == r["ip"]


def test_star_tables_match_engine_write_schemas():
    """The dialect's column inventory must track what the pipeline
    actually writes: read schemas in the queries/tests use the same
    Spark DDL fragments, so compare against SnorbyDB's canonical
    read schema for the three dims + event."""
    from charlotte_spark.queries.charlotte_pipeline import _star_summary  # noqa: F401

    # event/sensor/signature schemas as read back by _star_summary
    assert STAR_TABLES["event"][0] == (
        "sid int, cid bigint, signature int, timestamp timestamp"
    )
    assert STAR_TABLES["sensor"][0].startswith("sid int, hostname string")
    assert STAR_TABLES["signature"][0].startswith("sig_id int, sig_sid int")


@pytest.mark.parametrize("table", list(STAR_TABLES))
def test_insert_placeholder_arity(table):
    stmt = render_insert(table)
    schema, _ = STAR_TABLES[table]
    assert stmt.count("?") == len(schema.split(","))


def test_derby_ddl_executes_and_round_trips(spark):
    """The rendered DDL is EXECUTED against embedded Derby (the one
    real JDBC endpoint in this container): create the full star via
    JdbcSnorbyDB.create_schema, append through the rendered INSERT's
    column set with the normal Spark JDBC writer, and read back — so
    the dialect layer is proven executable end-to-end, not just
    string-matched. (MySQL strings stay golden-only: no server here.)"""
    import os

    from charlotte_spark.sinks.jdbc import JdbcSnorbyDB

    url = f"jdbc:derby:memory:dialect_{os.getpid()};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    db = JdbcSnorbyDB(spark, url, props)

    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(props["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmts = []
        db.create_schema(stmts.append, dialect="derby")
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()

    rows = spark.createDataFrame(
        [(1, 1, 7, None), (1, 2, 8, None)],
        "sid int, cid bigint, signature int, timestamp timestamp",
    )
    rows.write.jdbc(url, "event", mode="append", properties=props)
    back = spark.read.jdbc(url, "event", properties=props)
    got = sorted((r["SID"] if "SID" in r else r["sid"], r["CID"] if "CID" in r else r["cid"]) for r in back.collect())
    assert got == [(1, 1), (1, 2)]
    # PRIMARY KEY backstop: replaying the same (sid, cid) must be
    # rejected by the endpoint (the reference's unique-key contract)
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)duplicate|constraint"):
        rows.write.jdbc(url, "event", mode="append", properties=props)
