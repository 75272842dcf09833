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
    MAX_CID_TABLES,
    REFERENCE_TEMPLATES,
    STAR_TABLES,
    ddl_statements,
    render_create,
    render_insert,
    render_max_cid,
    render_upsert,
)

# Hand-checked MySQL goldens: ONE vector per SQL template the reference
# sends (/root/reference/charlotte/__init__.py:473-608) — every INSERT,
# SELECT and UPDATE shape, incl. the inet_aton-wrapped iphdr insert,
# the literal-default sensor insert, and the sig_class UPDATE (SCD-1)
# branch (VERDICT r07 #6).
REFERENCE_GOLDENS: dict[str, str] = {
    "event_insert": (
        "INSERT INTO `event` (`sid`, `cid`, `signature`, `timestamp`) "
        "VALUES (?, ?, ?, ?)"
    ),
    "iphdr_insert": (
        "INSERT INTO `iphdr` (`sid`, `cid`, `ip_src`, `ip_dst`, `ip_ver`, "
        "`ip_hlen`, `ip_tos`, `ip_len`, `ip_id`, `ip_flags`, `ip_off`, "
        "`ip_ttl`, `ip_proto`, `ip_csum`) VALUES (?, ?, INET_ATON(?), "
        "INET_ATON(?), ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"
    ),
    "tcphdr_insert": (
        "INSERT INTO `tcphdr` (`sid`, `cid`, `tcp_sport`, `tcp_dport`, "
        "`tcp_seq`, `tcp_ack`, `tcp_off`, `tcp_res`, `tcp_flags`, "
        "`tcp_win`, `tcp_csum`, `tcp_urp`) "
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"
    ),
    "udphdr_insert": (
        "INSERT INTO `udphdr` (`sid`, `cid`, `udp_sport`, `udp_dport`, "
        "`udp_len`, `udp_csum`) VALUES (?, ?, ?, ?, ?, ?)"
    ),
    "icmphdr_insert": (
        "INSERT INTO `icmphdr` (`sid`, `cid`, `icmp_type`, `icmp_code`, "
        "`icmp_csum`, `icmp_id`, `icmp_seq`) VALUES (?, ?, ?, ?, ?, ?, ?)"
    ),
    "data_insert": (
        "INSERT INTO `data` (`sid`, `cid`, `data_payload`) VALUES (?, ?, ?)"
    ),
    "sensor_select_sid": (
        "SELECT `sid` FROM `sensor` "
        "WHERE (`hostname` = ?) AND (`interface` = 'charlotte')"
    ),
    "sensor_insert": (
        "INSERT INTO `sensor` (`hostname`, `interface`, `detail`, "
        "`encoding`) VALUES (?, ?, 1, 0)"
    ),
    "sensor_select_last_cid": (
        "SELECT `last_cid` FROM `sensor` WHERE `sid` = ?"
    ),
    "max_cid_scan": (
        "SELECT MAX(`cid`) AS `last_cid` FROM `event` WHERE `sid` = ?"
    ),
    "sensor_update_last_cid": (
        "UPDATE `sensor` SET `last_cid` = ? WHERE `sid` = ?"
    ),
    "signature_select": (
        "SELECT `sig_id` FROM `signature` WHERE (`sig_sid` = ?) AND "
        "(`sig_gid` = ?) AND (`sig_rev` = ?) AND (`sig_class_id` = ?) AND "
        "(`sig_priority` = ?) AND (`sig_name` = ?)"
    ),
    "signature_insert": (
        "INSERT INTO `signature` (`sig_sid`, `sig_gid`, `sig_rev`, "
        "`sig_class_id`, `sig_priority`, `sig_name`) "
        "VALUES (?, ?, ?, ?, ?, ?)"
    ),
    "sig_class_select": (
        "SELECT `sig_class_name` FROM `sig_class` WHERE `sig_class_id` = ?"
    ),
    "sig_class_insert": (
        "INSERT INTO `sig_class` (`sig_class_id`, `sig_class_name`) "
        "VALUES (?, ?)"
    ),
    "sig_class_update": (
        "UPDATE `sig_class` SET `sig_class_name` = ? WHERE `sig_class_id` = ?"
    ),
}


@pytest.mark.parametrize("key", sorted(REFERENCE_GOLDENS))
def test_reference_template_golden(key):
    ref_line, stmt = REFERENCE_TEMPLATES[key]
    assert stmt == REFERENCE_GOLDENS[key], f"{key} ({ref_line})"


def test_reference_template_set_is_exhaustive():
    """Template keys match 1:1 — a new reference statement shape must
    land in both the shim and the goldens."""
    assert set(REFERENCE_TEMPLATES) == set(REFERENCE_GOLDENS)


def test_reference_insert_columns_exist_in_star():
    """Every column an INSERT template names (sig_id-less signature
    insert, the sensor literal-defaults insert, ...) must exist in the
    dialect's table inventory with matching order."""
    import re

    for key, (_, stmt) in REFERENCE_TEMPLATES.items():
        m = re.match(r"INSERT INTO `(\w+)` \(([^)]*)\)", stmt)
        if not m:
            continue
        table, collist = m.group(1), [c.strip("` ") for c in m.group(2).split(",")]
        schema_cols = [p.strip().split()[0] for p in STAR_TABLES[table][0].split(",")]
        assert [c for c in schema_cols if c in collist] == collist, (
            f"{key}: columns out of star order or unknown"
        )


def test_max_cid_scan_covers_all_seven_reference_tables():
    """The cid recovery walk (:561) instantiates per table — incl.
    ``opt``, which is snorby-schema-only and written by neither
    engine (documented residual)."""
    assert MAX_CID_TABLES == (
        "data", "event", "icmphdr", "iphdr", "opt", "tcphdr", "udphdr",
    )
    for t in MAX_CID_TABLES:
        assert render_max_cid(t) == (
            f"SELECT MAX(`cid`) AS `last_cid` FROM `{t}` WHERE `sid` = ?"
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
