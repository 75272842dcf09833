"""CLI entry point (SURVEY §3 entry points 1/2): config validation
mirrors the reference's Config (charlotte/__init__.py:123-153); test
mode prints u2fast-shaped lines and exits cleanly."""

from __future__ import annotations

import json
import os
import re
import shutil

import pytest

from charlotte_spark.cli import ConfigError, load_config, main, run, validate_snortdb
from charlotte_spark.queries.charlotte_pipeline import u2_fixture


def _write_conf(tmp_path, overrides=None, drop=None):
    fx = u2_fixture()
    conf = {
        "spools": {
            name: {"directories": cfg["directories"], "filename": cfg["prefix"]}
            for name, cfg in fx["spools"].items()
        },
        "global": {
            "signature_map": fx["sig_map"],
            "generator_map": fx["gen_map"],
            "classification_map": fx["class_map"],
        },
        "plugin_snorby_parquet": {"path": str(tmp_path / "star")},
    }
    for k, v in (overrides or {}).items():
        conf[k] = v
    for path in drop or []:
        node = conf
        for k in path[:-1]:
            node = node[k]
        del node[path[-1]]
    p = tmp_path / "charlotte.conf"
    p.write_text(json.dumps(conf))
    return str(p)


def test_config_validation_mirrors_reference(tmp_path):
    # happy path: filename is accepted and mapped to prefix
    cfg = load_config(_write_conf(tmp_path))
    for spool in cfg["spools"].values():
        assert spool["prefix"] == "snort.u2"

    with pytest.raises(ConfigError, match="No global section"):
        load_config(_write_conf(tmp_path, drop=[["global"]]))
    with pytest.raises(ConfigError, match="generator_map"):
        load_config(_write_conf(tmp_path, drop=[["global", "generator_map"]]))
    with pytest.raises(ConfigError, match="No spool section"):
        load_config(_write_conf(tmp_path, drop=[["spools"]]))
    with pytest.raises(ConfigError, match="No spools defined"):
        load_config(_write_conf(tmp_path, overrides={"spools": {}}))
    with pytest.raises(ConfigError, match="directories"):
        load_config(
            _write_conf(tmp_path, overrides={"spools": {"x": {"filename": "f"}}})
        )
    with pytest.raises(ConfigError, match="Unable to read config file"):
        load_config(str(tmp_path / "missing.conf"))
    with pytest.raises(ConfigError, match="Key server not in DB config"):
        validate_snortdb({"plugin_snortdb": {"user": "u", "password": "p", "db": "d"}})


def test_main_rejects_bad_config(tmp_path, capsys):
    bad = _write_conf(tmp_path, drop=[["global", "signature_map"]])
    assert main([bad, "test"]) == 1
    assert "ERROR:" in capsys.readouterr().err
    assert main([]) == 1


def test_cli_test_mode_prints_u2fast_lines(spark, tmp_path, capsys):
    """`python -m charlotte_spark <conf> test` analog: drains the spool
    and prints one u2fast-shaped line per (alert, packet) row."""
    conf = load_config(_write_conf(tmp_path))
    ckpt = str(tmp_path / "ckpt")
    conf["global"]["checkpoint_dir"] = ckpt
    rc = run(conf, test_mode=True, follow=False, spark=spark)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # 270 (alert, packet) rows across both sensors (golden-test count)
    assert len(out) == 270
    pat = re.compile(
        r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} \{(TCP|UDP|ICMP|-)\} "
        r"\[\d+:\d+:\d+\] .+ \[Classification: .+\] \[Priority: \d+\] .+ -> .+$"
    )
    assert all(pat.match(l) for l in out), out[:3]
    # ipv6 events surface their event-record addresses in the line
    assert any("2001:db8::" in l for l in out)


def test_cli_db_mode_writes_star(spark, tmp_path):
    """Default (non-test) mode: pipeline into the parquet snorby star."""
    conf = load_config(_write_conf(tmp_path))
    conf["global"]["checkpoint_dir"] = str(tmp_path / "ckpt_db")
    rc = run(conf, test_mode=False, follow=False, spark=spark)
    assert rc == 0
    star = conf["plugin_snorby_parquet"]["path"]
    n = spark.read.parquet(os.path.join(star, "event")).count()
    assert n == 270


def _shared_parent_spools(parent):
    """A config in the evolution-safe layout: <parent>/<sensor_name>/
    with one common prefix (VERDICT r10 #7)."""
    from charlotte_spark.queries.charlotte_pipeline import write_spool

    write_spool(f"{parent}/sensor_a", n_files=2, events_per_file=10, sensor_id=1)
    write_spool(
        f"{parent}/sensor_b", n_files=1, events_per_file=10, sensor_id=2,
        base_second=1_700_100_000,
    )
    return {
        "sensor_a": {"directories": [f"{parent}/sensor_a"], "prefix": "snort.u2"},
        "sensor_b": {"directories": [f"{parent}/sensor_b"], "prefix": "snort.u2"},
    }


def test_shared_parent_config_gets_single_source_plan(spark, tmp_path):
    """Evolution-safe default (VERDICT r10 #7): a shared-parent config
    must compile to ONE streaming source over the parent glob — no
    per-directory union (which can never grow across a checkpoint
    restart) — with sensor identity derived from the subdirectory."""
    from charlotte_spark.sources.u2_spark import read_spools, shared_parent_layout

    parent = str(tmp_path / "spools")
    spools = _shared_parent_spools(parent)
    assert shared_parent_layout(spools) == (parent, "snort.u2")

    stream = read_spools(spark, spools, streaming=True)
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert plan.count("StreamingRelation") == 1, "must be ONE source"
    assert "Union" not in plan, "per-directory union is not evolution-safe"

    # batch side mirrors the shape; identity comes from the path
    counts = {
        r["sensor_name"]: r["n"]
        for r in read_spools(spark, spools, streaming=False)
        .groupBy("sensor_name")
        .agg(__import__("pyspark").sql.functions.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"sensor_a", "sensor_b"}
    assert counts["sensor_a"] > counts["sensor_b"] > 0


def test_non_shared_config_unions_and_warns(spark):
    """A config whose directory names don't carry the sensor identity
    keeps the literal R4 union shape, and a streaming caller is warned
    that day-2 spool growth needs a new checkpoint. The default
    fixture is shared-parent-shaped since r13 (VERDICT r12 #6), so the
    legacy shape under test is its ``spools_legacy`` view (same files,
    config names that don't match the directory basenames) — and the
    default shape must NOT warn."""
    import warnings

    from charlotte_spark.sources.u2_spark import read_spools, shared_parent_layout

    fx = u2_fixture()
    assert shared_parent_layout(fx["spools_legacy"]) is None
    with pytest.warns(UserWarning, match="NEW checkpoint"):
        stream = read_spools(spark, fx["spools_legacy"], streaming=True)
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert plan.count("StreamingRelation") == 2

    # the engine's own default fixture takes the evolution-safe path
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        clean = read_spools(spark, fx["spools"], streaming=True)
    assert clean._jdf.queryExecution().analyzed().toString().count(
        "StreamingRelation"
    ) == 1


def test_cli_day2_sensor_growth_same_checkpoint(spark, tmp_path):
    """End-to-end through the CLI: run the pipeline on a shared-parent
    config, then a NEW sensor directory appears (not in the config —
    mkdir + first rollover is the whole day-2 change), and the SAME
    run definition resumes from the SAME checkpoint: the new sensor's
    events land, already-applied sensors don't reprocess."""
    from charlotte_spark.queries.charlotte_pipeline import write_spool

    fx = u2_fixture()  # only for the map files
    parent = str(tmp_path / "spools")
    conf = {
        "spools": _shared_parent_spools(parent),
        "global": {
            "signature_map": fx["sig_map"],
            "generator_map": fx["gen_map"],
            "classification_map": fx["class_map"],
            "checkpoint_dir": str(tmp_path / "ckpt"),
        },
        "plugin_snorby_parquet": {"path": str(tmp_path / "star")},
    }
    star = conf["plugin_snorby_parquet"]["path"]

    def per_sensor_events():
        ev = spark.read.parquet(os.path.join(star, "event"))
        se = spark.read.parquet(os.path.join(star, "sensor"))
        rows = ev.join(se, "sid").groupBy("hostname").count().collect()
        return {r["hostname"]: r["count"] for r in rows}

    assert run(conf, test_mode=False, follow=False, spark=spark) == 0
    day1 = per_sensor_events()
    assert set(day1) == {"sensor_a", "sensor_b"} and all(day1.values())

    write_spool(
        f"{parent}/sensor_c", n_files=1, events_per_file=10, sensor_id=3,
        base_second=1_700_200_000,
    )
    assert run(conf, test_mode=False, follow=False, spark=spark) == 0
    day2 = per_sensor_events()
    assert set(day2) == {"sensor_a", "sensor_b", "sensor_c"}
    assert day2["sensor_c"] > 0, "day-2 sensor must flow in"
    # nothing replayed for the already-applied sensors
    assert day2["sensor_a"] == day1["sensor_a"]
    assert day2["sensor_b"] == day1["sensor_b"]


def test_reference_conf_example_loads_unchanged():
    """Drop-in parity: the reference repo's OWN charlotte.conf.example
    must load and validate byte-for-byte unchanged — a reference user
    points this engine at their existing config file. Covers the
    'filename' spool key (our reader takes 'prefix'), multi-directory
    spools, the three global maps, and the snortdb plugin block."""
    import os

    import pytest

    from charlotte_spark.cli import load_config, validate_snortdb

    path = "/root/reference/charlotte.conf.example"
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    cfg = load_config(path)
    assert set(cfg["spools"]) == {"example1", "example2"}
    assert cfg["spools"]["example2"]["directories"] == [
        "/unified/example2/1",
        "/unified/example2/2",
    ]
    # reference 'filename' key mapped onto our reader's 'prefix'
    assert cfg["spools"]["example1"]["prefix"] == "snort.log"
    assert cfg["global"]["signature_map"].endswith("sid-msg.map")
    db = validate_snortdb(cfg)
    assert db["db"] == "charlotte" and db["server"] == "localhost"
