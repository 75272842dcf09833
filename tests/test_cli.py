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
