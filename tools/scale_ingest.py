"""Large-scale ingest validation (SURVEY §2.1 R1-R21 at volume).

Generates ≥1M unified2 events across 4 sensor spools, runs the FULL
streaming pipeline (parse → decode → enrich → snorby star) with an
injected crash mid-stream, restarts from the same checkpoint + db, and
asserts the exactly-once contract the reference gets from its
serialized writer (/root/reference/charlotte/__init__.py:554-570):

- no loss:   event rows == batch-mode parse count of the same spools
             (one row per (alert, packet) — R10 explosion included)
- no dups:   count == count(DISTINCT (sid, cid))
- density:   per sensor, cid is exactly 1..n (the R19/D58 guarantee)

Prints one JSON line with throughput; paste the numbers into SCALE.md.

Usage: python tools/scale_ingest.py [events_per_file [files_per_spool]]
Default 25_000 x 10 x 4 sensors = 1,000,000 events.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from charlotte_spark.session import get_spark  # noqa: E402
from charlotte_spark.sources.u2_spark import read_spools  # noqa: E402
from charlotte_spark.sources.unified2 import write_spool  # noqa: E402
from charlotte_spark.streaming.harness import _scratch_root  # noqa: E402
from charlotte_spark.streaming.maps import load_maps  # noqa: E402
from charlotte_spark.streaming.snorby import (  # noqa: E402
    SENSOR_SCHEMA,
    SnorbyDB,
    apply_batch,
    enrich,
)

BASE = _scratch_root("CHARLOTTE_SCALE_TMP", "charlotte_scale")
N_SENSORS = 4


def build_fixture(events_per_file: int, n_files: int) -> dict:
    spools = {}
    t0 = time.time()
    total = 0
    # the spool parent is DEDICATED (nothing but sensor dirs under it):
    # the single parent-glob source reads <parent>/*, so a db/ckpt or a
    # stale differently-named spool dir under the same parent would be
    # picked up as a phantom sensor (hit on first run: leftover
    # spool_{s} dirs doubled the sensor count)
    shutil.rmtree(f"{BASE}/spools", ignore_errors=True)
    for s in range(1, N_SENSORS + 1):
        # shared-parent layout (<parent>/<sensor_name>/) — the
        # evolution-safe shape the engine recommends and, since r13,
        # defaults to in its own fixtures; the stream compiles to ONE
        # parent-glob source, so maxFilesPerTrigger=1 means one FILE
        # per micro-batch across all sensors (pre-r13 the per-sensor
        # union consumed one file per sensor per batch — ingest
        # figures across that boundary are not directly comparable).
        d = f"{BASE}/spools/sensor_{s}"
        write_spool(
            d,
            n_files=n_files,
            events_per_file=events_per_file,
            sensor_id=s,
            base_second=1_700_000_000 + s * 1_000_000,
        )
        # distinct mtimes => deterministic file order (see u2_fixture)
        for fname in os.listdir(d):
            epoch = int(fname.rsplit(".", 1)[-1])
            os.utime(f"{d}/{fname}", (epoch, epoch))
        spools[f"sensor_{s}"] = {"directories": [d], "prefix": "snort.u2"}
        total += events_per_file * n_files
    paths = {
        "sig_map": f"{BASE}/sid-msg.map",
        "gen_map": f"{BASE}/gen-msg.map",
        "class_map": f"{BASE}/classification.config",
    }
    with open(paths["sig_map"], "w") as f:
        for s in range(20):
            f.write(f"{1_000_000 + s} || Known Signature {s}\n")
    with open(paths["gen_map"], "w") as f:
        f.write("2 || 1 || Generator Two Alert\n")
    with open(paths["class_map"], "w") as f:
        for i in range(1, 6):
            f.write(f"config classification: class-{i},Class {i} Description,{i}\n")
    return {"spools": spools, "n_events": total, "gen_sec": time.time() - t0, **paths}


def run(events_per_file: int = 25_000, n_files: int = 10) -> dict:
    spark = get_spark("charlotte-scale-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    fx = build_fixture(events_per_file, n_files)

    db_path = f"{BASE}/db"
    ckpt = f"{BASE}/ckpt"
    shutil.rmtree(db_path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    db = SnorbyDB(spark, db_path)

    batches = {"n": 0}

    def make_sink(crash_after: int | None):
        def sink(batch_df, batch_id):
            if crash_after is not None and batches["n"] >= crash_after:
                raise RuntimeError("injected crash")
            sig_map, class_map = load_maps(
                spark, fx["sig_map"], fx["gen_map"], fx["class_map"]
            )
            apply_batch(db, enrich(batch_df, sig_map, class_map), batch_id)
            batches["n"] += 1

        return sink

    def stream(crash_after: int | None):
        # shared-parent single source: 12 files/batch over 40 files
        # total => 4 micro-batches (crash lands mid-stream) — same
        # batch volume as the pre-r13 per-source union (4 sensors x 3)
        alerts = read_spools(
            spark, fx["spools"], streaming=True,
            max_files_per_trigger=3 * N_SENSORS,
        )
        q = (
            alerts.writeStream.foreachBatch(make_sink(crash_after))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # No-loss baseline: the event fact is one row per PARSED ROW (an
    # alert explodes to one row per packet — R10), so the expected
    # count is the batch-mode parse of the same spools, not the raw
    # event count.
    expected_rows = read_spools(spark, fx["spools"], streaming=False).count()

    t0 = time.time()
    crashed = False
    try:
        stream(crash_after=2)  # kill mid-stream after 2 applied batches
    except Exception as e:
        crashed = "injected crash" in str(e)
    assert crashed, "crash injection did not fire — raise file count"
    stream(crash_after=None)  # restart: same checkpoint + db
    ingest_sec = time.time() - t0

    event = db.read("event", "sid int, cid bigint, signature int, timestamp timestamp")
    audit = (
        event.groupBy("sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("cid").alias("nd"),
            F.min("cid").alias("mn"),
            F.max("cid").alias("mx"),
        )
        .collect()
    )
    total_rows = sum(r["n"] for r in audit)
    dense = all(r["n"] == r["nd"] and r["mn"] == 1 and r["mx"] == r["n"] for r in audit)
    result = {
        "n_events_generated": fx["n_events"],
        "n_rows_expected": expected_rows,
        "n_event_rows": total_rows,
        "n_sensors": len(audit),
        "no_loss": total_rows == expected_rows,
        "no_dups_dense_cids": dense,
        "crash_restart": True,
        "batches_applied": batches["n"],
        "gen_sec": round(fx["gen_sec"], 1),
        "ingest_sec": round(ingest_sec, 1),
        "events_per_sec": round(fx["n_events"] / ingest_sec),
    }
    assert result["no_loss"], f"LOSS: {total_rows} != {expected_rows}"
    assert dense, "cid sequence not dense — duplicates or gaps"
    return result


def _state_snapshot(db_path: str, table: str = "sensor") -> dict:
    """On-disk size of the persisted sequencer state (the per-sensor
    last_cid table) — the D58 state the reference keeps as a MySQL row
    per sensor (:566-569)."""
    tdir = f"{db_path}/{table}"
    return {"state_bytes": _dir_bytes(tdir)}


def _dir_bytes(path: str) -> int:
    nbytes = 0
    for base, _dirs, files in os.walk(path):
        nbytes += sum(os.path.getsize(os.path.join(base, f)) for f in files)
    return nbytes


def sustained(events_per_file: int = 10_000, n_files: int = 24) -> dict:
    """Sustained multi-batch replay with state-store metrics (VERDICT
    r11 #5): the shared-parent single source with
    maxFilesPerTrigger=N_SENSORS => ~n_files micro-batches of N_SENSORS
    files each (same batch volume as the pre-r13 per-source union,
    though mtime order is sensor-major, so sensors enter the state one
    at a time). After every applied batch,
    record the wall latency and the cid-sequencer state footprint
    (bytes + rows of the persisted ``sensor`` table). Asserts the D58
    state stays O(sensors) — constant rows, bounded bytes — and the
    per-batch latency shows no super-linear trend (late-window median
    <= 2x early-window median; state lookups and dim upserts must not
    scale with CUMULATIVE ingested volume)."""
    spark = get_spark("charlotte-sustained-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    fx = build_fixture(events_per_file, n_files)

    db_path = f"{BASE}/db_sustained"
    ckpt = f"{BASE}/ckpt_sustained"
    shutil.rmtree(db_path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    db = SnorbyDB(spark, db_path)

    series: list[dict] = []

    def sink(batch_df, batch_id):
        t0 = time.time()
        sig_map, class_map = load_maps(
            spark, fx["sig_map"], fx["gen_map"], fx["class_map"]
        )
        apply_batch(db, enrich(batch_df, sig_map, class_map), batch_id)
        snap = _state_snapshot(db_path)
        snap.update(
            batch_id=int(batch_id),
            batch_sec=round(time.time() - t0, 3),
            state_rows=len(db.read_small("sensor", SENSOR_SCHEMA)),
            # Checkpoint growth alongside state bytes (VERDICT r13 #7):
            # offsets/commits logs are one small file per batch —
            # O(batches) by design, KB-scale, and compacted by Spark;
            # recorded so linear-in-batches vs linear-in-EVENTS is
            # measured, not asserted.
            ckpt_bytes=_dir_bytes(ckpt),
        )
        series.append(snap)

    t0 = time.time()
    alerts = read_spools(
        spark, fx["spools"], streaming=True, max_files_per_trigger=N_SENSORS
    )
    q = (
        alerts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ingest_sec = time.time() - t0

    assert len(series) >= 10, f"expected a sustained run, got {len(series)} batches"
    # State is O(sensors SEEN), not O(ingested volume): mtime order is
    # sensor-major under the single source, so rows step up once per
    # new sensor and must end at N_SENSORS — never exceed it, never
    # grow with events.
    rows = [s["state_rows"] for s in series]
    assert all(a <= b for a, b in zip(rows, rows[1:])), f"state rows non-monotone: {rows}"
    assert rows[-1] == N_SENSORS and max(rows) <= N_SENSORS, (
        f"sensor state rows drifted: {rows}"
    )
    sizes = [s["state_bytes"] for s in series]
    assert max(sizes) <= 1.5 * min(sizes), f"sensor state bytes grew: {sizes}"

    # Latency trend: the first batch pays dim bootstrap; compare the
    # median of the first 5 post-bootstrap batches to the last 5.
    lat = [s["batch_sec"] for s in series[1:]]
    early = sorted(lat[:5])[2]
    late = sorted(lat[-5:])[2]
    assert late <= 2.0 * early, f"per-batch latency trend: {early} -> {late}"

    event = db.read("event", "sid int, cid bigint, signature int, timestamp timestamp")
    audit = (
        event.groupBy("sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("cid").alias("nd"),
            F.min("cid").alias("mn"),
            F.max("cid").alias("mx"),
        )
        .collect()
    )
    dense = all(r["n"] == r["nd"] and r["mn"] == 1 and r["mx"] == r["n"] for r in audit)
    assert dense, "cid sequence not dense under sustained replay"
    return {
        "mode": "sustained",
        "n_events_generated": fx["n_events"],
        "n_batches": len(series),
        "n_sensors": N_SENSORS,
        "state_rows_bounded_by_sensors": True,
        "state_bytes_min": min(sizes),
        "state_bytes_max": max(sizes),
        "ckpt_bytes_first": series[0]["ckpt_bytes"],
        "ckpt_bytes_last": series[-1]["ckpt_bytes"],
        "ckpt_bytes_per_batch": round(
            (series[-1]["ckpt_bytes"] - series[0]["ckpt_bytes"])
            / max(len(series) - 1, 1)
        ),
        "batch_sec_early_median": early,
        "batch_sec_late_median": late,
        "no_dups_dense_cids": dense,
        "gen_sec": round(fx["gen_sec"], 1),
        "ingest_sec": round(ingest_sec, 1),
        "events_per_sec": round(fx["n_events"] / ingest_sec),
        "series": series,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sustained":
        epf = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
        nf = int(sys.argv[3]) if len(sys.argv) > 3 else 24
        print(json.dumps(sustained(epf, nf)))
    else:
        epf = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
        nf = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        print(json.dumps(run(epf, nf)))
