"""Property tests (SURVEY §5.2): random packet-type mixes through the
R8 dispatch chain, random map-miss rates through R13/R14 defaults, and
pack→parse→decode round-trips of the unified2 codec.

Hypothesis drives the pure-Python codec (cheap, thousands of cases);
the Spark-level dispatch/enrichment checks run a few seeded mixes as
parametrized cases so suite runtime stays bounded.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from charlotte_spark.sources.unified2 import (
    decode_ethernet,
    make_frame,
    pack_event,
    pack_extra_data,
    pack_packet,
    parse_alerts,
)

ids = st.integers(min_value=0, max_value=2**31 - 1)
small = st.integers(min_value=0, max_value=255)


@settings(max_examples=200, deadline=None)
@given(
    sensor=ids, event=ids, sec=ids, sig=ids, gid=ids,
    classid=small, prio=small,
    n_pkts=st.integers(min_value=0, max_value=4),
    n_extra=st.integers(min_value=0, max_value=2),
)
def test_pack_parse_roundtrip(sensor, event, sec, sig, gid, classid, prio, n_pkts, n_extra):
    buf = pack_event(sensor, event, sec, sig, gid, classid, prio)
    for p in range(n_pkts):
        buf += pack_packet(sensor, event, sec, make_frame(f"{event}|{p}"))
    for x in range(n_extra):
        buf += pack_extra_data(sensor, event, sec, x, b"blob%d" % x)
    alerts = parse_alerts(buf)
    assert len(alerts) == 1
    a = alerts[0]
    assert (a["sensor_id"], a["event_id"], a["event_second"]) == (sensor, event, sec)
    assert (a["signature_id"], a["generator_id"]) == (sig, gid)
    assert (a["classification_id"], a["priority"]) == (classid, prio)
    assert len(a["packets"]) == n_pkts
    assert len(a["extra_data"]) == n_extra


@settings(max_examples=200, deadline=None)
@given(seed=st.text(min_size=1, max_size=20))
def test_decode_dispatch_exclusive(seed):
    """Every generated frame decodes to exactly one L4 protocol, and the
    ip.proto field agrees with which branch is populated (R8)."""
    d = decode_ethernet(make_frame(seed))
    assert d is not None
    layers = [k for k in ("tcp", "udp", "icmp") if d[k] is not None]
    assert len(layers) == 1
    proto = {"tcp": 6, "udp": 17, "icmp": 1}[layers[0]]
    assert d["ip"]["proto"] == proto


@settings(max_examples=100, deadline=None)
@given(seed=st.text(min_size=1, max_size=20))
def test_decode_icmp_id_seq_semantics(seed):
    """ICMP id/seq are decoded only for types 13/14/17/18 (the intended
    semantics of the reference's crashing branch, SURVEY §2.1 defects —
    charlotte/__init__.py:518)."""
    d = decode_ethernet(make_frame(seed))
    icmp = d["icmp"]
    if icmp is None:
        return
    if icmp["type"] in (13, 14, 17, 18):
        assert icmp["id"] is not None and icmp["seq"] is not None
    else:
        assert icmp["id"] is None and icmp["seq"] is None


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_parse_tolerates_garbage_and_truncation(data):
    """parse_alerts never raises on arbitrary bytes (R1 reads files
    under active write — truncated trailing records are normal)."""
    parse_alerts(data)


@settings(max_examples=100, deadline=None)
@given(
    rtype=st.sampled_from([7, 104, 72, 105, 2, 110]),
    payload=st.binary(min_size=0, max_size=30),
)
def test_parse_skips_undersized_known_records(rtype, payload):
    """A correctly-framed record whose payload is shorter than its
    type's fixed header is corrupt input, not a crash: the parser must
    skip it and keep consuming subsequent records (the reference dies
    on a struct.error here — SURVEY §2.1 defect, not replicated).
    Payloads up to 30 bytes are below every known header size."""
    import struct as _struct

    good = pack_event(1, 7, 1000, 42, 1, 1, 1)
    buf = _struct.pack(">2I", rtype, len(payload)) + payload + good
    alerts = parse_alerts(buf)
    assert len(alerts) == 1 and alerts[0]["event_id"] == 7


@settings(max_examples=50, deadline=None)
@given(
    frames=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=5),
    cut=st.integers(min_value=1, max_value=200),
)
def test_parse_truncated_tail_keeps_prefix(frames, cut):
    """Truncating the final record loses at most that record."""
    buf = pack_event(1, 7, 1000, 42, 1, 1, 1)
    for i, s in enumerate(frames):
        buf += pack_packet(1, 7, 1000, make_frame(s))
    full = parse_alerts(buf)[0]
    truncated = parse_alerts(buf[: len(buf) - cut])
    if truncated:
        assert len(truncated[0]["packets"]) >= len(full["packets"]) - (
            1 + (cut - 1) // (8 + 28)
        ) - 1


# ---------------------------------------------------------------------------
# Spark-level: dispatch fan-out counts and map-miss defaults
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mix_seed", ["mixA", "mixB", "mixC"])
def test_dispatch_counts_match_decode(spark, mix_seed):
    """For a random protocol mix, the Spark pipeline's per-protocol fact
    row counts equal a direct Python decode of the same frames (R8)."""
    import pandas as pd

    from charlotte_spark.sources.u2_spark import (
        ALERT_FLAT_SCHEMA,
        DECODED_SCHEMA,
        _decode_frames,
    )

    frames = [make_frame(f"{mix_seed}|{i}") for i in range(60)]
    want = {"tcp": 0, "udp": 0, "icmp": 0}
    for f in frames:
        d = decode_ethernet(f)
        for k in want:
            if d and d[k] is not None:
                want[k] += 1

    pdf = pd.DataFrame(
        {
            "sensor_name": ["s"] * len(frames),
            "event_second": [1000] * len(frames),
            "event_id": list(range(len(frames))),
            "signature_id": [1] * len(frames),
            "generator_id": [1] * len(frames),
            "classification_id": [1] * len(frames),
            "priority": [1] * len(frames),
            "event_ip_src": ["10.0.0.1"] * len(frames),
            "event_ip_dst": ["10.0.0.2"] * len(frames),
            "mpls_label": [None] * len(frames),
            "vlan_id": [None] * len(frames),
            "n_packets": [1] * len(frames),
            "n_extra": [0] * len(frames),
            "packet_pos": [0] * len(frames),
            "frame": frames,
        }
    )
    flat = spark.createDataFrame(pdf, ALERT_FLAT_SCHEMA)
    decoded = flat.mapInPandas(_decode_frames, DECODED_SCHEMA)
    from pyspark.sql import functions as F

    got = {
        "tcp": decoded.filter(F.col("tcp_sport").isNotNull()).count(),
        "udp": decoded.filter(F.col("udp_sport").isNotNull()).count(),
        "icmp": decoded.filter(F.col("icmp_type").isNotNull()).count(),
    }
    assert got == want


@pytest.mark.parametrize("miss_rate", [0, 3, 1])  # every Nth sig unknown; 1 => all
def test_enrich_default_fabrication(spark, miss_rate):
    """R13/R14: rows whose (gid,sid) misses the map get exactly
    charlotte's fabricated defaults (rev=0, classid=0, priority=10,
    msg='Unknown Alert gid:sid'); hits get map values."""
    from pyspark.sql import functions as F

    from charlotte_spark.schemas import CLASS_MAP, SIG_MAP
    from charlotte_spark.streaming.snorby import enrich

    rows = []
    for i in range(30):
        unknown = miss_rate and (i % miss_rate == 0)
        rows.append((f"s", 1000 + i, i, 9_000_000 + i if unknown else 100 + (i % 5), 1, 1, 3))
    alerts = spark.createDataFrame(
        rows,
        "sensor_name string, event_second bigint, event_id bigint, "
        "signature_id int, generator_id int, classification_id int, priority int",
    )
    sig_map = spark.createDataFrame(
        [(1, 100 + k, 2, 5, 1, f"sig {k}") for k in range(5)], SIG_MAP
    )
    class_map = spark.createDataFrame([(1, "known-class")], CLASS_MAP)
    e = enrich(alerts, sig_map, class_map).collect()
    for r in e:
        if r["signature_id"] >= 9_000_000:
            assert r["sig_rev"] == 0 and r["sig_classid"] == 0
            assert r["sig_priority"] == 10
            assert r["sig_msg"] == f"Unknown Alert 1:{r['signature_id']}"
        else:
            assert r["sig_priority"] == 1 and r["sig_msg"].startswith("sig ")
        assert r["class_name"] == "known-class"  # classification_id=1 hits


# ---------------------------------------------------------------------------
# Training-data curation invariants (D77/D78/D80)
# ---------------------------------------------------------------------------


def test_split_assignment_is_append_stable(spark, sf_dir):
    """D78: hash-splitting must not move existing documents when the
    corpus grows — assignment depends only on doc_id, so the split of
    any subset equals its restriction from the full corpus."""
    from pyspark.sql import functions as F

    from charlotte_spark.functions.portable import portable_hash_long

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = portable_hash_long("doc_id", "split1|") % 10
    split = F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
    full = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r["doc_id"]: r["s"] for r in subset.select("doc_id", split.alias("s")).collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_sequence_packing_invariants(spark, sf_dir):
    """D80: every document lands in exactly one sequence; sequences are
    dense per shard; a sequence's starting offset is below the budget
    boundary it was assigned to (offset-based packing contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    budget = 512
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_toks"))
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn("cum", F.sum("n_toks").over(w)).withColumn(
        "seq_id", F.floor((F.col("cum") - F.col("n_toks")) / float(budget))
    )
    rows = packed.collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)  # one row per doc
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        seqs = sorted({r["seq_id"] for r in rs})
        assert seqs == list(range(len(seqs))), f"{lang}: sequence ids not dense"
        for r in rs:
            start_offset = r["cum"] - r["n_toks"]
            assert r["seq_id"] == start_offset // budget


def test_pii_redaction_is_idempotent_and_conservative(spark, sf_dir):
    """D88 invariants: (1) redacting already-redacted text changes
    nothing (placeholders contain no redactable syntax); (2) docs with
    zero PII counts hash to their original injected text (the scrubber
    never touches clean text)."""
    from pyspark.sql import functions as F

    from charlotte_spark.queries.traindata import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
        _docs,
    )

    def redact(c):
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
            ),
            _PII_IP,
            "<IP>",
        )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    once = redact(F.col("text"))
    n_bad = (
        d.select(once.alias("r1"), redact(once).alias("r2"))
        .filter(F.col("r1") != F.col("r2"))
        .count()
    )
    assert n_bad == 0, f"{n_bad} docs changed on second redaction pass"
    # clean docs (no injected PII pattern present) must pass through
    n_touched = (
        d.filter(
            (F.regexp_count("text", F.lit(_PII_EMAIL)) == 0)
            & (F.regexp_count("text", F.lit(_PII_PHONE)) == 0)
            & (F.regexp_count("text", F.lit(_PII_IP)) == 0)
        )
        .filter(redact(F.col("text")) != F.col("text"))
        .count()
    )
    assert n_touched == 0


def test_line_dedup_counts_are_consistent(spark, sf_dir):
    """D89 invariants over the declared output: n_removed = n_lines -
    n_unique > 0 on every emitted row, and every 5th doc (the injected
    duplicate) is present."""
    from charlotte_spark.registry import load_all_queries

    reg = load_all_queries()
    rows = reg["d89_intradoc_line_dedup"].fn(spark, sf_dir).collect()
    assert rows, "line-dedup output is vacuous"
    for r in rows:
        assert r.n_removed == r.n_lines - r.n_unique > 0
    emitted = {r.doc_id for r in rows}
    missing = [i for i in range(0, 500, 5) if i not in emitted]
    assert not missing, f"injected duplicates not detected: {missing[:5]}"


def test_bloom_screen_has_no_false_negatives(spark, sf_dir):
    """A94: the Bloom guarantee — every exactly-contaminated doc must be
    bloom-flagged (n_bloom_flagged ≥ n_exact per stratum, and the flag
    sets nest doc-by-doc via n_false_pos ≥ 0)."""
    from charlotte_spark.registry import load_all_queries

    out = load_all_queries()["a94_bloom_contamination"].fn(spark, sf_dir).collect()
    assert out, "screen must produce at least one stratum"
    for r in out:
        assert r["n_bloom_flagged"] >= r["n_exact"], r
        assert r["n_false_pos"] == r["n_bloom_flagged"] - r["n_exact"], r
        assert r["n_bloom_flagged"] <= r["n_train_docs"], r


def test_countmin_estimates_bound_truth(spark, sf_dir):
    """A96: Count-Min one-sided error — every estimate ≥ the exact
    count, and overcount ≤ ε·N with ε = e/w (the standard CM bound;
    deterministic here because the hash family is fixed)."""
    import math

    from pyspark.sql import functions as F

    from charlotte_spark.registry import load_all_queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_total = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    eps_bound = math.e / 1024 * n_total
    rows = load_all_queries()["a96_countmin_sketch"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["ok_lower"] == 1 and r["n_est"] >= r["n_exact"], r
        assert r["overcount"] <= eps_bound, (r, eps_bound)


def test_pagerank_mass_and_floor(spark, sf_dir):
    """D97: every rank ≥ the teleport floor (1 − d) = 0.15, and total
    rank mass stays within the damping geometry's bounds — with rank₀=1
    per node, total mass after any iteration is N·(1−d)·Σdᵏ-shaped and
    must stay within [0.15·N, N] for a stochastic-ish symmetric graph."""
    from charlotte_spark.registry import load_all_queries

    rows = load_all_queries()["d97_pagerank"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pr"] for r in rows)
    assert all(r["pr"] >= 0.15 for r in rows)
    # symmetric edge construction conserves contribution mass exactly:
    # Σr_{t+1} = 0.15·N + 0.85·Σr_t, fixed point = N
    assert 0.9 * n <= total <= 1.1 * n


def test_scd2_intervals_partition_history(spark, sf_dir):
    """D98: per customer, versions are dense from 1; intervals chain
    (valid_to of version k equals valid_from of version k+1); exactly
    one open (is_current) interval per customer; consecutive versions
    never repeat a status."""
    from collections import defaultdict

    from charlotte_spark.registry import load_all_queries

    rows = load_all_queries()["d98_scd2_history"].fn(spark, sf_dir).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    assert by_cust
    for cust, hist in by_cust.items():
        hist.sort(key=lambda r: r["version"])
        assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))
        assert sum(h["is_current"] for h in hist) == 1
        assert hist[-1]["is_current"] == 1
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"], (cust, a, b)
            assert a["status"] != b["status"], (cust, a, b)


def test_unpivot_inverts_pivot(spark, sf_dir):
    """D91: pivoting a long aggregate wide and unpivoting it back must
    reproduce the long form exactly (reshape round-trip identity)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    long = (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    statuses = ["F", "O", "P"]
    wide = (
        long.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.first("n"))
    )
    back = (
        wide.unpivot(["o_orderpriority"], statuses, "o_orderstatus", "n")
        .filter(F.col("n").isNotNull())
    )
    a = sorted(map(tuple, long.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_funnel_stages_are_monotone(spark, sf_dir):
    """D103: later funnel stages can never exceed earlier ones, and the
    conversion ratio is consistent with the stage counts."""
    from charlotte_spark.registry import load_all_queries

    r = load_all_queries()["d103_conversion_funnel"].fn(spark, sf_dir).collect()[0]
    assert r["n_signup"] >= r["n_click"] >= r["n_purchase"] >= 0
    if r["n_signup"]:
        assert abs(r["conversion"] - r["n_purchase"] / r["n_signup"]) < 1e-4


def test_weighted_sample_invariants(spark, sf_dir):
    """D122: exactly k rows, ranks are 1..k, keys strictly descend with
    rank (ties broken by doc_id), and every key is in (0, 1] — the
    Efraimidis-Spirakis u^(1/w) range."""
    from charlotte_spark.registry import load_all_queries

    rows = load_all_queries()["d122_weighted_sample"].fn(spark, sf_dir).collect()
    assert len(rows) == 100
    assert [r["rk"] for r in rows] == list(range(1, 101))
    keys = [r["sample_key"] for r in rows]
    assert all(0.0 < k <= 1.0 for k in keys)
    assert keys == sorted(keys, reverse=True)
    assert all(r["weight"] > 0 for r in rows)


def test_span_removal_bounds_and_consistency(spark, sf_dir):
    """D124: removal accounting is a coverage union — for every doc
    0 ≤ n_removed ≤ n_tokens, n_kept = n_tokens − n_removed, and the
    removed fraction can only be 1.0 when the whole doc is covered."""
    from charlotte_spark.registry import load_all_queries

    rows = load_all_queries()["d124_span_removal"].fn(spark, sf_dir).collect()
    assert rows, "span-removal output is vacuous"
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_tokens"], r
        assert r["n_kept"] == r["n_tokens"] - r["n_removed"], r
    assert any(r["n_removed"] > 0 for r in rows), (
        "no duplicated spans detected anywhere — statistic is vacuous"
    )


def test_cidr_enrichment_partitions_events(spark, sf_dir):
    """D130: every event lands in exactly one bucket (blocks are
    disjoint), so per-block counts sum to the event-table count and the
    'unassigned' bucket is present (gaps are deliberate)."""
    from charlotte_spark.catalog import load_table
    from charlotte_spark.registry import load_all_queries

    rows = load_all_queries()["d130_cidr_enrichment"].fn(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    assert "unassigned" in {r["block"] for r in rows}
    for r in rows:
        assert 0 < r["n_users"] <= r["n_events"], r


def test_selfjoin_estimate_is_one_sided(spark, sf_dir):
    """A134: the Count-Min inner-product estimate never undercounts the
    true self-join size (cells sum colliding keys, squares are convex),
    and the exact F2 equals the brute-force per-key computation."""
    from charlotte_spark.catalog import load_table
    from charlotte_spark.registry import load_all_queries

    row = load_all_queries()["a134_selfjoin_size"].fn(spark, sf_dir).collect()[0]
    assert row["est_f2"] >= row["exact_f2"]
    assert row["rel_error"] >= 0.0
    counts = (
        load_table(spark, sf_dir, "events").groupBy("user_id").count().collect()
    )
    assert row["exact_f2"] == sum(r["count"] ** 2 for r in counts)


def test_semantic_dedup_tile_size_invariant(spark, duck, sf_dir, monkeypatch):
    """D118: the tiled Gram must be value-identical at ANY tile size —
    force tiny tiles (16) so every cluster spans many row/column tiles
    (the path a 100 TB cluster hits), and require the exact oracle
    match the default-tile run passes."""
    import charlotte_spark.queries.similarity as sim
    from charlotte_spark.registry import load_all_queries

    from .conftest import assert_oracle_match

    monkeypatch.setattr(sim, "_GRAM_TILE", 16)
    q = load_all_queries()["d118_semantic_dedup"]
    assert_oracle_match(q.fn(spark, sf_dir), duck, q.oracle, "d118_tile16")


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_ordered_prefix_equals_naive_global_window(spark, n_parts):
    """The distributed prefix operator must be value-identical to the
    naive single-partition window at every bucket count — including
    n_parts far smaller/larger than the data spread, repeated keys
    (tie-broken by the unique k), and a fork-sensitive double read of
    the SAME returned frame (the r6 regression shape: two consumers of
    one ordered_prefix output must see one consistent materialization)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from charlotte_spark.operators.prefix import ordered_prefix

    rows = [(i, (i * 37) % 11, float((i * 13) % 29)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, grp long, x double")

    got = ordered_prefix(
        df,
        ["grp", "k"],
        running={"run_x": "x"},
        row_number="rn",
        totals={"tot_x": "x"},
        count_total="n",
        n_parts=n_parts,
    )
    # fork the OUTPUT: join it to itself on k — identical rn required
    forked = got.alias("a").join(got.alias("b"), "k").filter(
        F.col("a.rn") != F.col("b.rn")
    )
    assert forked.count() == 0

    w = W.orderBy("grp", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    want = df.select(
        "k",
        F.sum("x").over(w).alias("run_x"),
        F.row_number().over(w).alias("rn"),
        F.sum("x").over(wt).alias("tot_x"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    g = {r["k"]: r for r in got.select("k", "run_x", "rn", "tot_x", "n").collect()}
    for r in want.collect():
        a = g[r["k"]]
        assert a["rn"] == r["rn"], (r["k"], a["rn"], r["rn"])
        assert abs(a["run_x"] - r["run_x"]) < 1e-9
        assert abs(a["tot_x"] - r["tot_x"]) < 1e-9
        assert a["n"] == r["n"]


@pytest.mark.parametrize("n_parts", [1, 2, 5])
def test_grouped_prefix_equals_naive_grouped_window(spark, n_parts):
    """group_cols mode must be value-identical to
    Window.partitionBy(grp).orderBy(k) at every bucket count — buckets
    smaller than / equal to / larger than the group count, groups that
    span bucket boundaries, a single-row group, and integer + float
    running columns together."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from charlotte_spark.operators.prefix import ordered_prefix

    # (i*i)%10 only ever hits {0,1,4,5,6,9}, so sending the i==9 row to
    # grp=3 makes group 3 a guaranteed SINGLE-ROW group (the edge case
    # the grouped prefix must not mangle); group sizes stay uneven.
    rows = [(i, (i * i) % 10 if i != 9 else 3, float((i * 13) % 29), (i * 7) % 5)
            for i in range(200)]
    df = spark.createDataFrame(rows, "k long, grp long, x double, w long")

    got = ordered_prefix(
        df,
        ["k"],
        group_cols=["grp"],
        running={"run_x": "x", "run_w": "w"},
        row_number="rn",
        totals={"tot_w": "w"},
        count_total="n",
        n_parts=n_parts,
    )
    w = W.partitionBy("grp").orderBy("k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy("grp").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    want = df.select(
        "k",
        F.sum("x").over(w).alias("run_x"),
        F.sum("w").over(w).alias("run_w"),
        F.row_number().over(w).alias("rn"),
        F.sum("w").over(wt).alias("tot_w"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    g = {r["k"]: r for r in
         got.select("k", "run_x", "run_w", "rn", "tot_w", "n").collect()}
    assert len(g) == 200
    for r in want.collect():
        a = g[r["k"]]
        assert a["rn"] == r["rn"], (r["k"], a["rn"], r["rn"])
        assert a["run_w"] == r["run_w"]
        assert a["tot_w"] == r["tot_w"]
        assert a["n"] == r["n"]
        assert abs(a["run_x"] - r["run_x"]) < 1e-9


@pytest.mark.parametrize("cut", ["1990-01-01", "2010-01-01"])
def test_incremental_rollup_cut_invariant(spark, duck, sf_dir, monkeypatch, cut):
    """D161: the merged rollup must equal the full rollup for ANY
    base/delta split — including the degenerate cuts where base or
    delta is EMPTY (first refresh ever / no-op refresh), which the
    default mid-range cut never exercises."""
    import charlotte_spark.queries.reshape as rs
    from charlotte_spark.registry import load_all_queries

    from .conftest import assert_oracle_match

    monkeypatch.setattr(rs, "_IVM_CUT", cut)
    q = load_all_queries()["d161_incremental_rollup"]
    assert_oracle_match(q.fn(spark, sf_dir), duck, q.oracle, f"d161_cut_{cut}")


@settings(max_examples=300, deadline=None)
@given(
    caps=st.lists(st.integers(min_value=1, max_value=5000), min_size=2, max_size=25),
    ws=st.lists(st.integers(min_value=1, max_value=9), min_size=25, max_size=25),
    frac=st.integers(min_value=5, max_value=95),
)
def test_waterfill_predicate_equals_iterative(caps, ws, frac):
    """D173's window formulation — saturated iff
    cap·(W − W_k) < w·(B − C_k) on the capacity/weight ascending order,
    computed with break-free running sums exactly as SQL windows do —
    must agree with iterative (bisection) waterfilling: same saturated
    set, and the resulting allocation spends the budget exactly."""
    ws = ws[: len(caps)]
    n = len(caps)
    B = sum(caps) * frac // 100
    if B <= 0:
        return
    # iterative ground truth
    lo, hi = 0.0, max(c / w for c, w in zip(caps, ws)) + B
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid * w) for c, w in zip(caps, ws)) < B:
            lo = mid
        else:
            hi = mid
    lam_true = (lo + hi) / 2
    sat_true = [c < lam_true * w - 1e-9 for c, w in zip(caps, ws)]

    # window formulation (break-free, as in the SQL/DataFrame plan)
    order = sorted(range(n), key=lambda i: (caps[i] / ws[i], i))
    W = sum(ws)
    ck = wk = 0
    sat = [False] * n
    for i in order:
        ck += caps[i]
        wk += ws[i]
        if W > wk and caps[i] * (W - wk) < ws[i] * (B - ck):
            sat[i] = True
    c_sat = sum(caps[i] for i in range(n) if sat[i])
    w_sat = sum(ws[i] for i in range(n) if sat[i])
    lam = (B - c_sat) / (W - w_sat)
    alloc = sum(caps[i] if sat[i] else lam * ws[i] for i in range(n))

    assert sat == sat_true
    assert abs(alloc - B) < 1e-6 * max(B, 1)


def test_curation_loop_placement_is_append_only(duck):
    """d187: packing must never move or revisit earlier rounds' shards —
    per language, cursor_after is strictly cumulative and a later
    round's first bin is never BELOW an earlier round's last bin (an
    arrival may top off the current open shard, never an earlier one).
    Checked on the oracle's own output so the invariant is pinned at
    the semantics level, independent of either engine."""
    from charlotte_spark.queries.traindata import _d187_oracle

    rows = duck.execute(_d187_oracle()).fetchall()
    assert rows, "ledger is empty"
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r[1], []).append(r)
    cols = [d[0] for d in duck.description]
    i = {c: j for j, c in enumerate(cols)}
    for lang, lrows in by_lang.items():
        lrows.sort(key=lambda r: r[i["round_id"]])
        prev_cursor, prev_last_bin = 0, -1
        for r in lrows:
            assert r[i["cursor_after"]] == prev_cursor + r[i["tokens_packed"]], (
                lang, r[i["round_id"]], "cursor not cumulative")
            if r[i["n_accepted"]] > 0:
                assert r[i["bin_first"]] >= prev_last_bin, (
                    lang, r[i["round_id"]], "round packed into a frozen shard")
                assert r[i["bin_first"]] <= r[i["bin_last"]]
                prev_last_bin = r[i["bin_last"]]
            prev_cursor = r[i["cursor_after"]]


def test_chained_grouped_prefixes_are_consistent(spark):
    """Two grouped ordered_prefix calls where the second CONSUMES the
    first's output (the d183-mixture-then-pack shape): the chained
    values must equal the naive double-window formulation, and the
    second call's materialization must not corrupt the first's (the
    cache-eviction contract covers chained calls by construction —
    the new cache's count() reads the previous one)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from charlotte_spark.operators.prefix import ordered_prefix

    rows = [(i, (i * 3) % 4, 1 + (i * 7) % 9) for i in range(120)]
    df = spark.createDataFrame(rows, "k long, grp long, w long")

    first = ordered_prefix(
        df, ["k"], group_cols=["grp"], running={"r1": "w"},
        totals={"t1": "w"}, n_parts=3,
    )
    # second prefix over the first's SURVIVORS (a data-dependent subset)
    kept = first.filter(F.col("r1") * 2 <= F.col("t1"))
    second = ordered_prefix(
        kept, ["k"], group_cols=["grp"], running={"r2": "w"}, n_parts=3,
    )
    got = {r["k"]: (r["r1"], r["r2"]) for r in second.collect()}

    w1 = W.partitionBy("grp").orderBy("k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy("grp").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    naive1 = df.select(
        "k", "grp", "w",
        F.sum("w").over(w1).alias("r1"),
        F.sum("w").over(wt).alias("t1"),
    )
    naive2 = naive1.filter(F.col("r1") * 2 <= F.col("t1")).select(
        "k", "r1", F.sum("w").over(w1).alias("r2")
    )
    want = {r["k"]: (r["r1"], r["r2"]) for r in naive2.collect()}
    assert got == want


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_fused_prefix_chain_equals_chained_windows(spark, n_parts):
    """ordered_prefix_chain (VERDICT r11 #3): a two-stage chain whose
    second stage derives its running input row-locally from the first
    stage's outputs (the d183 mixture→pack shape) must be value-
    identical to the naive chained-window formulation at every bucket
    count — including buckets that split groups and a stage-2 input
    that zeroes most rows."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from charlotte_spark.operators.prefix import (
        PrefixStage,
        ordered_prefix_chain,
    )

    rows = [(i, (i * 3) % 4, 1 + (i * 7) % 9) for i in range(150)]
    df = spark.createDataFrame(rows, "k long, grp long, w long")

    got_df = ordered_prefix_chain(
        df,
        ["k"],
        group_cols=["grp"],
        stages=[
            PrefixStage(running={"r1": "w"}, totals={"t1": "w"}),
            PrefixStage(
                derive=lambda cur: cur.withColumn(
                    "w2",
                    F.when(
                        F.col("r1") * 2 <= F.col("t1"), F.col("w")
                    ).otherwise(F.lit(0)),
                ),
                running={"r2": "w2"},
                row_number="rn2",
                count_total="n2",
            ),
        ],
        n_parts=n_parts,
    )
    got = {r["k"]: (r["r1"], r["t1"], r["r2"], r["rn2"], r["n2"])
           for r in got_df.collect()}

    w1 = W.partitionBy("grp").orderBy("k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy("grp").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    naive = df.select(
        "k", "grp", "w",
        F.sum("w").over(w1).alias("r1"),
        F.sum("w").over(wt).alias("t1"),
    ).withColumn(
        "w2",
        F.when(F.col("r1") * 2 <= F.col("t1"), F.col("w")).otherwise(F.lit(0)),
    ).select(
        "k", "r1", "t1",
        F.sum("w2").over(w1).alias("r2"),
        F.row_number().over(w1).alias("rn2"),
        F.count(F.lit(1)).over(wt).alias("n2"),
    )
    want = {r["k"]: (r["r1"], r["t1"], r["r2"], r["rn2"], r["n2"])
            for r in naive.collect()}
    assert got == want


def test_bpe_merge_application_is_greedy(spark):
    """d188's double-space merge trick must implement BPE's greedy
    left-to-right non-overlapping semantics — including the adjacent
    chain a plain single-space replace silently half-misses — and must
    never merge across token boundaries (substring corruption)."""
    from pyspark.sql import functions as F

    def greedy_merge(seq: str, l: str, r: str) -> str:
        """Reference BPE merge (the get_stats/merge_vocab semantics)."""
        syms = seq.split(" ")
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " ".join(out)

    cases = [
        ("a b a b a b", "a", "b"),      # adjacent chain: all three merge
        ("a a a", "a", "a"),            # overlap: greedy-left -> "aa a"
        ("x c a b", "a", "b"),          # plain interior merge
        ("c a b", "ca", "b"),           # 'ca b': NO ' a b' boundary bleed
        ("ab a b ab", "a", "b"),        # merged symbol already present
        ("q", "a", "b"),                # single symbol, no pairs
        ("a b", "a", "b"),              # whole seq merges
        ("b a b a", "a", "b"),          # chain offset by one
    ]
    df = spark.createDataFrame(
        [(s, l, r) for s, l, r in cases], "seq string, l string, r string"
    )
    # the exact column recipe d188 uses, parameterized by columns
    doubled = F.concat(F.lit(" "), F.regexp_replace("seq", " ", "  "), F.lit(" "))
    pat = F.concat(F.lit(" "), F.col("l"), F.lit("  "), F.col("r"), F.lit(" "))
    rep = F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" "))
    merged = F.trim(F.regexp_replace(F.replace(doubled, pat, rep), " +", " "))
    got = {r["seq"]: r["m"] for r in df.select("seq", merged.alias("m")).collect()}
    for seq, l, r in cases:
        assert got[seq] == greedy_merge(seq, l, r), (seq, l, r, got[seq])


# ---------------------------------------------------------------------------
# D195/D200: content-defined chunking properties
# ---------------------------------------------------------------------------


def _ref_cdc_chunks(toks: list[str]) -> list[str]:
    """Straight-line Python reference of the d195 CDC chunker: boundary
    closes after position i (1-based, i >= 3) when the portable hash of
    the 3-gram ending at i is ≡ 0 (mod 8); chunk hashes = md5 of the
    space-joined chunk tokens, one entry per occurrence."""
    import hashlib

    def h(g: str) -> int:
        return int(hashlib.md5(("cdc|" + g).encode()).hexdigest()[:8], 16)

    n = len(toks)
    bpos = [i for i in range(3, n + 1) if h(" ".join(toks[i - 3 : i])) % 8 == 0]
    starts = [1] + [p + 1 for p in bpos]
    ends = bpos + [n]
    return [
        hashlib.md5(" ".join(toks[s - 1 : e]).encode()).hexdigest()
        for s, e in zip(starts, ends)
        if s <= e
    ]


def test_cdc_chunker_matches_reference_and_partitions(spark):
    """The d195 Spark array-expression chunker must produce exactly the
    reference chunk-hash sequence on a 200-doc pseudo-random sweep (one
    Spark job), and the reference's chunks must PARTITION the document:
    every token in exactly one chunk, concatenation reconstructs it."""
    import hashlib

    from pyspark.sql import functions as F

    from charlotte_spark.queries.textstats import _cdc_chunk_hashes

    rng_words = ["alpha", "b", "cc", "data", "e5", "fox", "g", "hi", "jk", "l9"]
    docs = []
    for i in range(200):
        n = 4 + (i * 7919) % 37
        toks = [rng_words[(i * 31 + j * j * 17) % len(rng_words)] for j in range(n)]
        docs.append((i, toks))

    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {
        r["doc_id"]: list(r["h"])
        for r in df.select(
            "doc_id", _cdc_chunk_hashes(F.col("toks"), distinct=False).alias("h")
        ).collect()
    }
    for i, toks in docs:
        ref = _ref_cdc_chunks(toks)
        assert got[i] == ref, f"doc {i}: spark={got[i][:3]} ref={ref[:3]}"
        # partition property: chunks cover every token exactly once
        joined = []
        n = len(toks)
        bpos = [
            p
            for p in range(3, n + 1)
            if int(
                hashlib.md5(("cdc|" + " ".join(toks[p - 3 : p])).encode()).hexdigest()[:8],
                16,
            )
            % 8
            == 0
        ]
        starts = [1] + [q + 1 for q in bpos]
        ends = bpos + [n]
        for s, e in zip(starts, ends):
            if s <= e:
                joined.extend(toks[s - 1 : e])
        assert joined == toks, f"doc {i}: chunks do not partition the tokens"


@settings(max_examples=150, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    n=st.integers(min_value=6, max_value=48),
    p=st.integers(min_value=0, max_value=47),
)
def test_cdc_edit_locality(seed, n, p):
    """CDC's reason to exist: a single-token substitution at position p
    can only disturb chunks whose token span intersects [p-2, p+2] (the
    3-gram window reach) — every chunk fully outside that window must
    survive the edit with an identical hash (multiset containment).
    Pure-Python on the reference chunker; the reference==Spark identity
    is pinned by test_cdc_chunker_matches_reference_and_partitions."""
    import hashlib
    from collections import Counter

    words = ["w%d" % ((seed * 131 + k * k * 7) % 23) for k in range(n)]
    p = p % n
    edited = list(words)
    edited[p] = "EDIT"
    if edited[p] == words[p]:
        edited[p] = "EDIT2"

    def spans(toks):
        m = len(toks)
        bpos = [
            i
            for i in range(3, m + 1)
            if int(
                hashlib.md5(("cdc|" + " ".join(toks[i - 3 : i])).encode()).hexdigest()[:8],
                16,
            )
            % 8
            == 0
        ]
        starts = [1] + [q + 1 for q in bpos]
        ends = bpos + [m]
        return [
            (s, e, hashlib.md5(" ".join(toks[s - 1 : e]).encode()).hexdigest())
            for s, e in zip(starts, ends)
            if s <= e
        ]

    before = spans(words)
    after_hashes = Counter(h for _, _, h in spans(edited))
    # A chunk [s,e] depends on the boundary DECISIONS ending at
    # positions s-1 .. e (the gram at s-1 starts it; grams inside keep
    # it unsplit; the gram at e closes it). An edit at 1-based q only
    # changes grams ending at q .. q+2, so chunks with e < q or
    # s >= q + 4 must survive byte-identically.
    q = p + 1
    for s, e, h in before:
        if e < q or s >= q + 4:
            assert after_hashes[h] > 0, (
                f"chunk [{s},{e}] outside edit reach (q={q}) did not survive"
            )
            after_hashes[h] -= 1


def test_staged_cdc_equals_inline_expression(spark):
    """The plan-compile optimization (with_cdc_chunks, staged columns)
    must be VALUE-identical to the inline expression _cdc_chunk_hashes
    on the same docs — distinct and occurrence variants both, checked
    on a 150-doc pseudo-random sweep in one Spark job. (End-to-end the
    d195/d200 oracles pin this too; this pins it at the unit level so
    a future edit to either formulation fails here first.)"""
    from pyspark.sql import functions as F

    from charlotte_spark.queries.textstats import (
        _cdc_chunk_hashes,
        with_cdc_chunks,
    )

    words = ["alpha", "b", "cc", "data", "e5", "fox", "g", "hi", "jk", "l9"]
    docs = []
    for i in range(150):
        n = 4 + (i * 6151) % 41
        docs.append(
            (i, [words[(i * 37 + j * j * 13) % len(words)] for j in range(n)])
        )
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    for distinct in (True, False):
        staged = with_cdc_chunks(df, "toks", "h", distinct=distinct)
        both = staged.withColumn(
            "h_inline", _cdc_chunk_hashes(F.col("toks"), distinct=distinct)
        )
        diff = both.filter(F.col("h") != F.col("h_inline")).count()
        assert diff == 0, f"staged != inline for distinct={distinct}"


def test_min_label_components_covers_deep_chains(spark):
    """The shared CC engine (_min_label_components, used by d74/d212)
    must reach the exact component minimum on a DEEP chain well beyond
    the old linear round budget — pointer jumping covers diameter
    2^rounds, so a 40-long path (diameter 40 > the 11-round safety
    bound) converges where linear propagation would not. Compared
    against a brute-force union-find closure."""
    from charlotte_spark.queries.dedup import _min_label_components

    # components: one 41-node path (ids 0..40), one star (100..110),
    # one triangle (200,201,202), singletons are absent by definition
    pairs = [(i, i + 1) for i in range(40)]
    pairs += [(100, x) for x in range(101, 111)]
    pairs += [(200, 201), (201, 202), (200, 202)]

    # brute-force exact closure
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    ).repartition("src")
    got = {r["id"]: r["lbl"] for r in _min_label_components(
        edges, scratch_tag="testchain"
    ).collect()}
    assert got == want, {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]}


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_min_label_components_random_graphs(spark, seed):
    """Randomized-graph check of the shared CC engine: Erdos-Renyi-ish
    sparse graphs (mixed component sizes, cycles, bridges) must match a
    union-find closure exactly — not just the seeded star/chain shapes
    the queries construct."""
    import random

    from charlotte_spark.queries.dedup import _min_label_components

    rng = random.Random(seed)
    n = 120
    pairs = set()
    for _ in range(140):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    ).repartition("src")
    got = {r["id"]: r["lbl"] for r in _min_label_components(
        edges, scratch_tag=f"rand{seed}"
    ).collect()}
    assert got == want


def test_fused_prefix_chain_three_stages(spark):
    """A THREE-stage ordered_prefix_chain (each stage deriving from the
    previous stage's running output) must equal the naive triple-window
    formulation — pins that the chain generalizes past the two-stage
    d183 shape."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from charlotte_spark.operators.prefix import (
        PrefixStage,
        ordered_prefix_chain,
    )

    rows = [(i, (i * 5) % 3, 1 + (i * 11) % 6) for i in range(90)]
    df = spark.createDataFrame(rows, "k long, grp long, w long")

    got_df = ordered_prefix_chain(
        df,
        ["k"],
        group_cols=["grp"],
        stages=[
            PrefixStage(running={"r1": "w"}, totals={"t1": "w"}),
            PrefixStage(
                derive=lambda c: c.withColumn(
                    "w2",
                    F.when(F.col("r1") * 3 <= F.col("t1") * 2, F.col("w"))
                    .otherwise(F.lit(0)),
                ),
                running={"r2": "w2"},
            ),
            PrefixStage(
                derive=lambda c: c.withColumn(
                    "w3", F.when(F.col("r2") % 2 == 0, F.lit(1)).otherwise(F.lit(0))
                ),
                running={"r3": "w3"},
                row_number="rn",
            ),
        ],
        n_parts=4,
    )
    got = {r["k"]: (r["r1"], r["r2"], r["r3"], r["rn"]) for r in got_df.collect()}

    w1 = W.partitionBy("grp").orderBy("k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy("grp").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    naive = (
        df.select(
            "k", "grp", "w",
            F.sum("w").over(w1).alias("r1"),
            F.sum("w").over(wt).alias("t1"),
        )
        .withColumn(
            "w2",
            F.when(F.col("r1") * 3 <= F.col("t1") * 2, F.col("w")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("r2", F.sum("w2").over(w1))
        .withColumn(
            "w3", F.when(F.col("r2") % 2 == 0, F.lit(1)).otherwise(F.lit(0))
        )
        .select(
            "k", "r1", "r2",
            F.sum("w3").over(w1).alias("r3"),
            F.row_number().over(w1).alias("rn"),
        )
    )
    want = {r["k"]: (r["r1"], r["r2"], r["r3"], r["rn"]) for r in naive.collect()}
    assert got == want


def test_d215_miss_accounting_fires(spark):
    """d215's cross-cell miss accounting (VERDICT r12 #3) must COUNT a
    twin that straddles a cell boundary — the registered query measures
    0 because exact copies assign consistently, so this constructs the
    miss: u = e0 + 0.995*e1 lands in cell 0 (kept there as a prior-
    generation index entry), its near-twin u' = 0.995*e0 + e1 lands in
    cell 1 (cos(u, u') = 1.99/1.990025 ≈ 0.999987 ≥ τ=0.9999), so the
    cell-keyed probe keeps u' and the sampled exact side must report it
    as a missed twin. A third, orthogonal arrival (e2 → cell 0 by the
    tie-break) must NOT be counted."""
    from charlotte_spark.queries.similarity import (
        _assign_cells,
        _d215_flags,
        _d215_miss_stats,
    )

    dim = 64

    def onehot(i, scale=1.0):
        return [scale if j == i else 0.0 for j in range(dim)]

    def mix(i, wi, j, wj):
        return [
            (wi if k == i else 0.0) + (wj if k == j else 0.0)
            for k in range(dim)
        ]

    cents = spark.createDataFrame(
        [(0, onehot(0)), (1, onehot(1))], "cell long, cv array<double>"
    )
    u = mix(0, 1.0, 1, 0.995)   # prior keep, cell 0
    up = mix(0, 0.995, 1, 1.0)  # arrival twin, assigns to cell 1
    idx = spark.createDataFrame(
        [(100, u, 0)], "vec_id long, v array<double>, cell long"
    )
    batch = spark.createDataFrame(
        [(200, up), (300, onehot(2))], "vec_id long, v array<double>"
    )
    assigned = _assign_cells(batch, cents)
    got_cells = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert got_cells == {200: 1, 300: 0}, got_cells

    status = _d215_flags(assigned, idx)
    st = {r["vec_id"]: r["status"] for r in status.collect()}
    # the in-cell probe CANNOT see u (cell 0) from u' (cell 1)
    assert st == {200: "kept", 300: "kept"}, st

    miss = {
        r["cell"]: (r["n_probes"], r["n_missed_twin"])
        for r in _d215_miss_stats(assigned, status, idx).collect()
    }
    assert miss == {1: (1, 1), 0: (1, 0)}, miss


def test_hilbert_index_matches_reference(spark):
    """d219's unrolled SQL Hilbert walk must equal the canonical
    iterative xy2d reference bit-for-bit, and the resulting curve must
    be CONTINUOUS (consecutive d values are grid neighbors — the
    property that makes Hilbert ordering strictly locality-preserving,
    and the one a transcription error breaks instantly)."""
    from pyspark.sql import functions as F

    from charlotte_spark.queries.dataops import _Z_BITS, hilbert_stages

    n = 1 << _Z_BITS

    def xy2d(x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    import random

    rng = random.Random(219)
    pts = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    pts += [(0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1), (64, 127)]
    df = spark.createDataFrame(pts, "x int, y int")
    h = df.withColumn("hx0", F.col("x")).withColumn("hy0", F.col("y")).withColumn(
        "hd0", F.lit(0)
    )
    for i, (nx, ny, dterm) in enumerate(hilbert_stages("hx0", "hy0")):
        nx = nx.replace("hx0", f"hx{i}").replace("hy0", f"hy{i}")
        ny = ny.replace("hx0", f"hx{i}").replace("hy0", f"hy{i}")
        dterm = dterm.replace("hx0", f"hx{i}").replace("hy0", f"hy{i}")
        h = (
            h.withColumn(f"hx{i + 1}", F.expr(nx))
            .withColumn(f"hy{i + 1}", F.expr(ny))
            .withColumn(f"hd{i + 1}", F.col(f"hd{i}") + F.expr(dterm))
        )
    got = {
        (r["x"], r["y"]): r[f"hd{_Z_BITS}"]
        for r in h.select("x", "y", f"hd{_Z_BITS}").collect()
    }
    for (x, y), d in got.items():
        assert d == xy2d(x, y), f"({x},{y}): sql={d} ref={xy2d(x, y)}"

    # continuity: d and d+1 map to grid neighbors (reference d2xy walk)
    def d2xy(d):
        x = y = 0
        t = d
        s = 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        return x, y

    for d in [0, 1, 255, 4095, 65534] + [rng.randrange(n * n - 1) for _ in range(50)]:
        (x1, y1), (x2, y2) = d2xy(d), d2xy(d + 1)
        assert abs(x1 - x2) + abs(y1 - y2) == 1, f"curve jumps at d={d}"
        assert xy2d(x1, y1) == d and xy2d(x2, y2) == d + 1


def test_dp_laplace_draw_is_calibrated(spark):
    """d216's deterministic hash→inverse-CDF draw must actually BE
    Laplace(scale): over many synthetic group keys, the noise sample's
    mean ≈ 0 and mean |noise| ≈ scale (the Laplace MAD identity), and
    the draw is reproducible call-to-call — the property that makes
    retries epsilon-free."""
    from pyspark.sql import functions as F

    from charlotte_spark.queries.statsops import _dp_laplace, _dp_uniform

    scale = 2.0
    keys = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    noise = keys.select(
        _dp_laplace(_dp_uniform(F.col("k"), "cal216"), scale).alias("x")
    )
    row = noise.agg(
        F.avg("x").alias("mu"),
        F.avg(F.abs(F.col("x"))).alias("mad"),
        F.max(F.abs(F.col("x"))).alias("mx"),
    ).collect()[0]
    # Laplace(b): E[X]=0, E|X|=b; 4000 draws put the sample mean within
    # ~4*b*sqrt(2)/sqrt(n) ≈ 0.18 of 0 and the MAD within ~10% of b
    assert abs(row["mu"]) < 0.2, f"noise mean {row['mu']}"
    assert abs(row["mad"] - scale) < 0.2 * scale, f"MAD {row['mad']} vs {scale}"
    assert row["mx"] < scale * 20, "inverse CDF blew up near |u|=0.5"
    # reproducibility: the identical expression yields identical values
    again = noise.agg(F.avg("x"), F.avg(F.abs(F.col("x")))).collect()[0]
    assert (again[0], again[1]) == (row["mu"], row["mad"])


def test_dp_release_secret_salt_contract(spark, sf_dir):
    """d216's DP contract (VERDICT r13 #2) has two halves, both pinned:

    1. SECRET-SENSITIVITY — releases under different secrets differ on
       every group (the noise is a function of the salt, so an attacker
       without the salt cannot recompute it; with a hard-coded seed the
       r13 version was invertible by construction);
    2. REPLAY-STABILITY — one secret replays bit-identically, the
       property that keeps task retries / speculative execution from
       spending fresh epsilon.

    Also pins that the released values are NOT the true counts (the
    noise never degenerates to zero on real groups)."""
    from charlotte_spark.queries.statsops import d216_dp_noisy_release

    def rows(secret):
        return {
            (r["source"], r["lang"]): (r["noisy_n"], r["noisy_chars"])
            for r in d216_dp_noisy_release(
                spark, sf_dir, dp_secret=secret
            ).collect()
        }

    a1, a2, b = rows("secret-A"), rows("secret-A"), rows("secret-B")
    assert a1 == a2, "same secret must replay bit-identically"
    assert set(a1) == set(b), "group keys must not depend on the secret"
    diff = [k for k in a1 if a1[k] != b[k]]
    # Continuous Laplace draws off a 1e6 grid: a collision on any group,
    # let alone all, means the secret is not reaching the hash.
    assert len(diff) == len(a1), f"only {len(diff)}/{len(a1)} groups differ"
    # The release must never publish the exact true counts.
    from pyspark.sql import functions as F

    from charlotte_spark.catalog import load_table

    true = {
        (r["source"], r["lang"]): r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    leaked = [k for k, (noisy_n, _) in a1.items() if noisy_n == true[k]]
    assert not leaked, f"noisy_n equals the true count on {leaked}"


def test_salt_planner_caps_every_bucket(spark):
    """d218's arithmetic must deliver its contract on any key skew:
    after splitting key k into salt_factor(k) buckets, NO bucket
    exceeds cap = ceil(total / target), and uniform keys keep
    salt_factor == 1 (no replication cost)."""
    import math
    import random

    from charlotte_spark.queries.reshape import _D218_TARGET_TASKS

    rng = random.Random(218)
    # heavy skew: one key with half the mass, a hot tier, a uniform tail
    counts = {0: 50_000}
    for k in range(1, 6):
        counts[k] = rng.randrange(5_000, 15_000)
    for k in range(6, 200):
        counts[k] = rng.randrange(50, 400)
    total = sum(counts.values())
    cap = max(1.0, math.ceil(total / _D218_TARGET_TASKS))
    for k, n in counts.items():
        salt = math.ceil(n / cap)
        max_bucket = math.ceil(n / salt)
        assert max_bucket <= cap, (k, n, salt, max_bucket, cap)
    uniform_cap = max(1.0, math.ceil(total / _D218_TARGET_TASKS))
    for k in range(6, 200):
        assert math.ceil(counts[k] / uniform_cap) == 1, "tail key got salted"


def test_mmr_greedy_invariant_vs_independent_reimplementation(spark, sf_dir):
    """d228: an independent pure-Python greedy over the same pool must
    reproduce the engine's slate exactly — pick 1 is the max-relevance
    doc, every later pick maximizes lambda*rel - (1-lambda)*max-cosine
    -to-selected over the remaining pool, ties to the lower doc_id.
    This proves the unrolled-DataFrame greedy IS MMR, independent of
    the DuckDB oracle sharing its formulation."""
    import math

    from pyspark.sql import functions as F

    from charlotte_spark.queries.corpus_search import (
        _D228_LAM,
        _D228_OM,
        _D228_POOL,
        _D228_SELECT,
        _d225_fused_ranked,
        d228_mmr_rerank,
    )
    from charlotte_spark.catalog import load_table

    pool_rows = (
        _d225_fused_ranked(spark, sf_dir)
        .filter(F.col("fused_rk") <= _D228_POOL)
        .select("query_id", "doc_id", "rrf_raw")
        .collect()
    )
    vec_rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in vec_rows}

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    expected = {}
    by_q: dict[int, list] = {}
    for r in pool_rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["rrf_raw"]))
    for q, cands in by_q.items():
        rel = dict(cands)
        selected = []
        # pick 1: max rel, tie -> lower doc_id
        first = min(rel, key=lambda d: (-rel[d], d))
        selected.append(first)
        while len(selected) < _D228_SELECT:
            best, best_key = None, None
            for d in rel:
                if d in selected:
                    continue
                ms = max(cos(vecs[d], vecs[s]) for s in selected)
                score = _D228_LAM * rel[d] - _D228_OM * ms
                key = (-score, d)
                if best_key is None or key < best_key:
                    best, best_key = d, key
            selected.append(best)
        expected[q] = selected

    got = {}
    for r in d228_mmr_rerank(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append((r["sel_rank"], r["doc_id"]))
    for q in expected:
        ordered = [d for _, d in sorted(got[q])]
        assert ordered == expected[q], (q, ordered, expected[q])


def test_pq_is_exact_on_subspace_clustered_data(spark, tmp_path):
    """a229: on a corpus whose sub-vectors are EXACTLY drawn from 8
    distinct points per subspace — with the first 8 vectors laying out
    each point once, so the deterministic init IS the true codebook —
    Lloyd's is a fixpoint, encoding is lossless, and ADC distances
    equal exact distances: recall@10 must be 1.0 and every probe's
    true NN must sit at ADC rank 1. Fires if training, encoding, or
    the ADC table lookup drifts from PQ semantics."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from charlotte_spark.queries.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        a229_product_quantization,
    )

    rng = random.Random(229)
    # 8 distinct sub-vector prototypes per subspace, well separated
    protos = [
        [
            [float(rng.randrange(-8, 9)) + 10.0 * k for _ in range(_PQ_SUBDIM)]
            for k in range(_PQ_K)
        ]
        for _ in range(_PQ_M)
    ]
    n = 40
    vecs = []
    for i in range(n):
        codes = (
            [i] * _PQ_M
            if i < _PQ_K
            else [rng.randrange(_PQ_K) for _ in range(_PQ_M)]
        )
        v = []
        for m in range(_PQ_M):
            v.extend(protos[m][codes[m]])
        vecs.append(v)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 4 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = a229_product_quantization(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r["recall_at_10"] == 1.0, dict(r.asDict())
        assert r["true_nn_adc_rank"] == 1, dict(r.asDict())
