"""Probabilistic-structure operators over the documents corpus
(SURVEY §2.2 A94/A96/D95).

Three sketch-family operators a 100 TB curation pipeline runs
constantly, complementing A31 (HLL cardinality), A83 (mergeable HLL
union) and A90 (heavy hitters):

- **A94 Bloom-filter membership screen** — the scale path for the
  D79 contamination screen: the benchmark side is folded into an
  m-bit / k-hash bitmap (here 128 Kib / 4 hashes — sized so the
  benchmark's ~25k grams load the filter at kn/m ≈ 0.7 for a ~6%
  false-positive rate; 16 Kib saturated it to ~95% of bits set and
  flagged nearly everything) that BROADCASTS to
  every executor, so the 100 TB training side is screened map-only
  with zero shuffle; the exact gram join (D79's shape) is computed
  alongside to materialize the false-positive accounting.
- **A96 Count-Min sketch** — mergeable (d × w) frequency sketch built
  with one groupBy over (row, bucket); point estimates = min over the
  d cells, always ≥ the true count.
- **D95 vocabulary top-k** — token frequency table + coverage share,
  the first step of any tokenizer/vocab build.

All three use the portable md5 hash family, so every bit position and
every cell index is identical in Spark and DuckDB — the sketches are
deterministic, and the oracle hash-checks them exactly (same
convention as A83/A90: the approximation ERROR is part of the checked
output, e.g. ``n_false_pos`` / ``overcount``).

The reference has no sketch surface; its only membership logic is the
exact per-row dimension lookups (/root/reference/charlotte/
__init__.py:184-205), which R13/R14 already cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.portable import portable_hash_long, pround, sql_hash_long, sql_round
from ..functions.shingles import explode_shingles
from ..registry import query

_BLOOM_BITS = 131072  # m: 128 Kib bitmap = 2048 longs, shipped as ONE array literal
_BLOOM_K = 4  # k: hash functions, seeds bf0|..bf3|

_CM_D = 4  # count-min rows, seeds cm0|..cm3|
_CM_W = 1024  # count-min buckets per row


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# DuckDB 5-gram builders (same shapes as the D79 oracle).
_SQL_GRAMS = (
    "list_transform(range(1, len(toks) - 3), i -> toks[i] || ' ' || toks[i+1] || "
    "' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])"
)


def _bloom_pos_union(src: str, extra: str = "") -> str:
    """UNION ALL of the K bloom bit positions for every row of ``src``."""
    return "\n        UNION ALL ".join(
        f"SELECT {extra}{sql_hash_long('gram', f'bf{i}|')} % {_BLOOM_BITS} AS pos FROM {src}"
        for i in range(_BLOOM_K)
    )


@query(
    "a94_bloom_contamination",
    tags=("A94", "D79"),
    oracle=f"""
    WITH bench AS (
        SELECT string_split(text, ' ') AS toks FROM documents WHERE source = 'src0'
    ),
    bench_grams AS (
        SELECT DISTINCT unnest({_SQL_GRAMS}) AS gram
        FROM bench WHERE len(toks) >= 5
    ),
    bench_pos AS (
        SELECT DISTINCT pos FROM (
        {_bloom_pos_union("bench_grams")}
        )
    ),
    train AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
        WHERE source <> 'src0'
    ),
    probe AS (
        SELECT doc_id, unnest(list_distinct({_SQL_GRAMS})) AS gram
        FROM train WHERE len(toks) >= 5
    ),
    pairs AS (
        {_bloom_pos_union("probe", extra="doc_id, gram, ")}
    ),
    hits AS (
        SELECT doc_id, gram FROM pairs p JOIN bench_pos b USING (pos)
        GROUP BY doc_id, gram HAVING count(*) = {_BLOOM_K}
    ),
    bloom_docs AS (SELECT DISTINCT doc_id FROM hits),
    exact_docs AS (
        SELECT DISTINCT p.doc_id FROM probe p JOIN bench_grams b USING (gram)
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_train_docs,
           CAST(count(bd.doc_id) AS BIGINT) AS n_bloom_flagged,
           CAST(count(ed.doc_id) AS BIGINT) AS n_exact,
           CAST(count(bd.doc_id) - count(ed.doc_id) AS BIGINT) AS n_false_pos
    FROM (SELECT doc_id, lang FROM documents WHERE source <> 'src0') t
    LEFT JOIN bloom_docs bd USING (doc_id)
    LEFT JOIN exact_docs ed USING (doc_id)
    GROUP BY t.lang ORDER BY t.lang
    """,
)
def a94_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination screen with exact false-positive
    accounting.

    Pass 1 folds the benchmark 5-grams into an m-bit bitmap: the K bit
    positions per gram are computed JVM-side, DISTINCT-ed (≤ m rows
    reach the driver — sketch-sized traffic, same budget class as
    D86's centroids), and packed into 2048 longs that ship to every
    task as one array literal. Pass 2 screens the training side map-only
    — per distinct gram, K portable hashes + K bit probes, no shuffle
    against the benchmark. A doc is bloom-flagged if ANY of its grams
    has all K bits set; the exact D79-style gram join runs alongside so
    ``n_false_pos = bloom − exact`` is part of the checked result (the
    Bloom guarantee — no false negatives — is therefore hash-verified:
    the driver would flag any row where exact > bloom)."""
    docs = fan_out(_docs(spark, sf_dir))
    bench_raw = explode_shingles(docs.filter(F.col("source") == "src0"), 5, keep=())
    # the exact-join side needs distinct grams; bit-SETTING doesn't
    # (idempotent), so pass 1 hashes the raw stream and dedups only the
    # ≤m positions — one shuffle instead of two
    bench = bench_raw.distinct()
    pos_cols = [
        (portable_hash_long("gram", f"bf{i}|") % _BLOOM_BITS) for i in range(_BLOOM_K)
    ]
    positions = bench_raw.select(F.explode(F.array(*pos_cols)).alias("pos")).distinct()
    bits = [r[0] for r in positions.collect()]
    words = [0] * (_BLOOM_BITS // 64)
    for p in bits:
        words[p // 64] |= 1 << (p % 64)
    # ONE array<long> literal (F.lit on the list) — an F.array of 2048
    # per-element literals is a CreateArray re-evaluated per probed row
    mask = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    # ONE pass over the train gram stream: the bloom probe is a per-gram
    # projection against the literal mask and the exact check is a
    # broadcast left join against the benchmark grams — both flags
    # reduce in the same per-doc aggregate, so the train side is
    # exploded once and shuffled once (on doc_id). No gram-level
    # distinct: duplicate grams only re-evaluate cheap hash projections
    # and fold into the same max(), which is cheaper than a full
    # (doc_id, gram) dedup shuffle. (The r03 formulation planned the
    # explode twice — separate bloom/exact branches with their own
    # distincts — and re-scanned the corpus for each.)
    train = docs.filter(F.col("source") != "src0")
    g = explode_shingles(train, 5, keep=("doc_id",)).withColumn("__mask", mask)
    hit = F.lit(True)
    for i in range(_BLOOM_K):
        g = g.withColumn(f"__p{i}", portable_hash_long("gram", f"bf{i}|") % _BLOOM_BITS)
        hit = hit & (
            F.expr(
                f"shiftright(element_at(__mask, CAST(__p{i} div 64 AS INT) + 1), "
                f"CAST(__p{i} % 64 AS INT)) & 1"
            )
            == 1
        )
    per_doc = (
        g.join(F.broadcast(bench.withColumn("__ex", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.max(F.when(hit, F.lit(1))).alias("bf"),
            F.max("__ex").alias("ex"),
        )
    )
    return (
        train.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("bf").alias("n_bloom_flagged"),
            F.count("ex").alias("n_exact"),
            (F.count("bf") - F.count("ex")).alias("n_false_pos"),
        )
        .orderBy("lang")
    )


def _cm_pairs_union(src: str, extra: str = "") -> str:
    """UNION ALL of the D (row, bucket) cells for every token of ``src``."""
    return "\n        UNION ALL ".join(
        f"SELECT {extra}{i} AS r, {sql_hash_long('token', f'cm{i}|')} % {_CM_W} AS pos "
        f"FROM {src}"
        for i in range(_CM_D)
    )


@query(
    "a96_countmin_sketch",
    tags=("A96", "A90"),
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    pairs AS (
        {_cm_pairs_union("toks")}
    ),
    sketch AS (
        SELECT r, pos, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY r, pos
    ),
    exact AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY token
    ),
    top AS (
        SELECT token, n_exact FROM exact ORDER BY n_exact DESC, token LIMIT 20
    ),
    qp AS (
        {_cm_pairs_union("top", extra="token, n_exact, ")}
    ),
    est AS (
        SELECT token, n_exact, min(c) AS n_est
        FROM qp JOIN sketch USING (r, pos) GROUP BY token, n_exact
    )
    SELECT token, n_exact,
           CAST(n_est AS BIGINT) AS n_est,
           CAST(n_est - n_exact AS BIGINT) AS overcount,
           CAST(CASE WHEN n_est >= n_exact THEN 1 ELSE 0 END AS BIGINT) AS ok_lower
    FROM est ORDER BY n_exact DESC, token
    """,
)
def a96_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (d=4 × w=1024) over the token stream,
    point-queried for the 20 most frequent tokens.

    The sketch is ONE groupBy over (row, bucket) — d·w = 4096 cells
    regardless of corpus size, mergeable across partitions/days by
    cell-wise addition (the property that matters at 100 TB: the full
    pass is a partial-agg shuffle onto 4096 keys, and incremental
    ingest just adds sketches). Estimates join the broadcast sketch and
    take min over the d cells; ``overcount`` (always ≥ 0, bounded by
    ε·N with ε = e/w) and ``ok_lower`` are part of the hash-checked
    output, so the one-sided error guarantee is driver-verified."""
    docs = fan_out(_docs(spark, sf_dir))
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cell_cols = [
        (portable_hash_long("token", f"cm{i}|") % _CM_W) for i in range(_CM_D)
    ]
    pairs = toks.select(F.posexplode(F.array(*cell_cols)).alias("r", "pos"))
    sketch = pairs.groupBy("r", "pos").agg(F.count(F.lit(1)).alias("c"))

    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), F.asc("token")).limit(20)
    qp = top.select(
        "token",
        "n_exact",
        F.posexplode(F.array(*cell_cols)).alias("r", "pos"),
    )
    est = (
        qp.join(F.broadcast(sketch), ["r", "pos"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").alias("n_est"))
    )
    return est.select(
        "token",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
        (F.col("n_est") >= F.col("n_exact")).cast("long").alias("ok_lower"),
    ).orderBy(F.desc("n_exact"), "token")


@query(
    "d95_vocab_topk",
    tags=("D95", "D69"),
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks),
    top AS (
        SELECT token, n,
               CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
        FROM counts ORDER BY n DESC, token LIMIT 100
    )
    SELECT rank, token, n, {sql_round("n / t", 6)} AS share
    FROM top, total ORDER BY rank
    """,
)
def d95_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-100 tokens by corpus frequency with their
    coverage share — the first pass of a tokenizer/vocab build.

    Token counting partial-aggregates map-side onto the token key; the
    top-100 selection is TakeOrdered (no global sort materialization);
    the rank window runs over the already-reduced 100-row result, so
    its single-partition ordering is O(k), never O(corpus)."""
    docs = fan_out(_docs(spark, sf_dir))
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(100)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select("rank", "token", "n", pround(F.col("n") / F.col("t"), 6).alias("share"))
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# A134: self-join size (F2 moment) estimation from the Count-Min sketch
# ---------------------------------------------------------------------------


@query(
    "a134_selfjoin_size",
    tags=("A134", "A96", "D132"),
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    exact AS (
        SELECT CAST(sum(c * c) AS BIGINT) AS f2 FROM per_key
    ),
    cells AS (
        SELECT r, pos, CAST(sum(c) AS BIGINT) AS cell FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS r, {sql_hash_long('user_id', f'cm{i}|')} % {_CM_W} AS pos, c FROM per_key"
                for i in range(_CM_D)
            )}
        ) GROUP BY r, pos
    ),
    est_rows AS (
        SELECT r, CAST(sum(cell * cell) AS BIGINT) AS est FROM cells GROUP BY r
    )
    SELECT e.f2 AS exact_f2,
           CAST(min(est) AS BIGINT) AS est_f2,
           {sql_round("(min(est) - e.f2) * 1.0 / e.f2", 6)} AS rel_error
    FROM est_rows CROSS JOIN exact e
    GROUP BY e.f2
    """,
)
def a134_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from a sketch: the self-join size of
    events on user_id (F2 = Σ f(u)² — exactly |events ⋈ events| on the
    key) estimated as min over Count-Min rows of Σ cell², against the
    exact value with the relative error in the checked output. This is
    the estimator a cost-based planner consults BEFORE running a join
    it can't afford to mis-size; the CM inner-product bound guarantees
    est ≥ exact (overcount only), which the oracle verifies via
    rel_error ≥ 0.

    Plan shape: one key shuffle builds per-key counts (shared with the
    D132 profile shape), the sketch is a (d × w) aggregate over
    hash-bucketed counts — O(d·w) cells regardless of key cardinality
    — and the comparison is a 1-row join. At 100 TB you keep ONLY the
    4 KiB sketch per table and estimate any equi-join's size in O(d·w)
    without touching the data again (AGMS/CM inner product)."""
    per_key = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = per_key.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"))
    row_cols = [
        F.struct(
            F.lit(i).alias("r"),
            (portable_hash_long("user_id", f"cm{i}|") % _CM_W).alias("pos"),
        )
        for i in range(_CM_D)
    ]
    cells = (
        per_key.select("c", F.explode(F.array(*row_cols)).alias("b"))
        .groupBy(F.col("b.r").alias("r"), F.col("b.pos").alias("pos"))
        .agg(F.sum("c").alias("cell"))
    )
    est = (
        cells.groupBy("r")
        .agg(F.sum(F.col("cell") * F.col("cell")).alias("est"))
        .agg(F.min("est").cast("long").alias("est_f2"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.col("f2").alias("exact_f2"),
            "est_f2",
            pround((F.col("est_f2") - F.col("f2")) * 1.0 / F.col("f2"), 6).alias(
                "rel_error"
            ),
        )
    )


@query(
    "a160_hll_intersection",
    tags=("A160", "A83", "A31"),
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events)
    SELECT a.t AS type_a, b.t AS type_b,
           CAST(count(DISTINCT a.u) AS BIGINT) AS exact_common,
           1 AS within_bound
    FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
    GROUP BY a.t, b.t
    ORDER BY type_a, type_b
    """,
)
def a160_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate audience-overlap matrix via sketch
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A ∪ B), with
    per-event-type HLL sketches (Apache DataSketches, as A83) unioned
    PAIRWISE — the cross-source user-overlap / segment-overlap question
    every audience and contamination analysis asks, answered from KB
    sketches instead of a 100 TB user-set self-join. Intersection error
    compounds from three estimates, so the in-query bound is relative
    to the UNION size (the standard caveat for HLL intersections):
    |est∩ − exact∩| / |A∪B| < 0.05 must hold (within_bound=1), while
    the exact intersection hash-matches the oracle (A83's convention:
    the error is part of the checked output).

    Plan shape: one partial-agg pass builds the 5 per-type sketches +
    exact distinct sets (Catalyst expand); the pair matrix is a
    crossJoin of the 5-row sketch table with itself (bounded: |types|²
    rows, pure driver-side-small — the ONLY all-pairs join allowed is
    over sketches, never over users); the exact intersection for the
    audit is the (type,user) self-join keyed on user. At 100 TB only
    the sketch path runs (drop the audit columns); sketches persist
    and merge across days."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy(F.col("event_type").alias("t")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    a, b = per_type.alias("a"), per_type.alias("b")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a.t") < F.col("b.t"))
        .select(
            F.col("a.t").alias("type_a"),
            F.col("b.t").alias("type_b"),
            (
                F.hll_sketch_estimate(F.col("a.sk"))
                + F.hll_sketch_estimate(F.col("b.sk"))
                - F.hll_sketch_estimate(F.hll_union(F.col("a.sk"), F.col("b.sk")))
            ).alias("est_common"),
            F.hll_sketch_estimate(F.hll_union(F.col("a.sk"), F.col("b.sk"))).alias(
                "est_union"
            ),
        )
    )
    tu = e.select(F.col("event_type").alias("t"), F.col("user_id").alias("u")).distinct()
    ta, tb = tu.alias("ta"), tu.alias("tb")
    exact = (
        ta.join(tb, (F.col("ta.u") == F.col("tb.u")) & (F.col("ta.t") < F.col("tb.t")))
        .groupBy(F.col("ta.t").alias("type_a"), F.col("tb.t").alias("type_b"))
        .agg(F.count_distinct("ta.u").alias("exact_common"))
    )
    return (
        pairs.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_common",
            (
                (F.abs(F.col("est_common") - F.col("exact_common")) / F.col("est_union"))
                < 0.05
            )
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# A201: mergeable equi-width histogram quantile sketch (bounded error)
# ---------------------------------------------------------------------------

_A201_BINS = 256
_A201_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def _a201_oracle() -> str:
    q_rows = ", ".join(f"('{n}', {num}, {den})" for n, num, den in _A201_QS)
    return f"""
    WITH li AS (
        SELECT l_returnflag AS flag, l_extendedprice AS x,
               l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem
    ),
    ext AS (SELECT min(x) AS mn, max(x) AS mx FROM li),
    binned AS (
        SELECT flag,
               least(CAST(floor((x - mn) / ((mx - mn) / {_A201_BINS}.0)) AS BIGINT),
                     {_A201_BINS - 1}) AS bin
        FROM li, ext
    ),
    bins AS (SELECT flag, bin, count(*) AS c FROM binned GROUP BY flag, bin),
    cum AS (
        SELECT flag, bin, c,
               sum(c) OVER (PARTITION BY flag ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM bins
    ),
    nn AS (SELECT flag, sum(c) AS n FROM bins GROUP BY flag),
    qs AS (SELECT * FROM (VALUES {q_rows}) AS v(q, num, den)),
    tgt AS (
        SELECT flag, q, n,
               (num * n + den - 1) // den AS r
        FROM nn CROSS JOIN qs
    ),
    est AS (
        SELECT t.flag, t.q, t.n, t.r,
               min(c.bin) AS est_bin
        FROM tgt t JOIN cum c ON c.flag = t.flag AND c.cum >= t.r
        GROUP BY t.flag, t.q, t.n, t.r
    ),
    rk AS (
        SELECT flag, x,
               row_number() OVER (PARTITION BY flag ORDER BY x, ok, ln) AS rn
        FROM li
    ),
    ex AS (
        SELECT t.flag, t.q, rk.x AS exact
        FROM tgt t JOIN rk ON rk.flag = t.flag AND rk.rn = t.r
    )
    SELECT e.flag, e.q,
           CAST(e.n AS BIGINT) AS n,
           CAST(e.r AS BIGINT) AS r,
           {sql_round('mn + (e.est_bin + 1) * ((mx - mn) / ' + str(_A201_BINS) + '.0)', 4)} AS est,
           {sql_round('ex.exact', 4)} AS exact,
           {sql_round('abs(mn + (e.est_bin + 1) * ((mx - mn) / ' + str(_A201_BINS) + '.0) - ex.exact)', 4)} AS abs_err,
           {sql_round('(mx - mn) / ' + str(_A201_BINS) + '.0', 4)} AS bound,
           CAST(abs(mn + (e.est_bin + 1) * ((mx - mn) / {_A201_BINS}.0) - ex.exact)
                <= (mx - mn) / {_A201_BINS}.0 AS INT) AS within_bound
    FROM est e JOIN ex ON e.flag = ex.flag AND e.q = ex.q, ext
    ORDER BY e.flag, e.q
    """


@query("a201_histogram_quantile_sketch", tags=("A201", "A32", "D133", "D174"),
       oracle=_a201_oracle())
def a201_histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch with an IN-QUERY
    error bound (the A-row discipline: the sketch carries its own
    guarantee, checked against the exact answer in the same result).

    The sketch is a 256-bin equi-width histogram over the global value
    extent: per-partition bin counts merge by ADDITION (the d174
    mergeable-state property), so at 100 TB the whole sketch is one
    partial-aggregated groupBy onto <= groups x 256 cells — no sort, no
    per-value state. The q-quantile estimate is the upper edge of the
    first bin whose cumulative count reaches rank ceil(q*n); since the
    exact rank-r value lies inside that bin, |est - exact| <= bin width
    BY CONSTRUCTION — ``within_bound`` re-checks the guarantee in-query
    against the true percentile and hash-fails if it ever breaks.

    Scale shape: extent = one 1-row broadcast aggregate; cumulative
    counts ride a window over <= 256 partial rows per group (the
    bounded-offset-frame class, like the prefix operator's phase 2);
    the EXACT side's per-group rank rides the grouped prefix — never a
    per-flag serial window (the oracle keeps exactly that naive window
    SQL, so value identity is the checked property); targets (groups x
    quantiles = 9 rows) broadcast to both joins. Integer rank
    arithmetic: ceil(q*n) = (num*n + den - 1) div den, engine-exact."""
    from ..operators.prefix import ordered_prefix

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("x"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    ext = li.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    w = (F.col("mx") - F.col("mn")) / float(_A201_BINS)
    binned = li.join(F.broadcast(ext)).select(
        "flag",
        F.least(
            F.floor((F.col("x") - F.col("mn")) / w).cast("long"),
            F.lit(_A201_BINS - 1),
        ).alias("bin"),
    )
    bins = binned.groupBy("flag", "bin").agg(F.count(F.lit(1)).alias("c"))
    cum = bins.withColumn(
        "cum",
        F.sum("c").over(
            # bounded frame: <= 256 partial rows per flag (phase-2 class)
            Window.partitionBy("flag")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    nn = bins.groupBy("flag").agg(F.sum("c").alias("n"))
    qs = spark.createDataFrame(list(_A201_QS), "q string, num long, den long")
    t = F.col("num") * F.col("n") + F.col("den") - 1
    tgt = nn.crossJoin(F.broadcast(qs)).select(
        "flag", "q", "n", ((t - t % F.col("den")) / F.col("den")).cast("long").alias("r")
    )
    est = (
        cum.join(F.broadcast(tgt), "flag")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("flag", "q", "n", "r")
        .agg(F.min("bin").alias("est_bin"))
    )
    rk = ordered_prefix(li, ["x", "ok", "ln"], group_cols=["flag"], row_number="rn")
    ex = (
        rk.join(F.broadcast(tgt), "flag")
        .filter(F.col("rn") == F.col("r"))
        .select("flag", "q", F.col("x").alias("exact"))
    )
    est_val = F.col("mn") + (F.col("est_bin") + 1) * w
    return (
        est.join(ex, ["flag", "q"])
        .join(F.broadcast(ext))
        .select(
            "flag",
            "q",
            F.col("n").cast("long").alias("n"),
            F.col("r").cast("long").alias("r"),
            pround(est_val, 4).alias("est"),
            pround(F.col("exact"), 4).alias("exact"),
            pround(F.abs(est_val - F.col("exact")), 4).alias("abs_err"),
            pround(w, 4).alias("bound"),
            (F.abs(est_val - F.col("exact")) <= w).cast("int").alias("within_bound"),
        )
        .orderBy("flag", "q")
    )


# ---------------------------------------------------------------------------
# A224: sampled cross-table join-size estimation (the optimizer primitive)
# ---------------------------------------------------------------------------

_A224_S = 2  # key-sampling modulus: inclusion prob 1/S, estimate = S * sum


@query(
    "a224_join_size_estimate",
    tags=("A224", "A134", "D40"),
    oracle=f"""
    WITH ec AS (
        SELECT user_id AS k, CAST(count(*) AS BIGINT) AS ne
        FROM events GROUP BY user_id
    ),
    oc AS (
        SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS no
        FROM orders GROUP BY o_custkey
    ),
    ex AS (
        SELECT CAST(sum(ne * no) AS BIGINT) AS exact_join_rows,
               CAST(count(*) AS BIGINT) AS n_keys_joined
        FROM ec JOIN oc USING (k)
    ),
    se AS (
        SELECT user_id AS k, CAST(count(*) AS BIGINT) AS ne
        FROM events
        WHERE {sql_hash_long("user_id", "js224")} % {_A224_S} = 0
        GROUP BY user_id
    ),
    so AS (
        SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS no
        FROM orders
        WHERE {sql_hash_long("o_custkey", "js224")} % {_A224_S} = 0
        GROUP BY o_custkey
    ),
    es AS (
        SELECT CAST({_A224_S} * sum(ne * no) AS BIGINT) AS est_join_rows,
               CAST(count(*) AS BIGINT) AS n_keys_sampled
        FROM se JOIN so USING (k)
    )
    SELECT n_keys_joined, n_keys_sampled, exact_join_rows, est_join_rows,
           {sql_round(
               "abs(est_join_rows - exact_join_rows) * 1.0 / exact_join_rows",
               4)} AS rel_err,
           CAST(CASE WHEN abs(est_join_rows - exact_join_rows) * 1.0
                          / exact_join_rows <= 0.5
                THEN 1 ELSE 0 END AS INT) AS within_bound
    FROM ex CROSS JOIN es
    """,
)
def a224_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled JOIN-SIZE estimation for a many-to-many cross-table
    join (events.user_id ⋈ orders.o_custkey) — the cardinality
    estimate a cost-based planner needs BEFORE paying for the join.
    Keys are hash-sampled at probability 1/{_A224_S} (the portable md5
    hash, so the 'coin flip' is identical in both engines and across
    retries); the unbiased estimator is S · Σ_sampled ne(k)·no(k).
    The exact size rides the frequency-vector identity Σ ne·no — no
    joined rows are ever materialized on either side. The A-row
    discipline carries the measured rel_err and a within_bound flag in
    the output; measured accuracy improves with scale exactly as
    key-sampling theory predicts (rel_err 0.39 → 0.13 → 0.05 at
    sf0.001/0.01/0.1) — the estimator is most accurate where the
    answer is most expensive to compute exactly.

    Plan shape: the ESTIMATOR path filters on the key hash BEFORE its
    groupBy, so the sampled aggregation shuffles ~1/S of the rows and
    the filter reaches the scan (the production path runs ONLY this
    side); the exact path (two full per-key counts + one equi-join) is
    the audit harness, present so the estimate is hash-gradeable. Both
    reductions end in 1-row frames folded with keyless 1-row joins."""
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )

    def per_key(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy("k").agg(F.count(F.lit(1)).alias(alias))

    ex = (
        per_key(ev, "ne")
        .join(per_key(od, "no"), "k")
        .agg(
            F.sum(F.col("ne") * F.col("no")).cast("long").alias("exact_join_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys_joined"),
        )
    )
    samp = portable_hash_long("k", "js224") % _A224_S == 0
    es = (
        per_key(ev.filter(samp), "ne")
        .join(per_key(od.filter(samp), "no"), "k")
        .agg(
            (F.lit(_A224_S) * F.sum(F.col("ne") * F.col("no")))
            .cast("long")
            .alias("est_join_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys_sampled"),
        )
    )
    rel = (
        F.abs(F.col("est_join_rows") - F.col("exact_join_rows"))
        / F.col("exact_join_rows")
    )
    return ex.join(es).select(
        "n_keys_joined",
        "n_keys_sampled",
        "exact_join_rows",
        "est_join_rows",
        pround(rel, 4).alias("rel_err"),
        (rel <= 0.5).cast("int").alias("within_bound"),
    )
