"""Approximate matching & retrieval primitives (SURVEY §2.2
D105–D107).

Three corpus/catalog operators rounding out the text-pipeline surface:
fuzzy record reconciliation (typo-tolerant matching of a dirty catalog
back to a master list — the entity-resolution shape), collocation
extraction by pointwise mutual information (corpus phrase mining), and
an inverted-index build (the retrieval primitive under every search
stack).

Scale notes: the fuzzy join is BLOCKED — candidate pairs come from an
equality join on a cheap blocking key (first token + next initial), so
edit distance runs on O(block²) pairs per block, never all-pairs (the
same never-all-pairs discipline as A66's LSH). PMI and the inverted
index are one-to-two groupBy shuffles on the token key with map-side
partial aggregation; posting lists are built per token, top-k selected
via TakeOrdered.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.digest import sql_two_level_digest, two_level_digest
from ..functions.portable import pround, sql_round
from ..functions.shingles import explode_shingles
from ..registry import query


@query(
    "d105_fuzzy_reconcile",
    tags=("D105", "A66"),
    oracle="""
    WITH clean AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[1] || ' ' || substring(string_split(p_name, ' ')[2], 1, 1) AS blk
        FROM part
    ),
    dirty AS (
        SELECT p_partkey AS d_key, p_name || 'x' AS d_name, blk
        FROM clean WHERE p_partkey % 3 = 0
    ),
    cand AS (
        SELECT d.d_key, c.p_partkey AS c_key,
               levenshtein(d.d_name, c.p_name) AS dist
        FROM dirty d JOIN clean c USING (blk)
        WHERE abs(len(d.d_name) - len(c.p_name)) <= 1
          AND levenshtein(d.d_name, c.p_name) <= 1
    ),
    best AS (
        SELECT d_key, min(dist) AS best_d,
               CAST(count(*) AS BIGINT) AS n_cand,
               min(CASE WHEN c_key = d_key THEN dist END) AS self_d
        FROM cand GROUP BY d_key
    )
    SELECT CAST((SELECT count(*) FROM dirty) AS BIGINT) AS n_dirty,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN self_d IS NOT NULL AND self_d = best_d
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN n_cand > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ambiguous
    FROM best
    """,
)
def d105_fuzzy_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant catalog reconciliation: a deterministically
    corrupted copy of every 3rd part name (one appended character) is
    matched back to the master list by Levenshtein distance ≤ 1 inside
    BLOCKS keyed on (first token, initial of second token) — the
    entity-resolution recipe: cheap blocking key for candidate
    generation, exact edit distance only within blocks. The checked
    output includes recovery accuracy (did the true partkey win?) and
    ambiguity count, so matching quality — not just plumbing — is
    hash-verified. Levenshtein is an exact DP, identical across
    engines."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    toks = F.split("p_name", " ")
    blk = F.concat(
        F.element_at(toks, 1), F.lit(" "), F.substring(F.element_at(toks, 2), 1, 1)
    )
    clean = p.withColumn("blk", blk)
    dirty = clean.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("d_key"),
        F.concat("p_name", F.lit("x")).alias("d_name"),
        "blk",
    )
    cand = (
        # fan_out (r15, guide §2.5 input skew): part is ONE parquet file
        # at test SFs, so the broadcast join streamed every block's
        # Levenshtein DP through a single task (measured: the whole
        # 4.4 s noop ran as 1 task); round-robin the probe side so the
        # DP stage uses the full core count. At 100 TB the scan has
        # natural splits and the exchange is noise next to the DP.
        fan_out(dirty).join(clean, "blk")
        # length prefilter: |len diff| ≤ 1 is NECESSARY for lev ≤ 1 and
        # costs O(1) vs the O(len²) DP — prunes most block pairs first
        .filter(F.abs(F.length("d_name") - F.length("p_name")) <= 1)
        # thresholded levenshtein early-exits the DP past distance 1
        # (returns -1 above the bound) — same kept pairs, less work
        .withColumn("dist", F.levenshtein("d_name", "p_name", 1))
        .filter(F.col("dist") >= 0)
        .select("d_key", F.col("p_partkey").alias("c_key"), "dist")
    )
    # correctness probed INSIDE the same aggregate (min over the
    # self-match case), so the blocked edit-distance join is consumed
    # exactly once — no second pass, no checkpoint needed
    best = cand.groupBy("d_key").agg(
        F.min("dist").alias("best_d"),
        F.count(F.lit(1)).alias("n_cand"),
        F.min(F.when(F.col("c_key") == F.col("d_key"), F.col("dist"))).alias("self_d"),
    )
    # n_dirty computed inside the plan (a 1-row scalar broadcast — the
    # d113/d106 pattern) instead of an eager .count() job at query
    # construction time: the query stays lazy and single-.explain()able.
    # The resulting BroadcastNestedLoopJoin is 1×1 rows by construction;
    # test_fuzzy_join_is_blocked_not_cartesian distinguishes it from an
    # all-pairs candidate join by its IdentityBroadcastMode scalar build.
    n_dirty = dirty.agg(F.count(F.lit(1)).cast("long").alias("n_dirty"))
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(
            (F.col("self_d").isNotNull() & (F.col("self_d") == F.col("best_d"))).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_correct"),
        F.sum((F.col("n_cand") > 1).cast("int")).cast("long").alias("n_ambiguous"),
    ).crossJoin(F.broadcast(n_dirty))


@query(
    "d106_pmi_collocations",
    tags=("D106", "D70"),
    oracle=f"""
    WITH docs AS (
        SELECT string_split(text, ' ') AS toks FROM documents
    ),
    uni AS (
        SELECT unnest(toks) AS w FROM docs
    ),
    ucnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
    ),
    utot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM uni),
    bi AS (
        SELECT unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM docs WHERE len(toks) >= 2
    ),
    bcnt AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS cab FROM bi GROUP BY gram
    ),
    btot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bi),
    top AS (
        SELECT gram, cab FROM bcnt ORDER BY cab DESC, gram LIMIT 20
    )
    SELECT t.gram, t.cab,
           {sql_round("ln((t.cab * 1.0 / b.nb) / ((a.c * 1.0 / u.nu) * (c2.c * 1.0 / u.nu)))", 4)} AS pmi
    FROM top t
    JOIN ucnt a ON a.w = string_split(t.gram, ' ')[1]
    JOIN ucnt c2 ON c2.w = string_split(t.gram, ' ')[2]
    CROSS JOIN utot u CROSS JOIN btot b
    ORDER BY t.cab DESC, t.gram
    """,
)
def d106_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the 20 most frequent word bigrams scored by
    pointwise mutual information, PMI = ln(p(ab) / (p(a)·p(b))) — the
    classic corpus phrase-extraction statistic (Church & Hanks 1990).

    Unigram and bigram counting are each one partial-agg shuffle on the
    token key; PMI joins touch only the top-20 bigrams against the
    unigram table (at 100 TB the top-k side is 20 rows — the unigram
    lookups broadcast the QUERY side, never the vocabulary). ln is
    IEEE-identical across engines; probabilities divide BIGINT counts
    in DOUBLE."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    uni = docs.select(F.explode(F.split("text", " ")).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    utot = uni.agg(F.count(F.lit(1)).alias("nu"))
    bi = explode_shingles(docs, 2, keep=())
    bcnt = bi.groupBy("gram").agg(F.count(F.lit(1)).alias("cab"))
    btot = bi.agg(F.count(F.lit(1)).alias("nb"))
    top = bcnt.orderBy(F.desc("cab"), F.asc("gram")).limit(20)
    split = F.split("gram", " ")
    top = top.withColumn("w1", F.element_at(split, 1)).withColumn(
        "w2", F.element_at(split, 2)
    )
    a = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    b = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    joined = (
        top.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
    )
    pmi = F.log(
        (F.col("cab") * 1.0 / F.col("nb"))
        / ((F.col("ca") * 1.0 / F.col("nu")) * (F.col("cb") * 1.0 / F.col("nu")))
    )
    return joined.select("gram", "cab", pround(pmi, 4).alias("pmi")).orderBy(
        F.desc("cab"), "gram"
    )


@query(
    "d107_inverted_index",
    tags=("D107", "D69"),
    oracle=f"""
    SELECT token, df, postings_md5
    FROM ({sql_two_level_digest(
        "(SELECT DISTINCT unnest(string_split(text, ' ')) AS token, doc_id"
        " FROM documents)",
        ["token"],
        "CAST(doc_id AS VARCHAR)",
        count_alias="df",
        digest_alias="postings_md5",
    )})
    ORDER BY df DESC, token LIMIT 20
    """,
)
def d107_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → posting set of doc_ids, reported
    for the 20 highest-document-frequency terms with the posting lists
    verified by digest. The per-token fold is the shared TWO-LEVEL
    bucketed digest (functions/digest.py) — level 1 keys on (token,
    doc_id-bucket), level 2 folds <= B sub-digests per token — which IS
    the blocked posting layout production indexes use for
    stop-word-class tokens: at 100 TB a stop word's posting list is a
    meaningful fraction of the corpus, and a single collect_list buffer
    per token (the pre-r9 shape) put all of it on one reducer. df
    counts ride the same fold exactly (bucket membership is a pure
    function of doc_id)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    posting = docs.select(
        F.explode(F.split("text", " ")).alias("token"), "doc_id"
    ).distinct()
    idx = two_level_digest(
        posting,
        ["token"],
        F.col("doc_id").cast("string"),
        count_alias="df",
        digest_alias="postings_md5",
    )
    return idx.orderBy(F.desc("df"), "token").limit(20)


# ---------------------------------------------------------------------------
# D117: BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "d117_bm25_retrieval",
    tags=("D117", "D107", "D70"),
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS doclen FROM toks
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               avg(doclen * 1.0) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        WHERE w IN {_BM25_TERMS!r}
        GROUP BY doc_id, w
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id,
               ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.doclen / s.avgdl))
               AS part_score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT doc_id, bm25, rk FROM (
        SELECT doc_id, {sql_round("sum(part_score)", 4)} AS bm25,
               row_number() OVER (
                   ORDER BY {sql_round("sum(part_score)", 4)} DESC, doc_id) AS rk
        FROM scored GROUP BY doc_id
    ) WHERE rk <= 20
    ORDER BY rk
    """,
)
def d117_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; k1=1.2, b=0.75)
    for a fixed 4-term query over the documents corpus — the scoring
    layer on top of the D107 inverted index, and the lexical half of
    every retrieval stack next to the D68 ANN path.

    Plan shape: the term filter lands BEFORE the tf shuffle, so only
    postings for query terms move — at 100 TB the tf table is
    O(query_terms × matching docs), never O(corpus tokens). Document
    frequencies and corpus stats are 4-row / 1-row aggregates that
    broadcast back; the final ranking is a top-k over per-doc partial
    sums (TakeOrdered, no global sort). idf uses the +1 'Lucene'
    smoothing so scores stay positive; the rank orders by the ROUNDED
    score (ties broken by doc_id) so both engines agree at equal-score
    boundaries."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    dl = toks.select("doc_id", F.size("t").cast("long").alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("doclen") * 1.0).alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("doclen") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * (_BM25_K1 + 1.0)) / norm).alias("part_score"),
        )
    )
    # top-20 via orderBy+limit (TakeOrdered — no global-sort shuffle);
    # the rank window then runs over 20 rows, not the corpus
    top = (
        scored.groupBy("doc_id")
        .agg(pround(F.sum("part_score"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    w = W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())  # bounded: 20 rows
    return top.withColumn("rk", F.row_number().over(w)).orderBy("rk")


# ---------------------------------------------------------------------------
# D210: inter-source vocabulary divergence matrix (Jensen-Shannon)
# ---------------------------------------------------------------------------

_D210_TOPV = 200  # global vocabulary cap
_D210_SRC = 8  # sources in the reported matrix (src0..src7)


def _d210_oracle() -> str:
    return f"""
    WITH occ AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
        WHERE source IN ({", ".join(f"'src{i}'" for i in range(_D210_SRC))})
    ),
    cnt AS (
        SELECT source, term, count(*) AS c FROM occ
        WHERE length(term) > 0 GROUP BY source, term
    ),
    topv AS (
        SELECT term FROM (
            SELECT term, sum(c) AS g FROM cnt GROUP BY term
            ORDER BY g DESC, term ASC LIMIT {_D210_TOPV}
        )
    ),
    dense AS (
        SELECT s.source, t.term, coalesce(c.c, 0) AS c
        FROM (SELECT DISTINCT source FROM cnt) s
        CROSS JOIN topv t
        LEFT JOIN cnt c ON c.source = s.source AND c.term = t.term
    ),
    p AS (
        SELECT source, term,
               c * 1.0 / sum(c) OVER (PARTITION BY source) AS p
        FROM dense
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b, a.term,
               a.p AS pa, b.p AS pb, (a.p + b.p) / 2.0 AS m
        FROM p a JOIN p b ON a.term = b.term AND a.source < b.source
    )
    SELECT source_a, source_b,
           {sql_round(
               "sum(0.5 * (CASE WHEN pa > 0 THEN pa * ln(pa / m) ELSE 0 END) "
               "+ 0.5 * (CASE WHEN pb > 0 THEN pb * ln(pb / m) ELSE 0 END))", 4)}
               AS jsd
    FROM pairs GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """


@query("d210_source_divergence_matrix", tags=("D210", "D81", "D162", "D106"),
       oracle=_d210_oracle())
def d210_source_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source vocabulary divergence matrix — the mixture-design
    input d81/d100 weight FROM: pairwise Jensen-Shannon divergence of
    source unigram distributions over the global top-200 vocabulary
    (capped so the matrix measures how sources USE the common
    vocabulary, not their long tails). Low-JSD pairs are near-redundant
    sources a mixture should not double-weight; high-JSD pairs carry
    complementary text. JSD (symmetric, bounded by ln 2) beats raw KL
    here because sources with disjoint tail terms would send KL to
    infinity.

    Scale shape: per-source term counts are one partial-aggregated
    groupBy; the vocab cap is a global top-k (TakeOrdered — no full
    sort); the densified (source x top-V) frame is bounded by
    construction (8 x 200 rows), so per-source normalization windows
    and the term-keyed pair join all run on KB-scale data after the
    single corpus scan."""
    srcs = [f"src{i}" for i in range(_D210_SRC)]
    occ = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(srcs))
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.length("term") > 0)
    )
    cnt = occ.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    topv = (
        cnt.groupBy("term")
        .agg(F.sum("c").alias("g"))
        .orderBy(F.col("g").desc(), F.col("term").asc())
        .limit(_D210_TOPV)
        .select("term")
    )
    dense = (
        cnt.select("source").distinct()
        .crossJoin(F.broadcast(topv))  # bounded: 8 x 200 by construction
        .join(cnt, ["source", "term"], "left")
        .select("source", "term", F.coalesce("c", F.lit(0)).alias("c"))
    )
    p = dense.withColumn(
        # bounded: exactly top-V rows per source reach this window
        "p", F.col("c") * 1.0 / F.sum("c").over(W.partitionBy("source"))
    )
    a = p.select(F.col("source").alias("source_a"), "term", F.col("p").alias("pa"))
    b = p.select(F.col("source").alias("source_b"), "term", F.col("p").alias("pb"))
    pairs = a.join(b, "term").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("pa") + F.col("pb")) / 2.0
    kl = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(0.0)
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(pround(F.sum(0.5 * kl(F.col("pa")) + 0.5 * kl(F.col("pb"))), 4).alias("jsd"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# D225: hybrid retrieval fusion (BM25 + cosine, reciprocal-rank fusion)
# ---------------------------------------------------------------------------

_D225_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("spark", "hash", "join", "window"),  # the D117 query
    1: ("merge", "batch", "scan"),
    2: ("customer", "order", "stream"),
    3: ("vector", "filter", "group"),
}
_D225_RRF_K = 60  # Cormack/Clarke/Buettcher 2009 default
_D225_TOPK_PER_SYSTEM = 20
_D225_TOPK_FUSED = 10


def _d225_qmap(spark: SparkSession) -> DataFrame:
    """The compile-time (query_id, term) map as a frame — the ONE
    Spark-side rendering of ``_D225_QUERIES`` (mirrors the oracle's
    ``qterms`` VALUES list), so the fusion, passage, and metrics
    queries cannot drift onto differently-derived key frames."""
    return spark.createDataFrame(
        [(q, t) for q, ts in _D225_QUERIES.items() for t in ts],
        "query_id long, term string",
    )


def _d225_query_ids(spark: SparkSession) -> DataFrame:
    """The compile-time query-id key frame (== the oracle's
    ``SELECT DISTINCT query_id FROM qterms``)."""
    return spark.createDataFrame(
        [(q,) for q in sorted(_D225_QUERIES)], "query_id long"
    )


def _d225_cte() -> str:
    """Shared oracle CTE stack through ``fused`` — used by both the
    D225 fusion release and the D226 quality metrics over it."""
    from ..functions.vectors import sql_cosine as _sqlcos

    qterms = ", ".join(
        f"({q}, '{t}')" for q, ts in _D225_QUERIES.items() for t in ts
    )
    all_terms = tuple(sorted({t for ts in _D225_QUERIES.values() for t in ts}))
    n_probes = len(_D225_QUERIES)
    k1, b, k = _BM25_K1, _BM25_B, _D225_RRF_K
    bm25_sum = (
        f"sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)"
        f" * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.doclen / s.avgdl)))"
    )
    return f"""
    WITH qterms(query_id, term) AS (VALUES {qterms}),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS doclen FROM toks
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(doclen * 1.0) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        WHERE w IN {all_terms!r}
        GROUP BY doc_id, w
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               {sql_round(bm25_sum, 4)} AS bm25
        FROM tf
        JOIN qterms qt USING (term)
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
        GROUP BY qt.query_id, tf.doc_id
    ),
    lex AS (
        SELECT query_id, doc_id, rl FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY bm25 DESC, doc_id
                   ) AS rl
            FROM scored
        ) WHERE rl <= {_D225_TOPK_PER_SYSTEM}
    ),
    sem AS (
        SELECT query_id, doc_id, rs FROM (
            SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY {_sqlcos("p.embedding", "c.embedding")} DESC,
                                c.vec_id
                   ) AS rs
            FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
            WHERE p.vec_id < {n_probes}
        ) WHERE rs <= {_D225_TOPK_PER_SYSTEM}
    ),
    fused AS (
        SELECT coalesce(l.query_id, s.query_id) AS query_id,
               coalesce(l.doc_id, s.doc_id) AS doc_id,
               l.rl AS rl, s.rs AS rs,
               coalesce(1.0 / ({k} + l.rl), 0.0)
               + coalesce(1.0 / ({k} + s.rs), 0.0) AS rrf_raw
        FROM lex l FULL JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )"""


def _d225_oracle() -> str:
    return f"""
    {_d225_cte()}
    SELECT query_id, fused_rk, doc_id, rrf, rank_lex, rank_sem, n_overlap
    FROM (
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id
               ) AS INT) AS fused_rk,
               CAST(doc_id AS BIGINT) AS doc_id,
               {sql_round("rrf_raw", 6)} AS rrf,
               CAST(coalesce(rl, 0) AS INT) AS rank_lex,
               CAST(coalesce(rs, 0) AS INT) AS rank_sem,
               CAST(sum(CASE WHEN rl IS NOT NULL AND rs IS NOT NULL
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY query_id) AS INT) AS n_overlap
        FROM fused
    ) WHERE fused_rk <= {_D225_TOPK_FUSED}
    ORDER BY query_id, fused_rk
    """


@query("d225_hybrid_rank_fusion", tags=("D225", "D117", "D68"), oracle=_d225_oracle())
def d225_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (RRF, k=60 — Cormack,
    Clarke & Buettcher, SIGIR 2009; public knowledge) of the lexical
    BM25 ranking (D117's scorer, generalized to a 4-query term map)
    with the semantic cosine ranking (D68's brute-force baseline, one
    probe vector per query; vec_id aligns with doc_id in the corpus).
    Per query: the fused top-{_D225_TOPK_FUSED} with each doc's
    per-system rank (0 = not in that system's top-{_D225_TOPK_PER_SYSTEM})
    and the lexical∩semantic overlap count — the ranking shape a
    RAG/data-curation retrieval stack actually serves, and the audit
    view that shows how much each modality contributes.

    Exactly hash-checkable: integer ranks → RRF scores are sums of
    1/(60+r) — identical IEEE doubles on both engines; fused order ties
    break on doc_id. The BM25 side ranks on the 4dp-rounded score (the
    D117 tie discipline).

    Plan shape: the term filter lands before the tf shuffle (postings
    only for the 13 query terms move); df/stats broadcast; per-query
    rankings are windows PARTITIONED by query_id; the semantic side is
    the bounded-probe broadcast join (|queries| rows build side — the
    documented bounded BNLJ class; at larger probe sets this side
    swaps to D184's persisted IVF index without touching the fusion).
    The fusion itself is one (query, doc) full-outer equi-join over
    2 x top-{_D225_TOPK_PER_SYSTEM} rows per query — KB-scale however
    big the corpus is.

    No reference parity (reference has no retrieval surface);
    VERDICT r13 Next-round #5.
    """
    fused = _d225_fused_ranked(spark, sf_dir)
    w_q = W.partitionBy("query_id")
    return (
        fused.withColumn(
            "n_overlap",
            F.sum(
                (F.col("rl").isNotNull() & F.col("rs").isNotNull()).cast("int")
            ).over(w_q),
        )
        .filter(F.col("fused_rk") <= _D225_TOPK_FUSED)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("fused_rk").cast("int").alias("fused_rk"),
            F.col("doc_id").cast("long").alias("doc_id"),
            pround("rrf_raw", 6).alias("rrf"),
            F.coalesce(F.col("rl"), F.lit(0)).cast("int").alias("rank_lex"),
            F.coalesce(F.col("rs"), F.lit(0)).cast("int").alias("rank_sem"),
            F.col("n_overlap").cast("int").alias("n_overlap"),
        )
        .orderBy("query_id", "fused_rk")
    )


def _d225_fused_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full fused candidate frame (query_id, doc_id, rl, rs,
    rrf_raw, fused_rk), unfiltered — D225 releases its top slice,
    D226 scores it against the semantic truth set."""
    from .similarity import _emb, cosine

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    all_terms = sorted({t for ts in _D225_QUERIES.values() for t in ts})
    qmap = _d225_qmap(spark)

    # ONE tokenize pass feeds both the postings and the doc lengths
    # (r16, guide §2.4/§6): doclen rides the tf aggregation as a
    # grouping column (constant per doc_id), so the former separate
    # `dl` frame — a third documents scan + re-split AND an O(corpus)
    # doc_id equi-join into `scored` — is gone. Only the corpus-wide
    # n_docs/avgdl aggregate still needs its own (column-pruned) scan.
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    tokstats = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("doclen"),
        F.filter("t", lambda w: w.isin(*all_terms)).alias("qt"),
    )
    stats = tokstats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doclen") * 1.0).alias("avgdl"),
    )
    tf = (
        tokstats.select("doc_id", "doclen", F.explode("qt").alias("term"))
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("doclen") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(qmap), "term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            pround(
                F.sum(idf * (F.col("tf") * (_BM25_K1 + 1.0)) / norm), 4
            ).alias("bm25")
        )
    )
    w_lex = W.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    lex = (
        scored.withColumn("rl", F.row_number().over(w_lex))
        .filter(F.col("rl") <= _D225_TOPK_PER_SYSTEM)
        .select("query_id", "doc_id", "rl")
    )

    p = _emb(spark, sf_dir, "probe").filter(
        F.col("probe_id") < len(_D225_QUERIES)
    )
    c = _emb(spark, sf_dir, "neighbor")
    w_sem = W.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("doc_id").asc()
    )
    sem = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .select(
            F.col("probe_id").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            cosine(F.col("probe_v"), F.col("neighbor_v")).alias("cs"),
        )
        .withColumn("rs", F.row_number().over(w_sem))
        .filter(F.col("rs") <= _D225_TOPK_PER_SYSTEM)
        .select("query_id", "doc_id", "rs")
    )

    fused = (
        lex.join(sem, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_raw",
            F.coalesce(1.0 / (_D225_RRF_K + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (_D225_RRF_K + F.col("rs")), F.lit(0.0)),
        )
    )
    w_fuse = W.partitionBy("query_id").orderBy(
        F.col("rrf_raw").desc(), F.col("doc_id").asc()
    )
    return fused.withColumn("fused_rk", F.row_number().over(w_fuse))


# ---------------------------------------------------------------------------
# D226: retrieval quality metrics (recall@k / MRR / nDCG over D225)
# ---------------------------------------------------------------------------

_D226_TRUTH_K = 10  # semantic ground truth: exact-cosine top-10 per query
_D226_EVAL_K = 10   # evaluate the fused top-10
# IDCG for exactly TRUTH_K relevant docs, computed once driver-side and
# embedded as the SAME literal in both engines — a SQL sum over
# generate_series would fold doubles in engine-specific order.
_D226_IDCG = sum(1.0 / math.log2(i + 1) for i in range(1, _D226_TRUTH_K + 1))


def _d226_oracle() -> str:
    return f"""
    {_d225_cte()},
    ranked AS (
        SELECT query_id, doc_id, rs,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id
               ) AS fused_rk
        FROM fused
    ),
    hits AS (
        SELECT query_id, fused_rk FROM ranked
        WHERE fused_rk <= {_D226_EVAL_K}
          AND rs IS NOT NULL AND rs <= {_D226_TRUTH_K}
    ),
    agg AS (
        SELECT query_id,
               CAST(count(*) AS INT) AS n_hits,
               min(fused_rk) AS best_rk,
               sum(1.0 / log2(fused_rk + 1)) AS dcg
        FROM hits GROUP BY query_id
    )
    SELECT CAST(q.query_id AS BIGINT) AS query_id,
           CAST(coalesce(a.n_hits, 0) AS INT) AS n_hits,
           {sql_round(f"coalesce(a.n_hits, 0) * 1.0 / {_D226_TRUTH_K}", 6)}
               AS recall_at_10,
           {sql_round("coalesce(1.0 / a.best_rk, CAST(0.0 AS DOUBLE))", 6)}
               AS mrr,
           {sql_round(f"coalesce(a.dcg, 0.0) / {_D226_IDCG!r}", 4)}
               AS ndcg_at_10
    FROM (SELECT DISTINCT query_id FROM qterms) q
    LEFT JOIN agg a USING (query_id)
    ORDER BY query_id
    """


@query("d226_retrieval_quality", tags=("D226", "D225", "D68"), oracle=_d226_oracle())
def d226_retrieval_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation harness over the D225 fused ranking: per
    query, recall@{_D226_EVAL_K}, MRR, and nDCG@{_D226_EVAL_K}
    (Jarvelin & Kekalainen 2002; all public IR metrics) against the
    SEMANTIC ground truth — the exact-cosine top-{_D226_TRUTH_K}
    (D68's brute-force baseline is the oracle labeler, the standard
    trick when no human judgments exist). This is the eval loop every
    retrieval/RAG stack runs after re-ranking changes: it quantifies
    exactly how much the lexical fusion displaces the semantic truth
    (recall < 1 ⇔ BM25 pushed a true neighbor out of the top slice).

    Determinism: ranks are integers; recall and MRR are exact
    rationals rounded at 6dp; DCG sums ≤{_D226_EVAL_K} binary-relevance
    gains 1/log2(rank+1) — identical IEEE doubles per term, with the
    ≤1-ulp sum-order divergence absorbed by the 4dp rounding (the
    tf-idf precedent) — and IDCG (truth size is exactly
    {_D226_TRUTH_K} by construction) is ONE driver-computed literal
    embedded in both engines, so no cross-engine series fold exists.

    Plan shape: reuses the D225 frame (same scans, same bounded
    joins); the metrics fold is one groupBy(query_id) over the ≤
    {_D226_EVAL_K}-row hit sets plus a left join back to the
    O(queries) key frame — KB-scale at any corpus size."""
    fused = _d225_fused_ranked(spark, sf_dir)
    hits = fused.filter(
        (F.col("fused_rk") <= _D226_EVAL_K)
        & F.col("rs").isNotNull()
        & (F.col("rs") <= _D226_TRUTH_K)
    )
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits"),
        F.min("fused_rk").alias("best_rk"),
        F.sum(
            1.0 / F.log2(F.col("fused_rk").cast("double") + 1.0)
        ).alias("dcg"),
    )
    # The query-id key frame is the compile-time query map, not a
    # second pass over the fused pipeline (which would re-run every
    # d225 scan — the d223 recompute lesson); the oracle keys on the
    # same map (DISTINCT over its qterms VALUES list).
    base = _d225_query_ids(spark)
    return (
        base.join(agg, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            pround(
                F.coalesce(F.col("n_hits"), F.lit(0)) * 1.0 / _D226_TRUTH_K, 6
            ).alias("recall_at_10"),
            pround(
                F.coalesce(1.0 / F.col("best_rk"), F.lit(0.0)), 6
            ).alias("mrr"),
            pround(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / _D226_IDCG, 4
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# D227: two-stage passage retrieval (chunk pinpointing within fused top docs)
# ---------------------------------------------------------------------------

_D227_DOCS_K = 5     # stage-1 cut: fused top-5 docs per query
_D227_CHUNK = 32     # d73's chunk window (tokens)
_D227_STRIDE = 24    # d73's stride (8-token overlap)


def _d227_oracle() -> str:
    return f"""
    {_d225_cte()},
    ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id
               ) AS fused_rk
        FROM fused
    ),
    top AS (
        SELECT query_id, doc_id, fused_rk FROM ranked
        WHERE fused_rk <= {_D227_DOCS_K}
    ),
    qt AS (
        SELECT query_id, list(term ORDER BY term) AS terms
        FROM qterms GROUP BY query_id
    ),
    chunks AS (
        SELECT t.query_id, t.fused_rk, t.doc_id, qt.terms,
               CAST((s - 1) // {_D227_STRIDE} AS INT) AS chunk_idx,
               list_slice(d.toks, s,
                          least(s + {_D227_CHUNK - 1}, len(d.toks))) AS chunk
        FROM top t
        JOIN qt USING (query_id)
        JOIN (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents) d USING (doc_id)
        CROSS JOIN LATERAL unnest(
            generate_series(1, len(d.toks), {_D227_STRIDE})) AS g(s)
    ),
    scored_chunks AS (
        SELECT query_id, fused_rk, doc_id, chunk_idx,
               CAST(len(list_filter(chunk,
                    t -> list_contains(terms, t))) AS INT) AS chunk_score,
               CAST(len(list_intersect(list_distinct(chunk), terms)) AS INT)
                   AS n_terms_matched,
               row_number() OVER (
                   PARTITION BY query_id, doc_id
                   ORDER BY len(list_filter(chunk,
                       t -> list_contains(terms, t))) DESC, chunk_idx
               ) AS rn,
               CAST(count(*) OVER (PARTITION BY query_id, doc_id) AS INT)
                   AS n_chunks
        FROM chunks
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(fused_rk AS INT) AS fused_rk,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_idx AS INT) AS best_chunk_idx,
           chunk_score, n_terms_matched, n_chunks
    FROM scored_chunks WHERE rn = 1
    ORDER BY query_id, fused_rk
    """


@query("d227_passage_retrieval", tags=("D227", "D225", "D73"), oracle=_d227_oracle())
def d227_passage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: the D225 fused ranking picks the
    top-{_D227_DOCS_K} DOCUMENTS per query (coarse stage), then ONLY
    those documents are chunked (D73's 32-token/stride-24 windows) and
    each chunk scored by query-term occupancy — best chunk per
    (query, doc) with its score, distinct-terms-matched, and the doc's
    chunk count. This is the passage-pinpointing stage a RAG stack runs
    between retrieval and context assembly, and the output is exactly
    what gets pasted into a prompt window.

    The 100 TB property is the CANDIDATE PRUNING: chunk scoring touches
    only |queries| x {_D227_DOCS_K} retrieved documents — a bounded
    broadcast join against the corpus scan — never the corpus's chunks.
    Chunking the whole corpus to score it (the naive single-stage plan)
    is O(corpus tokens) work per query set; this is O(retrieved docs).

    Exactly hash-checkable: chunk scores are integer occurrence counts
    (no floats anywhere past the stage-1 RRF, whose determinism D225
    pins); ties break on chunk_idx ascending, so the earliest
    highest-occupancy window wins on both engines. A doc retrieved
    with zero term occupancy (a purely semantic hit) still reports its
    first chunk at score 0 — visible, not dropped.

    Plan shape: stage 1 reuses the D225 frame (bounded joins,
    partitioned windows); stage 2 is one broadcast equi-join
    (≤ |queries| x {_D227_DOCS_K} rows build side) into the documents
    scan, a posexplode over the ≤20 joined docs, and a window
    PARTITIONED by (query, doc). No Python."""
    fused = _d225_fused_ranked(spark, sf_dir)
    top = fused.filter(F.col("fused_rk") <= _D227_DOCS_K).select(
        "query_id", "fused_rk", "doc_id"
    )
    qt = (
        _d225_qmap(spark)
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list("term")).alias("terms"))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    pairs = docs.join(F.broadcast(top), "doc_id").join(
        F.broadcast(qt), "query_id"
    )
    ch = pairs.select(
        "query_id",
        "fused_rk",
        "doc_id",
        "terms",
        F.posexplode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(_D227_STRIDE))
        ).alias("chunk_idx", "s"),
        F.col("toks"),
    ).withColumn("chunk", F.slice("toks", F.col("s"), _D227_CHUNK))
    terms = F.col("terms")
    score = F.size(
        F.filter("chunk", lambda t: F.array_contains(terms, t))
    ).cast("int")
    scored = ch.select(
        "query_id",
        "fused_rk",
        "doc_id",
        "chunk_idx",
        score.alias("chunk_score"),
        F.size(F.array_intersect(F.array_distinct("chunk"), terms))
        .cast("int")
        .alias("n_terms_matched"),
    )
    w_best = W.partitionBy("query_id", "doc_id").orderBy(
        F.col("chunk_score").desc(), F.col("chunk_idx").asc()
    )
    w_pair = W.partitionBy("query_id", "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .withColumn("n_chunks", F.count(F.lit(1)).over(w_pair).cast("int"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("fused_rk").cast("int").alias("fused_rk"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("chunk_idx").cast("int").alias("best_chunk_idx"),
            "chunk_score",
            "n_terms_matched",
            "n_chunks",
        )
        .orderBy("query_id", "fused_rk")
    )

# ---------------------------------------------------------------------------
# D228: MMR diversified rerank (greedy maximal marginal relevance)
# ---------------------------------------------------------------------------

_D228_POOL = 12      # candidate pool: fused top-12 per query
_D228_SELECT = 5     # diversified slate size
_D228_LAM = 0.7      # MMR relevance weight (Carbonell/Goldstein 1998)
_D228_OM = 0.3       # 1 - lambda, pinned as its own literal: interpolating
#                      the PYTHON expression 1-0.7 (= 0.30000000000000004)
#                      on one side and the SQL literal 0.3 on the other
#                      would split engines in the last bit.


def _d228_oracle() -> str:
    from ..functions.vectors import sql_cosine as _sqlcos

    lam, om = repr(_D228_LAM), repr(_D228_OM)
    sql = f"""
    {_d225_cte()},
    ranked AS (
        SELECT query_id, doc_id, rrf_raw,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id
               ) AS fused_rk
        FROM fused
    ),
    pool AS (
        SELECT r.query_id, r.doc_id, r.fused_rk, r.rrf_raw AS rel,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM ranked r JOIN embeddings e ON e.vec_id = r.doc_id
        WHERE r.fused_rk <= {_D228_POOL}
    ),
    sims AS (
        SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
               {_sqlcos("a.v", "b.v")} AS s
        FROM pool a JOIN pool b
          ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
    ),
    sel1 AS (
        SELECT query_id, doc_id, fused_rk, rel,
               CAST(0.0 AS DOUBLE) AS maxsim,
               CAST({lam} AS DOUBLE) * rel AS mmr,
               1 AS sel_rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel DESC, doc_id
            ) AS rk FROM pool
        ) WHERE rk = 1
    )"""
    prev_sels = ["sel1"]
    for i in range(2, _D228_SELECT + 1):
        prev = " UNION ALL ".join(
            f"SELECT query_id, doc_id FROM {s}" for s in prev_sels
        )
        sql += f""",
    prev{i} AS ({prev}),
    mx{i} AS (
        SELECT s.query_id, s.da AS doc_id, max(s.s) AS maxsim
        FROM sims s JOIN prev{i} p
          ON p.query_id = s.query_id AND p.doc_id = s.db
        GROUP BY s.query_id, s.da
    ),
    sel{i} AS (
        SELECT query_id, doc_id, fused_rk, rel, maxsim, mmr,
               {i} AS sel_rank
        FROM (
            SELECT c.query_id, c.doc_id, c.fused_rk, c.rel, mx.maxsim,
                   CAST({lam} AS DOUBLE) * c.rel
                   - CAST({om} AS DOUBLE) * mx.maxsim AS mmr,
                   row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY CAST({lam} AS DOUBLE) * c.rel
                                - CAST({om} AS DOUBLE) * mx.maxsim DESC,
                                c.doc_id
                   ) AS rk
            FROM pool c
            JOIN mx{i} mx
              ON mx.query_id = c.query_id AND mx.doc_id = c.doc_id
            WHERE NOT EXISTS (
                SELECT 1 FROM prev{i} p
                WHERE p.query_id = c.query_id AND p.doc_id = c.doc_id
            )
        ) WHERE rk = 1
    )"""
        prev_sels.append(f"sel{i}")
    union = " UNION ALL ".join(f"SELECT * FROM {s}" for s in prev_sels)
    sql += f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(sel_rank AS INT) AS sel_rank,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(fused_rk AS INT) AS fused_rk,
           {sql_round("rel", 6)} AS rrf,
           {sql_round("maxsim", 6)} AS max_sim_prior,
           {sql_round("mmr", 6)} AS mmr
    FROM ({union})
    ORDER BY query_id, sel_rank
    """
    return sql


def _d228_greedy(pdf):
    """Greedy MMR over ONE query's candidate pool (<=_D228_POOL rows by
    construction — the applyInPandas group is bounded at any corpus
    size). Bit-exact twin of the oracle's unrolled SQL: the cosine is
    the shared sequential left-fold dot product (0.0-init, in-order
    adds — each IEEE op replayed in the same order as the JVM
    expression in functions/vectors.py), maxsim is a max over the
    identical doubles, mmr = lam*rel - om*maxsim with the same Python
    float literals both engines interpolate, and argmax ties break on
    doc_id ascending."""
    import pandas as pd

    lam, om = _D228_LAM, _D228_OM
    qid = int(pdf["query_id"].iloc[0])
    cands = [
        (int(d), int(fk), float(r), [float(x) for x in v])
        for d, fk, r, v in zip(
            pdf["doc_id"], pdf["fused_rk"], pdf["rel"], pdf["v"]
        )
    ]

    def _dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s = s + x * y
        return s

    nrm = {d: math.sqrt(_dot(v, v)) for d, _fk, _r, v in cands}
    vec = {d: v for d, _fk, _r, v in cands}
    # the vec/nrm dicts silently collapse duplicate doc_ids; fused_rk
    # makes (query_id, doc_id) unique upstream — pin that invariant
    # where the dicts rely on it (ADVICE r15; <=12 rows, free)
    assert len(vec) == len(cands), "duplicate doc_id in MMR pool group"

    def _cos(da, db):
        return _dot(vec[da], vec[db]) / (nrm[da] * nrm[db])

    first = min(cands, key=lambda c: (-c[2], c[0]))
    out = [(qid, 1, first[0], first[1], first[2], 0.0, lam * first[2])]
    selected = [first[0]]
    remaining = [c for c in cands if c[0] != first[0]]
    for i in range(2, _D228_SELECT + 1):
        if not remaining:
            break
        scored = [
            (d, fk, r, max(_cos(d, s) for s in selected))
            for d, fk, r, _v in remaining
        ]
        best = min(
            scored, key=lambda c: (-(lam * c[2] - om * c[3]), c[0])
        )
        d, fk, r, ms = best
        out.append((qid, i, d, fk, r, ms, lam * r - om * ms))
        selected.append(d)
        remaining = [c for c in remaining if c[0] != d]
    cols = list(zip(*out))
    return pd.DataFrame(
        {
            "query_id": pd.Series(cols[0], dtype="int64"),
            "sel_rank": pd.Series(cols[1], dtype="int32"),
            "doc_id": pd.Series(cols[2], dtype="int64"),
            "fused_rk": pd.Series(cols[3], dtype="int32"),
            "rel": pd.Series(cols[4], dtype="float64"),
            "maxsim": pd.Series(cols[5], dtype="float64"),
            "mmr": pd.Series(cols[6], dtype="float64"),
        }
    )


@query("d228_mmr_rerank", tags=("D228", "D225", "D68"), oracle=_d228_oracle())
def d228_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware rerank of the D225 fused candidates: greedy
    maximal marginal relevance (Carbonell & Goldstein, SIGIR 1998 —
    public knowledge), lambda=0.7, selecting {_D228_SELECT} of the
    fused top-{_D228_POOL} per query. Each step picks
    argmax lambda*rel - (1-lambda)*max_sim_to_already_selected, where
    rel is the RRF score and similarity is embedding cosine — the
    slate-construction step a RAG stack runs so five near-identical
    syndicated copies don't fill the whole context window.

    Shape (r15 optimization, guide §1.2/§4.2): the corpus-scale work is
    stage 1 (D225's scans + the embedding join), checkpointed ONCE as
    the |queries| x {_D228_POOL}-row pool; the greedy selection itself
    is a per-query-bounded problem (<= {_D228_POOL} candidates, always,
    by construction), so it runs as ONE grouped applyInPandas over the
    cut — one KB-scale shuffle by query_id, groups fan out across
    cores. This replaces the r14 unrolled-DataFrame form (4 sequential
    driver collects + a 5-subtree union plan, 52 Exchanges / 32
    broadcast joins of fixed per-job latency each); the sims/argmax
    arithmetic is identical, just evaluated inside the worker.

    Exactly hash-checkable: rel is the IEEE-exact RRF double (D225's
    pin) carried through Arrow losslessly, cosines replay the shared
    sequential-fold dot product op-for-op in IEEE doubles (see
    _d228_greedy), and lambda/(1-lambda) are the SAME Python floats
    both engines interpolate (0.3, not Python's 1-0.7), so MMR scores
    are bit-identical and argmax ties break on doc_id both sides."""
    from ..functions.vectors import to_double
    from ..session import reliable_checkpoint

    fused = _d225_fused_ranked(spark, sf_dir)
    pool = fused.filter(F.col("fused_rk") <= _D228_POOL).select(
        "query_id", "doc_id", "fused_rk", F.col("rrf_raw").alias("rel")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), to_double(F.col("embedding")).alias("v")
    )
    pool_v = reliable_checkpoint(
        emb.join(F.broadcast(pool), "doc_id").select(
            "query_id", "doc_id", "fused_rk", "rel", "v"
        )
    )
    out = pool_v.groupBy("query_id").applyInPandas(
        _d228_greedy,
        schema=(
            "query_id long, sel_rank int, doc_id long, fused_rk int, "
            "rel double, maxsim double, mmr double"
        ),
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("sel_rank").cast("int").alias("sel_rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("fused_rk").cast("int").alias("fused_rk"),
        pround("rel", 6).alias("rrf"),
        pround("maxsim", 6).alias("max_sim_prior"),
        pround("mmr", 6).alias("mmr"),
    ).orderBy("query_id", "sel_rank")
