"""Text analysis for training-data pipelines (SURVEY §2.2 D69-D71 +
language-ID, quality scoring, token counting, fingerprinting).

Everything is pure column expressions (codegen, zero Python) — at
100 TB these run as a single projection/aggregation pass over the
corpus. The heuristics are deliberately simple and deterministic so
the DuckDB oracle replicates them exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.portable import portable_hash_long, pround, sql_hash_long, sql_round
from ..functions.shingles import with_shingles
from ..operators.prefix import ordered_prefix
from ..registry import query
from ..session import reliable_checkpoint

# tiny function-word dictionaries for the langid heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")


@query(
    "d69_normalize_tokenize",
    tags=("D69",),
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g') AS ntext
        FROM documents
    )
    SELECT doc_id,
           len(list_filter(string_split(ntext, ' '), t -> length(t) > 0)) AS n_tokens,
           coalesce(array_to_string(list_filter(string_split(ntext, ' '), t -> length(t) > 0)[1:5], ' '), '') AS head5
    FROM norm
    ORDER BY doc_id
    """,
)
def d69_normalize_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower + punctuation strip + whitespace tokenize (empty tokens
    dropped so repeated separators don't count)."""
    d = load_table(spark, sf_dir, "documents")
    ntext = F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")
    toks = F.filter(F.split(ntext, " "), lambda t: F.length(t) > 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
    ).orderBy("doc_id")


@query(
    "d70_tf_idf",
    tags=("D70",),
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term,
           {sql_round("tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)", 4)} AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE doc_id < 30
    ORDER BY doc_id, term
    """,
)
def d70_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed idf): explode → tf per (doc,term), df per term,
    term-keyed rejoin. Projected for doc_id < 30 but computed over the
    whole corpus (df is global). The df join is deliberately UNHINTED
    (the d158 doctrine): df is one row per vocabulary type, which grows
    with the corpus (Heaps' law) — AQE broadcasts it while small and
    sort-merges the term-keyed join at scale; a forced broadcast would
    OOM the build side on a 100 TB vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    return (
        tf.join(df, "term")
        .filter(F.col("doc_id") < 30)
        .select(
            "doc_id",
            "term",
            pround(
                F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


@query(
    "d71_language_stats",
    tags=("D71",),
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           {sql_round("avg(n_chars)", 2)} AS avg_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang IN ('en', 'es', 'zh')
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def d71_language_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").isin("en", "es", "zh"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pround(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


def _isin_matcher(markers: tuple[str, ...]):
    # must stay a single-parameter lambda: PySpark feeds the array index
    # to a second parameter, defaulted or not
    return lambda t: t.isin(*markers)


def _sql_marker_score(lang: str) -> str:
    toks = "string_split(lower(text), ' ')"
    terms = " + ".join(
        f"len(list_filter({toks}, t -> t = '{m}'))" for m in _LANG_MARKERS[lang]
    )
    return f"({terms})"


@query(
    "d71_langid_heuristic",
    tags=("D71",),
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
             WHEN {_sql_marker_score("en")} >= {_sql_marker_score("es")}
              AND {_sql_marker_score("en")} >= {_sql_marker_score("fr")}
              AND {_sql_marker_score("en")} >= {_sql_marker_score("de")}
              AND {_sql_marker_score("en")} > 0 THEN 'en'
             WHEN {_sql_marker_score("es")} >= {_sql_marker_score("fr")}
              AND {_sql_marker_score("es")} >= {_sql_marker_score("de")}
              AND {_sql_marker_score("es")} > 0 THEN 'es'
             WHEN {_sql_marker_score("fr")} >= {_sql_marker_score("de")}
              AND {_sql_marker_score("fr")} > 0 THEN 'fr'
             WHEN {_sql_marker_score("de")} > 0 THEN 'de'
             ELSE 'und'
           END AS predicted_lang
    FROM documents
    ORDER BY doc_id
    """,
)
def d71_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based language ID: CJK charset check, then function-word
    counts with a fixed tie-break order (en > es > fr > de).

    One tokenization + one array pass per language: the sum of
    per-marker counts equals one ``isin(markers)`` filter (a token
    matches at most one marker of a language), and scores are projected
    as real columns before the CASE chain — lambda subtrees get no CSE,
    so inlining each score 2-4× into the whens multiplies the work."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        F.split(F.lower("text"), " ").alias("toks"),
    ).select(
        "doc_id",
        "lang",
        "text",
        *[
            F.size(F.filter("toks", _isin_matcher(ms))).alias(f"s_{lang}")
            for lang, ms in _LANG_MARKERS.items()
        ],
    )
    en, es, fr, de = (F.col(f"s_{x}") for x in ("en", "es", "fr", "de"))
    pred = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when((en >= es) & (en >= fr) & (en >= de) & (en > 0), "en")
        .when((es >= fr) & (es >= de) & (es > 0), "es")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    ).orderBy("doc_id")


@query(
    "d69_quality_score",
    tags=("D69", "D71"),
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars_actual,
               length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS n_nonalpha,
               len(list_filter(string_split(lower(text), ' '),
                               t -> t IN ({", ".join(f"'{s}'" for s in _STOPWORDS)}))) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tokens,
           {sql_round("CAST(n_stop AS DOUBLE) / n_tokens", 4)} AS stopword_ratio,
           {sql_round("CAST(n_nonalpha AS DOUBLE) / n_chars_actual", 4)} AS nonalpha_ratio,
           {sql_round(
               "0.5 * least(CAST(n_tokens AS DOUBLE) / 100, 1.0)"
               " + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0)"
               " + 0.2 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n_chars_actual)", 4)} AS quality
    FROM feat
    ORDER BY doc_id
    """,
)
def d69_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length + stopword ratio + non-alpha
    ratio (the standard pre-training quality-filter features)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ltoks = F.split(F.lower("text"), " ")
    n_tokens = F.size(toks)
    n_chars_actual = F.length("text")
    n_nonalpha = n_chars_actual - F.length(F.regexp_replace("text", "[^a-z ]", ""))
    n_stop = F.size(F.filter(ltoks, lambda t: t.isin(*_STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    nonalpha_ratio = n_nonalpha.cast("double") / n_chars_actual
    quality = (
        0.5 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * (1.0 - nonalpha_ratio)
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        pround(stop_ratio, 4).alias("stopword_ratio"),
        pround(nonalpha_ratio, 4).alias("nonalpha_ratio"),
        pround(quality, 4).alias("quality"),
    ).orderBy("doc_id")


@query(
    "d69_token_count",
    tags=("D69",),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS char_estimate
    FROM documents
    ORDER BY doc_id
    """,
)
def d69_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex pieces,
    and the chars/4 rule-of-thumb estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("long").alias("char_estimate"),
    ).orderBy("doc_id")


@query(
    "d69_fingerprint",
    tags=("D69", "D65"),
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(toks) - 4),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 5
    )
    SELECT doc_id,
           list_min(list_transform(shingles, s -> CAST('0x' || substring(md5('fp|' || s), 1, 8) AS BIGINT))) AS fingerprint,
           md5(array_to_string(list_sort(shingles), '|')) AS content_hash
    FROM sh
    ORDER BY doc_id
    """,
)
def d69_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash over 5-token shingles (a
    winnowing-style selective hash) + an order-insensitive content hash.

    One Arrow-batched pandas UDF does shingling *and* hashing from the
    raw text column. Measured alternatives at sf0.1: JVM shingling +
    hash-only UDF pays ~6× in Arrow transfer of the array<string>
    column; a fully-JVM explode + md5 + re-aggregate pays ~10× in the
    row explosion and extra shuffle. Shipping one string per doc and
    keeping the 50-shingle loop in Python is the cheapest shape, and
    hashlib produces the identical digests the oracle computes."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    d = fan_out(load_table(spark, sf_dir, "documents"))

    @pandas_udf("struct<fingerprint: long, content_hash: string>")
    def fp_of(text: pd.Series) -> pd.DataFrame:
        fps, chs = [], []
        for t in text:
            toks = t.split(" ")
            # dict preserves first-occurrence order like F.array_distinct
            grams = {" ".join(toks[i : i + 5]): None for i in range(len(toks) - 4)}
            fps.append(
                min(
                    int.from_bytes(hashlib.md5(b"fp|" + s.encode()).digest()[:4], "big")
                    for s in grams
                )
            )
            chs.append(hashlib.md5("|".join(sorted(grams)).encode()).hexdigest())
        return pd.DataFrame({"fingerprint": fps, "content_hash": chs})

    return (
        d.filter(F.size(F.split("text", " ")) >= 5)
        .select("doc_id", fp_of("text").alias("fp"))
        .select("doc_id", "fp.fingerprint", "fp.content_hash")
        .orderBy("doc_id")
    )


@query(
    "d73_doc_chunking",
    tags=("D73",),
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS s FROM t)
    SELECT doc_id,
           CAST((s - 1) // 24 AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, s, least(s + 31, len(toks))), ' ') AS chunk_text,
           CAST(least(s + 31, len(toks)) - s + 1 AS INT) AS n_tokens
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def d73_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus chunking: split each document into 32-token
    windows with stride 24 (8-token overlap), the standard shape for
    packing long documents into fixed-context training samples.

    Pure JVM: tokenize once, `sequence` generates the chunk starts,
    `posexplode` fans out to one row per chunk, `slice`+`array_join`
    materialize the window. At 100 TB this is a single narrow
    projection pass — no shuffle, no Python; output rows ≈ input
    tokens / stride, and the explode preserves the input partitioning
    for any downstream tokenizer/packing stage."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    ch = d.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(1), F.size("toks"), F.lit(24))).alias(
            "chunk_idx", "s"
        ),
    )
    chunk = F.slice("toks", F.col("s"), 32)
    return ch.select(
        "doc_id",
        "chunk_idx",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# D123: bigram language-model quality score (CCNet-style LM filter proxy)
# ---------------------------------------------------------------------------

_LM_TOPBOT = 10


@query(
    "d123_bigram_lm_score",
    tags=("D123", "D70", "D76"),
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT unnest(t) AS w FROM toks
    ),
    ucnt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY w
    ),
    vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ucnt),
    bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    bcnt AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
        FROM bi GROUP BY w1, w2
    ),
    scored AS (
        SELECT bi.doc_id,
               ln((bcnt.cb + 1.0) / (ucnt.cu + vocab.v)) AS lp
        FROM bi
        JOIN bcnt USING (w1, w2)
        JOIN ucnt ON ucnt.w = bi.w1
        CROSS JOIN vocab
    ),
    per_doc AS (
        SELECT doc_id, {sql_round("sum(lp) / count(*)", 6)} AS avg_logprob,
               CAST(count(*) AS BIGINT) AS n_bigrams
        FROM scored GROUP BY doc_id
    ),
    ranked AS (
        SELECT doc_id, avg_logprob, n_bigrams,
               row_number() OVER (ORDER BY avg_logprob DESC, doc_id) AS rk_best,
               row_number() OVER (ORDER BY avg_logprob ASC, doc_id) AS rk_worst
        FROM per_doc
    )
    SELECT doc_id, avg_logprob, n_bigrams,
           CASE WHEN rk_best <= {_LM_TOPBOT} THEN 'fluent' ELSE 'disfluent' END AS band
    FROM ranked
    WHERE rk_best <= {_LM_TOPBOT} OR rk_worst <= {_LM_TOPBOT}
    ORDER BY avg_logprob DESC, doc_id
    """,
)
def d123_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM quality score — the in-pipeline proxy
    for the CCNet/KenLM perplexity filter: train add-1-smoothed bigram
    statistics on the corpus itself (one counting pass), then score
    every document by its average bigram log-probability
    ln((c(w1 w2)+1)/(c(w1)+|V|)) and report the 10 most and least
    fluent documents. No external model: the LM *is* a pair of count
    tables, which is exactly how production perplexity filters
    bootstrap when no curated LM exists for a language.

    Plan shape: bigram and unigram counts are one partial-agg shuffle
    each; scoring joins the doc bigram stream to the count tables on
    the gram key (shuffle joins — at 100 TB the bigram table outgrows
    any broadcast budget, so the gram-keyed shuffle IS the scale
    plan), |V| rides along as a 1-row broadcast; per-doc averaging is
    one doc_id shuffle and the final top/bottom-10 is TakeOrdered.
    Summation order: avg of ~doc-length ln terms rounded at 6 — fp
    association noise is ~1e-13 relative, far below the rounding."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab = ucnt.agg(F.count(F.lit(1)).alias("v"))
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
    )
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        bi.join(bcnt, ["w1", "w2"])
        .join(ucnt.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("v"))).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        pround(F.sum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    best = (
        per_doc.orderBy(F.col("avg_logprob").desc(), F.col("doc_id").asc())
        .limit(_LM_TOPBOT)
        .withColumn("band", F.lit("fluent"))
    )
    worst = (
        per_doc.orderBy(F.col("avg_logprob").asc(), F.col("doc_id").asc())
        .limit(_LM_TOPBOT)
        .withColumn("band", F.lit("disfluent"))
    )
    return best.unionByName(worst).orderBy(F.col("avg_logprob").desc(), "doc_id")


# ---------------------------------------------------------------------------
# D164: vocabulary coverage curve (tokenizer sizing)
# ---------------------------------------------------------------------------

_VOCAB_KS = (5, 10, 20)


@query(
    "d164_vocab_coverage_curve",
    tags=("D164", "D95", "D35"),
    oracle=f"""
    WITH tf AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ),
    r AS (
        SELECT row_number() OVER (ORDER BY c DESC, tok) AS rk,
               sum(c) OVER (ORDER BY c DESC, tok
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER () AS tot,
               count(*) OVER () AS n_types
        FROM tf
    )
    SELECT CAST(rk AS BIGINT) AS k,
           CAST(any_value(n_types) AS BIGINT) AS n_types,
           CAST(any_value(tot) AS BIGINT) AS total_tokens,
           {sql_round("any_value(cum) * 1.0 / any_value(tot)", 6)} AS coverage
    FROM r WHERE rk IN {_VOCAB_KS}
    GROUP BY rk ORDER BY k
    """,
)
def d164_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-sizing readout: for
    each candidate vocab size k, what fraction of all token
    OCCURRENCES the top-k types cover (the OOV-rate complement). This
    is D95's top-k list turned into the decision curve a BPE/vocab
    build actually reads; the synthetic 31-type vocabulary makes the
    checked ks small, but the shape is the production one.

    Plan shape: one explode + partial-agg type-frequency groupBy, then
    the distributed prefix pass (``operators.prefix``, the
    D35/D139/D142/D156 operator) assigns the GLOBAL frequency-descending
    rank and running occurrence sum with totals on the same pass —
    at a real vocabulary scale (millions of types) no single task ever
    holds the type table, which is exactly where a naive
    rank-over-everything window dies. The curve projection filters to
    the probe ks map-side."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("oc", -F.col("c"))
    )
    r = ordered_prefix(
        tf,
        ["oc", "tok"],
        running={"cum": "c"},
        row_number="rk",
        totals={"tot": "c"},
        count_total="n_types",
    )
    return (
        r.filter(F.col("rk").isin(*_VOCAB_KS))
        .select(
            F.col("rk").cast("long").alias("k"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("tot").cast("long").alias("total_tokens"),
            pround(F.col("cum") / F.col("tot"), 6).alias("coverage"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# D165: character-entropy quality scoring
# ---------------------------------------------------------------------------

# Below this many bits-of-e (nats) a document is flagged low-entropy —
# the gibberish/repetition screen complementing the Gopher rules (D76):
# natural text sits near the alphabet's entropy; keyboard mashing,
# single-char floods and base64 walls sit far below or above it.
_ENTROPY_FLOOR = 2.9


@query(
    "d165_char_entropy",
    tags=("D165", "D69", "D76"),
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               list_aggregate(
                   list_transform(
                       list_sort(list_distinct(string_split(text, ''))),
                       c -> -(CAST(len(text) - len(replace(text, c, '')) AS DOUBLE)
                              / len(text))
                            * ln(CAST(len(text) - len(replace(text, c, '')) AS DOUBLE)
                                 / len(text))
                   ), 'sum') AS h
        FROM documents WHERE text IS NOT NULL AND len(text) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sql_round("avg(h)", 4)} AS avg_entropy,
           {sql_round("min(h)", 4)} AS min_entropy,
           {sql_round("max(h)", 4)} AS max_entropy,
           CAST(sum(CASE WHEN h < {_ENTROPY_FLOOR} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_entropy
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def d165_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (nats), rolled up
    per language — the cheap statistical quality screen run before any
    model-based filter: repetition floods and single-token spam score
    far below the alphabet entropy, encoded blobs score near log(64).
    Flags docs under {floor} nats.

    Plan shape: the per-doc entropy is ONE scan-stage expression — the
    char-count per distinct char uses the length-after-replace trick
    (O(alphabet × len) string ops, zero explode, zero UDF) and the fold
    runs over the SORTED distinct-char array so the float sum order is
    engine-identical (DuckDB's list_distinct is unordered). At 100 TB:
    map-only until the per-lang rollup's one keyed shuffle — the same
    cost class as D69's quality score. The projection is O(alphabet x
    len) string work per row — genuinely compute-bound — so the scan is
    fanned out first (r15, the fan_out contract: a single-file local
    scan otherwise serializes ~1e8 char ops on one core; at 100 TB the
    scan has natural splits and the exchange is noise next to the
    projection)."""
    d = fan_out(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.length("text") > 0)
        )
    )
    n = F.length("text").cast("double")
    cnt = lambda c: (F.length("text") - F.length(F.replace(F.col("text"), c))).cast("double")  # noqa: E731
    h = F.aggregate(
        F.array_sort(F.array_distinct(F.split("text", ""))),
        F.lit(0.0),
        lambda acc, c: acc - (cnt(c) / n) * F.log(cnt(c) / n),
    )
    per_doc = d.select("lang", h.alias("h"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pround(F.avg("h"), 4).alias("avg_entropy"),
            pround(F.min("h"), 4).alias("min_entropy"),
            pround(F.max("h"), 4).alias("max_entropy"),
            F.sum((F.col("h") < _ENTROPY_FLOOR).cast("long")).alias("n_low_entropy"),
        )
        .orderBy("lang")
    )


d165_char_entropy.__doc__ = d165_char_entropy.__doc__.format(floor=_ENTROPY_FLOOR)


# ---------------------------------------------------------------------------
# D177: Zipf fit of the vocabulary (rank-frequency power law)
# ---------------------------------------------------------------------------


@query(
    "d177_zipf_fit",
    tags=("D177", "D164", "D114"),
    oracle=f"""
    WITH tf AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           {sql_round("regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rk AS DOUBLE)))", 4)}
               AS zipf_slope,
           {sql_round("regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(rk AS DOUBLE)))", 4)}
               AS zipf_intercept,
           {sql_round("regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rk AS DOUBLE)))", 4)}
               AS r2
    FROM ranked
    """,
)
def d177_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit of the corpus vocabulary: OLS slope /
    intercept / R² of ln(frequency) on ln(rank) — the power-law
    diagnostic run next to D164's coverage curve when sizing a
    tokenizer or sanity-checking a synthetic corpus (natural language
    sits near slope −1; a flat slope betrays templated or mixed text).

    Plan shape: the type-frequency table partial-aggregates off one
    explode; the GLOBAL frequency rank rides the distributed prefix
    operator (D35/D164 — no single-task rank window at million-type
    vocabularies); the fit itself is a single-pass co-moment aggregate
    (regr_* family, D114) over the O(types) ranked rows. Engine
    parity: ln over identical integer counts/ranks is IEEE-identical;
    the co-moment sums round at 4 decimals (the D114 discipline)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("oc", -F.col("c"))
    )
    ranked = ordered_prefix(tf, ["oc", "tok"], row_number="rk")
    lnc = F.log(F.col("c").cast("double"))
    lnr = F.log(F.col("rk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("total_tokens"),
        pround(F.regr_slope(lnc, lnr), 4).alias("zipf_slope"),
        pround(F.regr_intercept(lnc, lnr), 4).alias("zipf_intercept"),
        pround(F.regr_r2(lnc, lnr), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# D188: distributed BPE merge induction (tokenizer training)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_best_pair(cur: DataFrame) -> tuple[str, str, int]:
    """One merge-round rule: weighted adjacent-pair counts over the
    vocab (pair-explode + keyed sum), deterministic global argmax
    (count desc, pair asc). The 1-row collect is the d184-centroid
    bounded class — the rule itself is the only thing that ever
    reaches the driver."""
    syms = F.split("seq", " ")
    # guard: Spark sequence(1, 0) DESCENDS instead of being empty
    bigrams = F.when(
        F.size(syms) >= 2,
        F.expr(
            "transform(sequence(1, size(split(seq, ' ')) - 1), "
            "i -> concat(element_at(split(seq, ' '), i), ' ', "
            "element_at(split(seq, ' '), i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    best = (
        cur.select("freq", F.explode(bigrams).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(1)
        .collect()[0]  # bounded: the ONE merge rule of this round
    )
    lsym, rsym = best["pair"].split(" ")
    return lsym, rsym, int(best["n"])


def _bpe_apply(seq_col: F.Column, lsym: str, rsym: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge via the double-space
    trick (see d188 docstring; pinned by
    test_bpe_merge_application_is_greedy)."""
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.concat(
                    F.lit(" "), F.regexp_replace(seq_col, " ", "  "), F.lit(" ")
                ),
                F.lit(f" {lsym}  {rsym} "),
                F.lit(f" {lsym}{rsym} "),
            ),
            " +",
            " ",
        )
    )


def _bpe_oracle() -> str:
    """Same merge loop unrolled in SQL CTEs: per round, pair counts over
    the weighted vocab, deterministic argmax (count desc, pair asc),
    double-space literal merge application, post-merge symbol ledger."""
    ctes = [
        """w AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    v0 AS (
        SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq,
               count(*) AS freq
        FROM w WHERE length(w) > 0 GROUP BY 1
    )"""
    ]
    finals = []
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""p{r} AS (
        SELECT unnest(list_transform(generate_series(1, len(s) - 1),
                      i -> s[i] || ' ' || s[i+1])) AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS s, freq FROM v{p})
    ),
    c{r} AS (SELECT pair, sum(freq) AS n FROM p{r} GROUP BY 1),
    b{r} AS (
        SELECT string_split(pair, ' ')[1] AS l,
               string_split(pair, ' ')[2] AS r, n
        FROM (SELECT pair, n FROM c{r} ORDER BY n DESC, pair ASC LIMIT 1)
    ),
    v{r} AS (
        SELECT trim(regexp_replace(
                 replace(' ' || replace(seq, ' ', '  ') || ' ',
                         ' ' || b.l || '  ' || b.r || ' ',
                         ' ' || b.l || b.r || ' '),
                 ' +', ' ', 'g')) AS seq, freq
        FROM v{p}, b{r} b
    )""")
        finals.append(f"""
        SELECT {r} AS round_id, b.l AS merge_l, b.r AS merge_r,
               CAST(b.n AS BIGINT) AS pair_n,
               (SELECT CAST(count(*) AS BIGINT) FROM v{r}) AS n_words,
               (SELECT CAST(sum(freq * len(string_split(seq, ' '))) AS BIGINT)
                FROM v{r}) AS corpus_symbols
        FROM b{r} b""")
    body = " UNION ALL ".join(f"({q})" for q in finals)
    return f"WITH {', '.join(ctes)} SELECT * FROM ({body}) ORDER BY round_id"


@query("d188_bpe_merges", tags=("D188", "D95", "D69"), oracle=_bpe_oracle())
def d188_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge induction — the tokenizer-training
    primitive every LLM data pipeline runs before anything else. Three
    merge rounds over ``documents``: each round counts adjacent symbol
    pairs (weighted by word frequency), picks the global argmax pair
    (deterministic tie-break: count desc, pair asc), applies the merge
    corpus-wide, and ledgers the post-merge symbol totals.

    Scale shape: the corpus is touched ONCE — one word-explode +
    groupBy folds 100 TB of text into the weighted type vocabulary
    (Zipf-bounded, orders of magnitude smaller), which is checkpointed
    and carries all subsequent rounds. Per round the distributed work
    is one pair-explode + one keyed count over the vocab; the merge
    RULE is a 1-row argmax — the one legitimately driver-bounded value
    (like d184's K centroids) — and merge application is a pure
    codegen'd projection (no shuffle). A per-round full-corpus rescan
    (the naive formulation) would cost rounds x corpus; this costs
    corpus + rounds x vocab.

    Merge application uses the double-space trick so ONE literal
    replace implements BPE's greedy left-to-right non-overlapping
    semantics identically in Spark and DuckDB: double every gap, then
    ``' l  r ' -> ' lr '`` — each replacement consumes one space per
    side, so adjacent merge sites keep their boundaries (a plain
    single-space replace silently skips every second site; pinned by
    test_bpe_merge_application_is_greedy)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.lower("text"), " ")).alias("w")).filter(
        F.length("w") > 0
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "freq")
    )
    # ONE corpus pass; every merge round reads this vocab-sized frame.
    cur = reliable_checkpoint(vocab)

    rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        lsym, rsym, pair_n = _bpe_best_pair(cur)
        # no per-round cut (r15): after the ONE vocab checkpoint the
        # lineage is r chained codegen'd regexp projections over a
        # vocab-sized frame — recomputing <= _BPE_ROUNDS layers per
        # action is cheaper than a reliable checkpoint's two passes
        # per round, and the plan stays linear (the d195 compile
        # hazard was expression NESTING, not a short projection chain)
        cur = cur.select(_bpe_apply(F.col("seq"), lsym, rsym).alias("seq"), "freq")
        rows.append(
            cur.agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum(F.col("freq") * F.size(F.split("seq", " "))).alias(
                    "corpus_symbols"
                ),
            ).select(
                F.lit(r).alias("round_id"),
                F.lit(lsym).alias("merge_l"),
                F.lit(rsym).alias("merge_r"),
                F.lit(pair_n).cast("long").alias("pair_n"),
                F.col("n_words").cast("long").alias("n_words"),
                F.col("corpus_symbols").cast("long").alias("corpus_symbols"),
            )
        )
    out = rows[0]
    for frame in rows[1:]:
        out = out.unionByName(frame)
    return out.orderBy("round_id")


# ---------------------------------------------------------------------------
# D193: BPE tokenizer application (the apply half of D188's learn)
# ---------------------------------------------------------------------------


def _d193_oracle() -> str:
    """Recompute the 3 learned merges (d188's CTE chain, with the word
    carried through so application is a vocab JOIN), then tokenize the
    corpus by joining word occurrences to the final vocab."""
    ctes = [
        """w0 AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    v0 AS (
        SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq,
               count(*) AS freq,
               len(string_split(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' '))
                   AS n_chars_sym
        FROM w0 WHERE length(w) > 0 GROUP BY 1, 2
    )"""
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""p{r} AS (
        SELECT unnest(list_transform(generate_series(1, len(s) - 1),
                      i -> s[i] || ' ' || s[i+1])) AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS s, freq FROM v{p})
    ),
    b{r} AS (
        SELECT string_split(pair, ' ')[1] AS l,
               string_split(pair, ' ')[2] AS r
        FROM (SELECT pair, sum(freq) AS n FROM p{r} GROUP BY 1
              ORDER BY n DESC, pair ASC LIMIT 1)
    ),
    v{r} AS (
        SELECT w, trim(regexp_replace(
                 replace(' ' || replace(seq, ' ', '  ') || ' ',
                         ' ' || b.l || '  ' || b.r || ' ',
                         ' ' || b.l || b.r || ' '),
                 ' +', ' ', 'g')) AS seq, freq, n_chars_sym
        FROM v{p}, b{r} b
    )""")
    return f"""
    WITH {', '.join(ctes)},
    vf AS (
        SELECT w, len(string_split(seq, ' ')) AS n_tok, n_chars_sym
        FROM v{_BPE_ROUNDS}
    ),
    occ AS (
        SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    )
    SELECT o.lang,
           CAST(count(*) AS BIGINT) AS n_word_occurrences,
           CAST(sum(v.n_chars_sym) AS BIGINT) AS char_tokens,
           CAST(sum(v.n_tok) AS BIGINT) AS bpe_tokens,
           {sql_round("sum(v.n_tok) * 1.0 / sum(v.n_chars_sym)", 4)}
               AS compression
    FROM occ o JOIN vf v ON v.w = o.w
    WHERE length(o.w) > 0
    GROUP BY o.lang ORDER BY o.lang
    """


@query("d193_bpe_tokenize", tags=("D193", "D188", "D69"),
       oracle=_d193_oracle())
def d193_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the other half of d188: learn the 3
    merge rules over the weighted type vocabulary (same loop, word
    carried through), then tokenize the whole corpus and ledger
    per-language char-tokens vs BPE-tokens (the compression a tokenizer
    buys is THE number that sets a training run's effective corpus
    size).

    Scale shape — apply by VOCAB JOIN, never by re-merging per
    occurrence: the merge loop runs over the checkpointed Zipf-bounded
    vocab exactly as d188 (1-row argmax per round); application is one
    word-explode of the corpus joined to the final ``(word → n_tokens)``
    vocab — the join stays UNHINTED (vocabulary grows with the corpus,
    Heaps' law: the d70 doctrine — AQE broadcasts it while small,
    sort-merges at 100 TB). Re-running the char-split + 3 replaces on
    every one of 100 TB of word OCCURRENCES would do the same work
    |corpus|/|vocab| times over; the join does it once per TYPE."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    seq0 = F.trim(F.regexp_replace("w", "(.)", "$1 "))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            seq0.alias("seq"),
            "freq",
            F.size(F.split(seq0, " ")).alias("n_chars_sym"),
        )
    )
    cur = reliable_checkpoint(vocab)
    for _ in range(_BPE_ROUNDS):
        lsym, rsym, _n = _bpe_best_pair(cur)
        # no per-round cut (r15) — see d188: <= _BPE_ROUNDS chained
        # regexp projections over the one vocab checkpoint
        cur = cur.withColumn("seq", _bpe_apply(F.col("seq"), lsym, rsym))
    vf = cur.select(
        "w", F.size(F.split("seq", " ")).alias("n_tok"), "n_chars_sym"
    )
    occ = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        occ.join(vf, "w")  # unhinted: vocab is SF-proportional (Heaps)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_word_occurrences"),
            F.sum("n_chars_sym").cast("long").alias("char_tokens"),
            F.sum("n_tok").cast("long").alias("bpe_tokens"),
            pround(
                F.sum("n_tok") * 1.0 / F.sum("n_chars_sym"), 4
            ).alias("compression"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# D195: content-defined chunking with an edit-stability audit
# ---------------------------------------------------------------------------

_CDC_SEED = "cdc|"
_CDC_MOD = 8  # expected chunk length ~= 8 tokens on 10-99-token docs
_FIX_W = 16  # fixed-stride contrast chunker width


def _cdc_chunk_hashes(toks: F.Column, *, distinct: bool = True) -> F.Column:
    """md5 hashes of the content-defined chunks of ``toks`` (distinct
    set by default; ``distinct=False`` keeps one entry per occurrence,
    the shape d200's chunk-index loop consumes).

    A boundary CLOSES a chunk after position ``i`` (i >= 3) whenever the
    portable hash of the 3-gram ending at ``i`` is ≡ 0 (mod _CDC_MOD) —
    the boundary decision depends only on a local token window, which is
    what makes the chunking insertion-stable (Rabin/FastCDC semantics).
    Pure array expressions: zero shuffle, zero Python.
    """
    n = F.size(toks)

    def gram(i: F.Column) -> F.Column:
        return F.concat_ws(
            " ",
            F.element_at(toks, i - 2),
            F.element_at(toks, i - 1),
            F.element_at(toks, i),
        )

    # callers filter to >= 4 tokens, so sequence(3, n) never descends
    bpos = F.filter(
        F.sequence(F.lit(3), n),
        lambda i: portable_hash_long(gram(i), _CDC_SEED) % _CDC_MOD == 0,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(n))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(starts)),
        lambda j: F.struct(
            F.element_at(starts, j).alias("s"), F.element_at(ends, j).alias("e")
        ),
    )
    valid = F.filter(pairs, lambda c: c["s"] <= c["e"])
    hashes = F.transform(
        valid,
        lambda c: F.md5(F.array_join(F.slice(toks, c["s"], c["e"] - c["s"] + 1), " ")),
    )
    return F.array_distinct(hashes) if distinct else hashes


def with_cdc_chunks(
    df: DataFrame, tok_col: str, out: str, *, distinct: bool = True
) -> DataFrame:
    """Append column ``out`` = CDC chunk hashes of ``tok_col``, STAGED:
    boundary positions, starts/ends, and span structs land in separate
    projection columns so each subtree is referenced by attribute
    instead of being inlined into every consumer — the one-shot inline
    expression (:func:`_cdc_chunk_hashes`) duplicates the boundary
    subtree ~6x and Catalyst pays for every copy at plan-compile time
    (measured 13.5 s vs 3.5 s for the d195 double-chunking at sf0.1;
    the DATA cost is identical — 0.06 s warm)."""
    n = F.size(F.col(tok_col))

    def gram(i: F.Column) -> F.Column:
        return F.concat_ws(
            " ",
            F.element_at(F.col(tok_col), i - 2),
            F.element_at(F.col(tok_col), i - 1),
            F.element_at(F.col(tok_col), i),
        )

    bp, s, e, pairs = f"_{out}_bp", f"_{out}_s", f"_{out}_e", f"_{out}_pairs"
    df = df.withColumn(
        bp,
        F.filter(
            F.sequence(F.lit(3), n),
            lambda i: portable_hash_long(gram(i), _CDC_SEED) % _CDC_MOD == 0,
        ),
    )
    df = df.withColumn(
        s, F.concat(F.array(F.lit(1)), F.transform(F.col(bp), lambda p: p + 1))
    )
    df = df.withColumn(e, F.concat(F.col(bp), F.array(n)))
    df = df.withColumn(
        pairs,
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col(s))),
                lambda j: F.struct(
                    F.element_at(F.col(s), j).alias("s"),
                    F.element_at(F.col(e), j).alias("e"),
                ),
            ),
            lambda c: c["s"] <= c["e"],
        ),
    )
    hashes = F.transform(
        F.col(pairs),
        lambda c: F.md5(
            F.array_join(F.slice(F.col(tok_col), c["s"], c["e"] - c["s"] + 1), " ")
        ),
    )
    df = df.withColumn(out, F.array_distinct(hashes) if distinct else hashes)
    return df.drop(bp, s, e, pairs)


def _fix_chunk_hashes(toks: F.Column) -> F.Column:
    """Distinct md5 hashes of fixed non-overlapping _FIX_W-token blocks."""
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(_FIX_W))
    return F.array_distinct(
        F.transform(starts, lambda s: F.md5(F.array_join(F.slice(toks, s, _FIX_W), " ")))
    )


def _cdc_sql_bp(t: str) -> str:
    """DuckDB fragment: CDC boundary positions of token list ``t``."""
    g = f"{t}[i-2] || ' ' || {t}[i-1] || ' ' || {t}[i]"
    return (
        f"list_filter(range(3, len({t})+1), "
        f"i -> {sql_hash_long(g, _CDC_SEED)} % {_CDC_MOD} = 0)"
    )


def _cdc_sql_chunks(t: str, s: str, e: str, *, distinct: bool = True) -> str:
    """DuckDB fragment: md5 chunk hashes from (tokens, starts, ends)."""
    lst = (
        f"list_transform("
        f"list_filter(range(1, len({s})+1), j -> {s}[j] <= {e}[j]), "
        f"j -> md5(array_to_string(list_slice({t}, {s}[j], {e}[j]), ' ')))"
    )
    return f"list_distinct({lst})" if distinct else lst


def _d195_oracle() -> str:
    bp = _cdc_sql_bp
    chunks = _cdc_sql_chunks

    def fix(t: str) -> str:
        return (
            f"list_distinct(list_transform(generate_series(1, len({t}), {_FIX_W}), "
            f"s -> md5(array_to_string(list_slice({t}, s, least(s+{_FIX_W - 1}, len({t}))), ' '))))"
        )

    return f"""
    WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t1
        FROM documents WHERE len(string_split(text, ' ')) >= 5
    ),
    v AS (SELECT doc_id, lang, t1, list_slice(t1, 2, len(t1)) AS t2 FROM base),
    b AS (SELECT doc_id, lang, t1, t2,
                 {bp('t1')} AS bp1,
                 {bp('t2')} AS bp2
          FROM v),
    se AS (SELECT doc_id, lang, t1, t2,
                  [1] || list_transform(bp1, p -> p + 1) AS s1,
                  list_append(bp1, len(t1)) AS e1,
                  [1] || list_transform(bp2, p -> p + 1) AS s2,
                  list_append(bp2, len(t2)) AS e2
           FROM b),
    hx AS (SELECT lang,
                  {chunks('t1', 's1', 'e1')} AS cdc1,
                  {chunks('t2', 's2', 'e2')} AS cdc2,
                  {fix('t1')} AS fix1,
                  {fix('t2')} AS fix2
           FROM se),
    per AS (SELECT lang,
                   len(cdc1) AS c1, len(cdc2) AS c2,
                   len(list_filter(cdc1, x -> list_contains(cdc2, x))) AS creu,
                   len(fix1) AS f1, len(fix2) AS f2,
                   len(list_filter(fix1, x -> list_contains(fix2, x))) AS freu
            FROM hx)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(c1) AS BIGINT) AS cdc_chunks_v1,
           CAST(sum(c2) AS BIGINT) AS cdc_chunks_v2,
           CAST(sum(creu) AS BIGINT) AS cdc_reused,
           {sql_round('CAST(sum(creu) AS DOUBLE) / sum(c2)', 4)} AS cdc_reuse_pct,
           CAST(sum(f1) AS BIGINT) AS fix_chunks_v1,
           CAST(sum(f2) AS BIGINT) AS fix_chunks_v2,
           CAST(sum(freu) AS BIGINT) AS fix_reused,
           {sql_round('CAST(sum(freu) AS DOUBLE) / sum(f2)', 4)} AS fix_reuse_pct
    FROM per GROUP BY lang ORDER BY lang
    """


@query("d195_cdc_chunking", tags=("D195", "D73", "D65", "D131"),
       oracle=_d195_oracle())
def d195_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin/FastCDC semantics on tokens) with
    a hash-checked EDIT-STABILITY audit — the property that makes CDC
    the chunker for incremental corpus dedup, which d73's fixed-stride
    chunking cannot provide.

    A chunk boundary closes after token ``i`` whenever the portable hash
    of the 3-gram ending at ``i`` is ≡ 0 (mod 8): the decision depends
    only on a LOCAL token window, so editing a document disturbs only
    the chunks overlapping the edit. The audit chunks every document
    twice — v1 as-is, v2 with the first token deleted (a deterministic
    head edit, the worst case for stride chunkers) — with BOTH chunkers,
    and ledgers per-language chunk counts and the fraction of v2 chunk
    hashes already present in v1 (``*_reuse_pct``). CDC reuse stays high
    (only the chunk containing the edit churns); fixed-stride reuse
    collapses (every block shifts by one token). A dedup index keyed on
    CDC chunk hashes (d131's shape) therefore stays valid across edits.

    Scale shape: the ENTIRE audit — boundary detection, both chunkers,
    both versions, per-doc intersections — is pure array expressions in
    one codegen'd projection (zero Python, zero per-chunk explode); the
    only shuffle is the final O(langs) rollup. At 100 TB this is a
    single map pass over the corpus, exactly like d73."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.size(F.split("text", " ")) >= 5).select(
        "doc_id", "lang", F.split("text", " ").alias("t1")
    )
    v = base.withColumn("t2", F.slice("t1", 2, F.size("t1") - 1))
    # staged chunk columns: attribute references instead of 6x-inlined
    # boundary subtrees — same values, ~4x cheaper to plan-compile
    v = with_cdc_chunks(v, "t1", "cdc1")
    v = with_cdc_chunks(v, "t2", "cdc2")
    per = v.select(
        "lang",
        "cdc1",
        "cdc2",
        _fix_chunk_hashes(F.col("t1")).alias("fix1"),
        _fix_chunk_hashes(F.col("t2")).alias("fix2"),
    ).select(
        "lang",
        F.size("cdc1").alias("c1"),
        F.size("cdc2").alias("c2"),
        F.size(F.array_intersect("cdc1", "cdc2")).alias("creu"),
        F.size("fix1").alias("f1"),
        F.size("fix2").alias("f2"),
        F.size(F.array_intersect("fix1", "fix2")).alias("freu"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("c1").cast("long").alias("cdc_chunks_v1"),
            F.sum("c2").cast("long").alias("cdc_chunks_v2"),
            F.sum("creu").cast("long").alias("cdc_reused"),
            pround(F.sum("creu") * 1.0 / F.sum("c2"), 4).alias("cdc_reuse_pct"),
            F.sum("f1").cast("long").alias("fix_chunks_v1"),
            F.sum("f2").cast("long").alias("fix_chunks_v2"),
            F.sum("freu").cast("long").alias("fix_reused"),
            pround(F.sum("freu") * 1.0 / F.sum("f2"), 4).alias("fix_reuse_pct"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# D202: tokenizer migration audit (two BPE generations side by side)
# ---------------------------------------------------------------------------

_D202_GEN_A = 3  # merge rules in the current tokenizer generation
_D202_GEN_B = 6  # merge rules in the candidate generation
_D202_BUDGET = 250  # per-doc token budget (context-window proxy)


def _d202_oracle() -> str:
    """d193's word-carried merge chain extended to GEN_B rounds, with
    vocab snapshots at GEN_A and GEN_B joined side by side."""
    ctes = [
        """w0 AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    v0 AS (
        SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq,
               count(*) AS freq
        FROM w0 WHERE length(w) > 0 GROUP BY 1, 2
    )"""
    ]
    for r in range(1, _D202_GEN_B + 1):
        p = r - 1
        ctes.append(f"""p{r} AS (
        SELECT unnest(list_transform(generate_series(1, len(s) - 1),
                      i -> s[i] || ' ' || s[i+1])) AS pair, freq
        FROM (SELECT string_split(seq, ' ') AS s, freq FROM v{p})
    ),
    b{r} AS (
        SELECT string_split(pair, ' ')[1] AS l,
               string_split(pair, ' ')[2] AS r
        FROM (SELECT pair, sum(freq) AS n FROM p{r} GROUP BY 1
              ORDER BY n DESC, pair ASC LIMIT 1)
    ),
    v{r} AS (
        SELECT w, trim(regexp_replace(
                 replace(' ' || replace(seq, ' ', '  ') || ' ',
                         ' ' || b.l || '  ' || b.r || ' ',
                         ' ' || b.l || b.r || ' '),
                 ' +', ' ', 'g')) AS seq, freq
        FROM v{p}, b{r} b
    )""")
    return f"""
    WITH {', '.join(ctes)},
    vf AS (
        SELECT a.w,
               len(string_split(a.seq, ' ')) AS n_tok_a,
               len(string_split(b.seq, ' ')) AS n_tok_b
        FROM v{_D202_GEN_A} a JOIN v{_D202_GEN_B} b ON a.w = b.w
    ),
    occ AS (
        SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, lang,
               sum(v.n_tok_a) AS ta, sum(v.n_tok_b) AS tb
        FROM occ o JOIN vf v ON v.w = o.w
        WHERE length(o.w) > 0
        GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ta) AS BIGINT) AS tokens_gen_a,
           CAST(sum(tb) AS BIGINT) AS tokens_gen_b,
           CAST(sum(tb) - sum(ta) AS BIGINT) AS token_delta,
           {sql_round('(sum(tb) - sum(ta)) * 1.0 / sum(ta)', 4)} AS token_delta_pct,
           CAST(sum(CASE WHEN ta > {_D202_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
               AS over_budget_gen_a,
           CAST(sum(CASE WHEN tb > {_D202_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
               AS over_budget_gen_b
    FROM per_doc GROUP BY lang ORDER BY lang
    """


@query("d202_tokenizer_migration", tags=("D202", "D193", "D188", "D194"),
       oracle=_d202_oracle())
def d202_tokenizer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer migration audit — the d194 question asked of the
    TOKENIZER instead of the embedding index: before swapping merge-rule
    generations (3 rules in production, 6 in the candidate), quantify
    per language what the swap does to effective corpus size
    (token_delta / token_delta_pct — more merges = fewer tokens = more
    documents per context window) and how many documents cross the
    per-doc token budget under each generation (the re-packing the
    migration forces on d80/d183-style shard layouts).

    Scale shape: ONE merge loop runs to GEN_B rounds over the
    checkpointed Zipf-bounded vocabulary (the d188 corpus + rounds x
    vocab rule — never rounds x corpus), snapshotting the per-word
    token count at GEN_A on the way; both generations APPLY by a single
    vocab join (the d193 doctrine) — the corpus is word-exploded once
    and joined once to the two-generation vocab, unhinted (Heaps-law
    build side). Per-doc totals are one (doc_id)-keyed aggregation;
    the lang ledger folds 5 rows."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    seq0 = F.trim(F.regexp_replace("w", "(.)", "$1 "))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("w", seq0.alias("seq"), "freq")
    )
    cur = reliable_checkpoint(vocab)
    va = None
    for r in range(1, _D202_GEN_B + 1):
        lsym, rsym, _n = _bpe_best_pair(cur)
        # no per-round cut (r15) — see d188: <= GEN_B chained regexp
        # projections over the one vocab checkpoint
        cur = cur.withColumn("seq", _bpe_apply(F.col("seq"), lsym, rsym))
        if r == _D202_GEN_A:
            va = cur.select(
                "w", F.size(F.split("seq", " ")).alias("n_tok_a")
            )
    vb = cur.select("w", F.size(F.split("seq", " ")).alias("n_tok_b"))
    vf = va.join(vb, "w")  # unhinted: vocab is SF-proportional (Heaps)
    occ = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") > 0)
    per_doc = (
        occ.join(vf, "w")
        .groupBy("doc_id", "lang")
        .agg(F.sum("n_tok_a").alias("ta"), F.sum("n_tok_b").alias("tb"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ta").cast("long").alias("tokens_gen_a"),
            F.sum("tb").cast("long").alias("tokens_gen_b"),
            (F.sum("tb") - F.sum("ta")).cast("long").alias("token_delta"),
            pround((F.sum("tb") - F.sum("ta")) * 1.0 / F.sum("ta"), 4).alias(
                "token_delta_pct"
            ),
            F.sum(F.when(F.col("ta") > _D202_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("over_budget_gen_a"),
            F.sum(F.when(F.col("tb") > _D202_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("over_budget_gen_b"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# D217: tokenizer fertility / compression audit per language
# ---------------------------------------------------------------------------

_D217_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@query(
    "d217_tokenizer_fertility",
    tags=("D217", "D69", "D71", "D193"),
    oracle=f"""
    WITH t AS (
        SELECT lang,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                   AS bpe_toks,
               len(list_filter(string_split(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' '), x -> length(x) > 0))
                   AS ws_toks
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe_toks) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(ws_toks) AS BIGINT) AS n_ws_words,
           {sql_round("sum(bpe_toks) * 1.0 / sum(ws_toks)", 4)} AS fertility,
           {sql_round("sum(n_chars) * 1.0 / sum(bpe_toks)", 4)} AS chars_per_token,
           {sql_round("sum(bpe_toks) * 1.0 / count(*)", 2)} AS tokens_per_doc
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def d217_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: fertility = subword
    (BPE-ish pre-tokenizer) tokens per whitespace word — THE standard
    multilingual-tokenizer health metric (a language whose fertility
    runs far above the corpus median pays proportionally more sequence
    length per sentence and trains on fewer effective documents per
    token budget) — plus chars-per-token (compression rate) and
    tokens-per-doc. Composes D69's two tokenizations (the BPE-ish
    regex pre-tokenizer and the normalized whitespace split) with
    D71's language buckets; the per-language report is what decides
    vocab re-balancing before a D188 retrain.

    Plan shape: both token counts are per-row JVM regex projections
    (regexp_count / size(filter(split())) — no explode, no UDF), then
    ONE groupBy(lang) shuffle over O(langs) groups; output is O(langs)
    rows. At 100 TB this is one corpus scan with a map-side-combined
    aggregate — the scan dominates, exactly as it should."""
    d = load_table(spark, sf_dir, "documents")
    ntext = F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")
    t = d.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.regexp_count("text", F.lit(_D217_BPE_RE)).alias("bpe_toks"),
        F.size(
            F.filter(F.split(ntext, " "), lambda x: F.length(x) > 0)
        ).alias("ws_toks"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("bpe_toks").cast("long").alias("n_bpe_tokens"),
            F.sum("ws_toks").cast("long").alias("n_ws_words"),
            F.sum("n_chars").alias("_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_bpe_tokens",
            "n_ws_words",
            pround(F.col("n_bpe_tokens") / F.col("n_ws_words"), 4).alias(
                "fertility"
            ),
            pround(F.col("_chars") / F.col("n_bpe_tokens"), 4).alias(
                "chars_per_token"
            ),
            pround(F.col("n_bpe_tokens") / F.col("n_docs"), 2).alias(
                "tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )
