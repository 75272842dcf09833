"""Web-curation operators (SURVEY §2.2 D157-D158).

The two corpus-hygiene steps every web-scale pretraining pipeline runs
before the dedup/quality stack (D65-D131): URL canonicalization +
per-domain accounting (domain filters, crawl-dup collapse — cf. C4 /
RefinedWeb curation), and CROSS-document boilerplate line detection
(nav bars / footers repeated across pages — the complement of D89's
intra-document line dedup).

The synthetic `documents` table has no URLs or newlines, so structure
is synthesized DETERMINISTICALLY in both engines (the D89/D149
construction): a per-doc URL built from (source, doc_id, lang) with
query-string and trailing-slash variants, prepended to the text so the
extraction regex does real work; lines are the 8-token chunks D89
uses. Every expression is JVM-side (regexp/split/explode) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import portable_hash_long, pround, sql_hash_long, sql_round
from ..registry import query

# Line construction shared with D89: 8-token chunks.
_LINE_TOKS = 8
# A line is cross-doc boilerplate when it appears in >= K distinct docs.
_BOILER_K = 3
# D157 digest fan-out: each domain's canonical-URL set digest is folded
# per (domain, md5-bucket) first, so no single aggregation buffer ever
# holds more than ~1/B of a hot domain's URLs (VERDICT r07 #2).
_URL_BUCKETS = 32


@query(
    "d157_url_curation",
    tags=("D157", "D12", "D24"),
    oracle=f"""
    WITH pages AS (
        SELECT doc_id,
               'https://' || source || '.example.com/p/'
                   || CAST(doc_id % 523 AS VARCHAR)
                   || CASE WHEN doc_id % 3 = 0 THEN '?utm=' || lang
                           WHEN doc_id % 7 = 0 THEN '/'
                           ELSE '' END
                   || ' ' || text AS page
        FROM documents
    ),
    extracted AS (
        SELECT doc_id,
               regexp_extract(page, 'https?://[^ ]+', 0) AS url
        FROM pages
    ),
    canon AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(url, '\\?.*$', ''), '/+$', '')
                   AS curl,
               regexp_extract(url, '^https?://([^/]+)', 1) AS domain
        FROM extracted
    ),
    lvl1 AS (
        SELECT domain,
               {sql_hash_long("curl")} % {_URL_BUCKETS} AS bkt,
               count(*) AS n_docs_b,
               count(DISTINCT curl) AS n_canon_b,
               md5(string_agg(DISTINCT curl, ',' ORDER BY curl)) AS sub
        FROM canon GROUP BY domain, bkt
    )
    SELECT domain,
           CAST(sum(n_docs_b) AS BIGINT) AS n_docs,
           CAST(sum(n_canon_b) AS BIGINT) AS n_canonical,
           CAST(sum(n_docs_b) - sum(n_canon_b) AS BIGINT) AS n_crawl_dups,
           md5(string_agg(sub, ',' ORDER BY sub)) AS canon_md5
    FROM lvl1 GROUP BY domain ORDER BY domain
    """,
)
def d157_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + canonicalization + per-domain crawl accounting:
    pull the URL out of each page, canonicalize (strip query string and
    trailing slashes — so the `?utm=` and `/` crawl variants of one
    page collapse), and roll up per domain: docs, canonical pages, and
    crawl-duplicate count. This is the domain-level filter/dedup input
    every web corpus builds first; doc_id % 523 forces real canonical
    collisions at every SF (multiple docs share a page path).

    Plan shape: pure scan-stage regexp projection (whole-stage
    codegen'd, no UDF), then a TWO-LEVEL digest fold (the D99/D159
    pattern): level 1 groups by (domain, md5-bucket of the canonical
    URL) so each collect_set buffer holds only ~1/B of a domain's
    distinct URLs — a hot domain with 10^8 canonical pages can no
    longer pin an unbounded agg state on one reducer (and B scales
    with the corpus if needed); level 2 folds the B sorted sub-digests
    (bounded: <= B rows per domain) and sums the partial counts.
    Distinct-canonical counts ride Catalyst's expand at the bucket
    grain and sum exactly because a URL's bucket is a pure function of
    the URL. At 100 TB: one scan, one keyed shuffle on (domain,
    bucket), one tiny shuffle on domain."""
    d = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/p/"),
        (F.col("doc_id") % 523).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("?utm="), F.col("lang")))
        .when(F.col("doc_id") % 7 == 0, F.lit("/"))
        .otherwise(F.lit("")),
        F.lit(" "),
        F.col("text"),
    )
    url = F.regexp_extract(page, r"https?://[^ ]+", 0)
    curl = F.regexp_replace(F.regexp_replace(url, r"\?.*$", ""), r"/+$", "")
    domain = F.regexp_extract(url, r"^https?://([^/]+)", 1)
    c = d.select(domain.alias("domain"), curl.alias("curl"))
    # ONE collect_set per (domain, bkt) feeds both the distinct count
    # (size) and the sub-digest — a separate count_distinct alongside
    # would force Catalyst's expand, doubling the level-1 stream
    # (VERDICT r08 #4: the 2.87x d157 regression was exactly that).
    lvl1 = (
        c.withColumn("bkt", portable_hash_long("curl") % _URL_BUCKETS)
        .groupBy("domain", "bkt")
        .agg(
            F.count(F.lit(1)).alias("n_docs_b"),
            F.array_sort(F.collect_set("curl")).alias("arr"),
        )
        .select(
            "domain",
            "n_docs_b",
            F.size("arr").cast("long").alias("n_canon_b"),
            F.md5(F.concat_ws(",", "arr")).alias("sub"),
        )
    )
    return (
        lvl1.groupBy("domain")
        .agg(
            F.sum("n_docs_b").alias("n_docs"),
            F.sum("n_canon_b").alias("n_canonical"),
            (F.sum("n_docs_b") - F.sum("n_canon_b")).alias("n_crawl_dups"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list("sub")))).alias(
                "canon_md5"
            ),
        )
        .orderBy("domain")
    )


@query(
    "d158_boilerplate_lines",
    tags=("D158", "D89", "D70"),
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    lined AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   generate_series(0, CAST(ceil(len(toks) / {_LINE_TOKS}.0) AS BIGINT) - 1),
                   i -> array_to_string(
                       toks[i * {_LINE_TOKS} + 1 : i * {_LINE_TOKS} + {_LINE_TOKS}], ' ')
               )) AS line
        FROM t
    ),
    freq AS (
        SELECT line, count(DISTINCT doc_id) AS df
        FROM lined GROUP BY line
    ),
    flagged AS (
        SELECT l.doc_id, l.source,
               CASE WHEN f.df >= {_BOILER_K} THEN 1 ELSE 0 END AS boiler
        FROM lined l JOIN freq f USING (line)
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(boiler) AS BIGINT) AS n_boiler_lines,
           {sql_round("sum(boiler) / count(*)", 6)} AS boiler_ratio
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def d158_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: a line (8-token chunk, the
    D89 construction) occurring in >= {K} distinct documents is
    boilerplate — the nav-bar/footer removal rule web curation applies
    corpus-wide, complementing D89's within-doc dedup. Output: per
    source, how much of the line volume is boilerplate. The 30-word
    synthetic vocabulary guarantees natural cross-doc chunk collisions
    at every SF — no synthesized duplicates needed.

    Plan shape: explode to (doc, line), one partial-agg groupBy(line)
    with a distinct-doc count (Catalyst expand), rejoin the per-line
    document frequency onto the line stream keyed by line (UNHINTED —
    the frequency table is corpus-sized in the worst case, so the
    planner must stay free to sort-merge), then a per-source rollup.
    At 100 TB: two keyed shuffles (line, then source) — the same cost
    class as TF-IDF (D70), which shares the explode+df shape. The
    line-frequency table can also be Bloom-pruned (A94's screen) when
    only the boilerplate SET is needed.

    Null texts are filtered before the explode in BOTH engines: with a
    null array Spark's F.size returns -1 and sequence(0, -1) yields a
    DESCENDING [0,-1] where DuckDB's generate_series yields [] — a
    latent divergence the filter removes at the source (ADVICE r07)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", F.split("text", " ").alias("toks"))
    )
    lines = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / F.lit(float(_LINE_TOKS))).cast("long") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i * _LINE_TOKS + 1, _LINE_TOKS), " "
                ),
            )
        ).alias("line"),
    )
    freq = lines.groupBy("line").agg(F.count_distinct("doc_id").alias("df"))
    flagged = lines.join(freq, "line").select(
        "source",
        "doc_id",
        (F.col("df") >= _BOILER_K).cast("int").alias("boiler"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("boiler").alias("n_boiler_lines"),
            pround(F.sum("boiler") / F.count(F.lit(1)), 6).alias("boiler_ratio"),
        )
        .orderBy("source")
    )


d158_boilerplate_lines.__doc__ = d158_boilerplate_lines.__doc__.format(K=_BOILER_K)


@query(
    "d159_curation_scorecard",
    tags=("D159", "D65", "D76", "D24"),
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars,
               md5(text) AS tmd5,
               len(list_filter(string_split(text, ' '), t -> length(t) > 0))
                   AS n_toks,
               len(list_distinct(list_filter(string_split(text, ' '),
                                             t -> length(t) > 0))) AS n_types
        FROM documents
    ),
    dup AS (
        SELECT d.*, count(*) OVER (PARTITION BY tmd5) AS copies FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
           {sql_round("sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) / count(*)", 6)}
               AS dup_rate,
           CAST(sum(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short_docs,
           {sql_round("avg(n_toks)", 6)} AS mean_tokens,
           {sql_round("avg(n_types * 1.0 / n_toks)", 6)} AS mean_ttr,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM dup GROUP BY source ORDER BY source
    """,
)
def d159_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard — the report a data-curation
    pipeline emits before deciding mixture weights: volume, exact-dup
    rate (corpus-wide, so cross-source copies count), short-doc count,
    mean token count, mean type-token ratio (lexical diversity), and
    language spread. Composes the D65 (dedup), D76 (quality) and D24
    (rollup) families into one artifact.

    Plan shape: token stats are scan-stage array expressions; the
    corpus-wide copy count is a window PARTITIONED BY the text md5 (a
    keyed shuffle, never a global window — hash keys are uniform so no
    skew), then one partial-agg rollup on source. At 100 TB: two keyed
    shuffles (md5, then source) and nothing else; the same shape as
    exact dedup plus a rollup."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    base = d.select(
        "source",
        "lang",
        F.md5("text").alias("tmd5"),
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    )
    dup = base.withColumn("copies", F.count(F.lit(1)).over(W.partitionBy("tmd5")))
    return (
        dup.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("copies") > 1).cast("long")).alias("n_dup_docs"),
            pround(
                F.sum((F.col("copies") > 1).cast("long")) / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            F.sum((F.col("n_toks") < 20).cast("long")).alias("n_short_docs"),
            pround(F.avg("n_toks"), 6).alias("mean_tokens"),
            pround(F.avg(F.col("n_types") / F.col("n_toks")), 6).alias("mean_ttr"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )
