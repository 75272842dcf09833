"""Python UDF surface (SURVEY §2.2 D61-D64) — the deliberate slow path.

Everything here is Arrow-vectorized (pandas UDF / applyInPandas /
mapInPandas); row-at-a-time Python UDFs are banned from the engine.
These are the primitives the unified2 parser (R6/R7) and per-group text
analysis are built on; each query's semantics are still simple enough
to oracle-check in DuckDB SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@F.pandas_udf(T.LongType())
def _ip_to_long_pudf(ip: pd.Series) -> pd.Series:
    """Vectorized inet_aton (R6-style parse work done in pandas)."""
    parts = ip.str.split(".", expand=True).astype("int64")
    return parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3]


@query(
    "d61_scalar_pandas_udf",
    tags=("D61", "R6"),
    oracle="""
    WITH ips AS (
        SELECT s_suppkey,
               '172.16.' || CAST(s_suppkey % 256 AS VARCHAR) || '.' ||
               CAST(s_nationkey % 256 AS VARCHAR) AS ip
        FROM supplier
    )
    SELECT s_suppkey, ip,
           CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 +
           CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 +
           CAST(split_part(ip, '.', 3) AS BIGINT) * 256 +
           CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_long
    FROM ips
    ORDER BY s_suppkey
    """,
)
def d61_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow scalar pandas UDF (series→series)."""
    s = load_table(spark, sf_dir, "supplier")
    ip = F.concat_ws(
        ".",
        F.lit("172"),
        F.lit("16"),
        (F.col("s_suppkey") % 256).cast("string"),
        (F.col("s_nationkey") % 256).cast("string"),
    )
    return (
        s.select("s_suppkey", ip.alias("ip"))
        .withColumn("ip_long", _ip_to_long_pudf(F.col("ip")))
        .orderBy("s_suppkey")
    )


@query(
    "d62_apply_in_pandas",
    tags=("D62",),
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           {sql_round("avg(n_chars)", 2)} AS avg_chars,
           {sql_round("avg(len(string_split(text, ' ')))", 2)} AS avg_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def d62_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language document statistics.
    (Used as the model for per-group text analysis, SURVEY D62.)"""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        n_tokens = pdf["text"].str.split(" ").str.len()
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "avg_chars": [math.floor(pdf["n_chars"].mean() * 100 + 0.5) / 100],
                "avg_tokens": [math.floor(n_tokens.mean() * 100 + 0.5) / 100],
            }
        )

    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .applyInPandas(stats, "lang string, n_docs long, avg_chars double, avg_tokens double")
        .orderBy("lang")
    )


@F.pandas_udf(T.DoubleType())
def _weighted_mean_udaf(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDAF: weight-averaged value."""
    import math

    total_w = w.sum()
    if total_w == 0:
        return 0.0
    return math.floor(float((v * w).sum() / total_w) * 10000 + 0.5) / 10000


@query(
    "d63_grouped_agg_udaf",
    tags=("D63",),
    oracle=f"""
    SELECT event_type,
           {sql_round("sum(value * CAST(props->>'$.k' AS DOUBLE)) / sum(CAST(props->>'$.k' AS DOUBLE))", 4)} AS wmean
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def d63_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF (k from the props JSON as weight)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "w", F.get_json_object("props", "$.k").cast("double")
    )
    return (
        e.groupBy("event_type")
        .agg(_weighted_mean_udaf("value", "w").alias("wmean"))
        .orderBy("event_type")
    )


@query(
    "d64_udtf_explode",
    tags=("D64", "R10"),
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || '_' || toks[i + 1])) AS bigram
    FROM t
    ORDER BY doc_id, bigram
    """,
)
def d64_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style one-row→N-rows expansion via mapInPandas (the unified2
    record→events shape, R6/D64): emit token bigrams per document."""

    def bigrams(it):
        for pdf in it:
            out_ids, out_bg = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                for a, b in zip(toks, toks[1:]):
                    out_ids.append(doc_id)
                    out_bg.append(f"{a}_{b}")
            yield pd.DataFrame({"doc_id": out_ids, "bigram": out_bg})

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", "text")
        .mapInPandas(bigrams, "doc_id long, bigram string")
        .orderBy("doc_id", "bigram")
    )


@query(
    "d110_python_udtf",
    tags=("D110", "D64", "D73"),
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n) AS BIGINT) AS total_toks
    FROM (
        SELECT lang,
               unnest(list_transform(
                   range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                   i -> CASE WHEN (i + 1) * 8 <= len(toks) THEN 8
                             ELSE len(toks) - i * 8 END)) AS n
        FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY lang ORDER BY lang
    """,
)
def d110_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (the @udtf API, Spark 3.5+)
    consumed through a SQL LATERAL join: each document expands to its
    8-token chunks with per-chunk token counts, rolled up per language.

    This row declares the UDTF API surface itself — the engine's BULK
    chunking path stays the pure-JVM window explode (d73); a UDTF is
    the right tool when the expansion logic needs arbitrary Python per
    input row (external tokenizers, format-specific splitters). The
    expansion is LATERAL — executed per partition alongside the scan,
    no shuffle added; only the rollup aggregates."""
    from pyspark.sql.functions import udtf

    from ..catalog import register_views

    # Arrow-batch the UDTF boundary (repo policy: no row-at-a-time
    # pickling on the Python edge); semantics unchanged if unsupported
    try:
        spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    except Exception:
        pass

    @udtf(returnType="chunk_idx: int, n_toks: int")
    class ChunkDoc:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(0, len(toks), 8):
                yield (i // 8, len(toks[i : i + 8]))

    spark.udtf.register("chunk_doc", ChunkDoc)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.lang,
               count(*) AS n_chunks,
               sum(c.n_toks) AS total_toks
        FROM documents d, LATERAL chunk_doc(d.text) c
        GROUP BY d.lang ORDER BY d.lang
        """
    )
