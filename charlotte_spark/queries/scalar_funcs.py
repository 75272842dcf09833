"""Scalar function families (SURVEY §2.2 D44-D52).

Every query is a pure projection (whole-stage-codegen'd, zero shuffle
except the final declared ORDER BY). Cross-engine caveats handled here:
Spark hex() is uppercase → lower(); dayofweek is 1=Sunday in Spark vs
0=Sunday in DuckDB; sign()/epoch() return types are pinned by casts;
pmod is written portably as ((a % b) + b) % b on the DuckDB side.

R-parity: R11 timestamp normalize (charlotte/__init__.py:468) → d45;
R12 hex payload (:503,512,526) → d51; the inet_aton push-down (:488) →
d52's ip_str_to_long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.portable import pround, sql_round
from ..registry import query


@query(
    "d44_string_functions",
    tags=("D44",),
    oracle="""
    SELECT p_partkey,
           concat(p_brand, ':', p_name) AS branded,
           substring(p_name, 1, 5) AS prefix,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           trim('  ' || p_type || ' ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           length(p_name) AS name_len,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           replace(p_type, 'STANDARD', 'STD') AS retyped,
           instr(p_name, 'e') AS first_e,
           translate(p_brand, '#', '-') AS debranded
    FROM part
    ORDER BY p_partkey
    """,
)
def d44_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_name")).alias("branded"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.replace(F.col("p_type"), F.lit("STANDARD"), F.lit("STD")).alias("retyped"),
        F.instr("p_name", "e").alias("first_e"),
        F.translate("p_brand", "#", "-").alias("debranded"),
    ).orderBy("p_partkey")


@query(
    "d45_datetime_functions",
    tags=("D45", "R11"),
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           hour(o_orderdate) AS h,
           strftime(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS roundtrip,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate) + 1 AS dow
    FROM orders
    ORDER BY o_orderkey
    """,
)
def d45_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family; the epoch_s→roundtrip pair is R11 (charlotte's
    utcfromtimestamp+strftime, /root/reference/charlotte/__init__.py:468)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(
            F.timestamp_seconds(F.unix_timestamp("o_orderdate")), "yyyy-MM-dd HH:mm:ss"
        ).alias("roundtrip"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")


@query(
    "d46_math_functions",
    tags=("D46",),
    oracle=f"""
    SELECT c_custkey,
           {sql_round("c_acctbal", 2)} AS bal_r,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           abs(c_acctbal - 5000) AS dist_5k,
           {sql_round("pow(c_acctbal / 1000, 2)", 4)} AS bal_sq,
           {sql_round("sqrt(abs(c_acctbal))", 4)} AS bal_sqrt,
           {sql_round("exp(c_acctbal / 10000)", 4)} AS bal_exp,
           {sql_round("ln(abs(c_acctbal) + 1)", 4)} AS bal_ln,
           ((CAST(c_custkey AS BIGINT) - 7) % 5 + 5) % 5 AS pmod5,
           CAST(sign(c_acctbal - 5000) AS INTEGER) AS sgn,
           greatest(c_acctbal, 1000.0) AS g,
           least(c_acctbal, 1000.0) AS l
    FROM customer
    ORDER BY c_custkey
    """,
)
def d46_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        pround("c_acctbal", 2).alias("bal_r"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        F.abs(F.col("c_acctbal") - 5000).alias("dist_5k"),
        pround(F.pow(F.col("c_acctbal") / 1000, 2), 4).alias("bal_sq"),
        pround(F.sqrt(F.abs("c_acctbal")), 4).alias("bal_sqrt"),
        pround(F.exp(F.col("c_acctbal") / 10000), 4).alias("bal_exp"),
        pround(F.log(F.abs("c_acctbal") + 1), 4).alias("bal_ln"),
        F.pmod(F.col("c_custkey") - 7, F.lit(5)).alias("pmod5"),
        F.signum(F.col("c_acctbal") - 5000).cast("int").alias("sgn"),
        F.greatest("c_acctbal", F.lit(1000.0)).alias("g"),
        F.least("c_acctbal", F.lit(1000.0)).alias("l"),
    ).orderBy("c_custkey")


@query(
    "d47_conditional_null",
    tags=("D47", "R13", "R14"),
    oracle=f"""
    WITH e AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT event_id,
           coalesce({sql_round("v", 2)}, 0.0) AS v_filled,
           nullif(event_type, 'error') AS non_error_type,
           CASE WHEN v IS NULL THEN 'missing'
                WHEN v > 50 THEN 'high' ELSE 'low' END AS v_band,
           ifnull(nullif(event_type, 'error'), 'unknown-classification') AS classified
    FROM e
    ORDER BY event_id
    """,
)
def d47_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl / CASE — the R13/R14 default-fabrication
    primitives ('unknown-classification' default,
    /root/reference/charlotte/__init__.py:202)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 11 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    return e.select(
        "event_id",
        F.coalesce(pround("v", 2), F.lit(0.0)).alias("v_filled"),
        F.nullif("event_type", F.lit("error")).alias("non_error_type"),
        F.when(F.col("v").isNull(), "missing")
        .when(F.col("v") > 50, "high")
        .otherwise("low")
        .alias("v_band"),
        F.nvl(F.nullif("event_type", F.lit("error")), F.lit("unknown-classification")).alias(
            "classified"
        ),
    ).orderBy("event_id")


@query(
    "d48_array_functions",
    tags=("D48",),
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_toks,
           CAST(list_contains(toks, 'spark') AS BOOLEAN) AS has_spark,
           array_to_string(list_sort(toks[1:5]), ',') AS first5_sorted,
           array_to_string(list_sort(list_distinct(toks)), ',') AS vocab,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), ',') AS up2,
           coalesce(array_to_string(list_filter(toks[1:10], x -> length(x) > 4), ','), '') AS long_toks,
           list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b) AS total_chars,
           array_to_string([x for x in generate_series(1, 3)], ',') AS seq3
    FROM documents JOIN t USING (doc_id)
    ORDER BY doc_id
    """,
)
def d48_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions over tokenized documents.
    Slices use 1-based inclusive semantics in both engines (Spark slice
    / DuckDB list[a:b]). Empty-list rendering diverges: Spark
    ``array_join([])`` = '' but DuckDB ``array_to_string([])`` = NULL,
    so every oracle folding a possibly-empty list coalesces to '' —
    found by the sf0.1 sweep (no sf0.01 doc had a filter-to-empty
    token prefix)."""
    d = load_table(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_join(F.array_sort(F.slice("toks", 1, 5)), ",").alias("first5_sorted"),
        F.array_join(F.array_sort(F.array_distinct("toks")), ",").alias("vocab"),
        F.array_join(F.transform(F.slice("toks", 1, 3), lambda x: F.upper(x)), ",").alias(
            "up2"
        ),
        F.array_join(
            F.filter(F.slice("toks", 1, 10), lambda x: F.length(x) > 4), ","
        ).alias("long_toks"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.array_join(F.sequence(F.lit(1), F.lit(3)), ",").alias("seq3"),
    ).orderBy("doc_id")


@query(
    "d48_explode",
    tags=("D48", "R10"),
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id, pos
    """,
)
def d48_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — the R10 packet-explode primitive (one row per packet,
    /root/reference/charlotte/__init__.py:480-533) applied to tokens."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .select("doc_id", "tok", "pos")
        .orderBy("doc_id", "pos")
    )


@query(
    "d49_map_functions",
    tags=("D49",),
    oracle="""
    SELECT doc_id,
           array_to_string(map_keys(m), ',') AS ks,
           array_to_string(map_values(m), ',') AS vs,
           m['lang'][1] AS lang_val,
           cardinality(m) AS n_entries
    FROM (
        SELECT doc_id, map(['lang', 'source'], [lang, source]) AS m
        FROM documents
    )
    ORDER BY doc_id
    """,
)
def d49_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value extraction (insertion order is
    preserved by both engines for literal maps)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array(F.col("lang"), F.col("source"))
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.array_join(F.map_values(m), ",").alias("vs"),
        F.element_at(m, "lang").alias("lang_val"),
        F.size(m).alias("n_entries"),
    ).orderBy("doc_id")


@query(
    "d50_json_functions",
    tags=("D50",),
    oracle="""
    SELECT event_id,
           props->>'$.k' AS k_str,
           CAST(props->>'$.k' AS INTEGER) AS k_int,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events
    ORDER BY event_id
    """,
)
def d50_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object / from_json).

    fan_out: two JSON parses per row is compute-dense enough to beat
    the exchange off the single-split scan."""
    from pyspark.sql import types as T

    e = fan_out(load_table(spark, sf_dir, "events"))
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        parsed.isNotNull().alias("is_valid"),
    ).orderBy("event_id")


@query(
    "d51_hash_encoding",
    tags=("D51", "R12"),
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           CAST(sha256(lang) AS VARCHAR) AS lang_sha256,
           lower(hex(encode(source))) AS source_hex,
           to_base64(encode(source)) AS source_b64
    FROM documents
    ORDER BY doc_id
    """,
)
def d51_hash_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2 / hex / base64 — hex is lower()ed on the Spark side
    (Spark uppercases, binascii/DuckDB don't; R12 analog,
    /root/reference/charlotte/__init__.py:503)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("lang", 256).alias("lang_sha256"),
        F.lower(F.hex(F.col("source").cast("binary"))).alias("source_hex"),
        F.base64(F.col("source").cast("binary")).alias("source_b64"),
    ).orderBy("doc_id")


@query(
    "d52_ip_str_to_long",
    tags=("D52", "R12"),
    oracle="""
    WITH ips AS (
        SELECT c_custkey,
               '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
               CAST((c_custkey // 256) % 256 AS VARCHAR) || '.' ||
               CAST(c_nationkey % 256 AS VARCHAR) AS ip
        FROM customer
    )
    SELECT c_custkey, ip,
           CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 +
           CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 +
           CAST(split_part(ip, '.', 3) AS BIGINT) * 256 +
           CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_long
    FROM ips
    ORDER BY c_custkey
    """,
)
def d52_ip_str_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inet_aton analog (charlotte pushes it into MySQL,
    /root/reference/charlotte/__init__.py:488) as a pure-column expression
    — no UDF, stays in codegen."""
    from ..functions.net import ip_str_to_long

    c = load_table(spark, sf_dir, "customer")
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("c_custkey") % 256).cast("string"),
        ((F.col("c_custkey") / 256).cast("long") % 256).cast("string"),
        (F.col("c_nationkey") % 256).cast("string"),
    )
    return (
        c.select("c_custkey", ip.alias("ip"))
        .withColumn("ip_long", ip_str_to_long(F.col("ip")))
        .orderBy("c_custkey")
    )
