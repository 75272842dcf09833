"""Table loading for the driver's synthetic parquet tables.

Loads with :mod:`charlotte_spark.schemas` declared schemas so column
pruning / predicate pushdown see stable types, and registers temp views
so SQL-form queries work too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(schemas.TABLES)


# Inferred-schema cache, keyed by resolved file path. The test tables
# are immutable (read-only mount), so their PHYSICAL schema never
# changes within or across sessions — but `spark.read.parquet(path)`
# re-infers it from the footer on every call (~110 ms of driver work
# per call, measured r15), and the registry calls load_table 1-3 times
# per query run. Caching the one inference and passing it back via
# `.schema(...)` cuts the per-call cost ~6x while keeping behavior
# byte-identical: the cached schema IS the inferred one (nanos-as-long
# and all), the conversion loop below still keys off actual dtypes,
# and the file listing itself stays per-call (no staleness surface
# beyond the schema, which immutability covers). At 100 TB the same
# move is a catalog/manifest schema instead of per-query footer reads
# (guide §6 file-listing/metadata caching).
_SCHEMA_CACHE: dict[str, T.StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table as a DataFrame (schema-pinned parquet scan)."""
    if name not in schemas.TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = sch
    df = spark.read.schema(sch).parquet(path)
    # TIMESTAMP(NANOS) parquet columns arrive as epoch-nanos longs (see
    # session.py nanosAsLong); truncate to micros like DuckDB's reader.
    for fld, want in zip(df.schema.fields, schemas.TABLES[name].fields):
        if isinstance(fld.dataType, T.LongType) and isinstance(want.dataType, T.TimestampType):
            df = df.withColumn(
                fld.name, F.timestamp_micros(F.floor(F.col(fld.name) / 1000).cast("long"))
            )
    return df


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a CPU-dense input before heavy per-row
    work (per-shingle hashing, JSON parsing, vector math).

    The driver's test parquet is one row group per file, so every scan
    stage is a single task and per-row compute serializes on one core of
    32 — a local-bench artifact. The exchange only pays for itself when
    downstream per-row work dwarfs it (measured: plain aggregations are
    FASTER without this — partial agg beats the shuffle). At 100 TB the
    scan has thousands of natural splits and this becomes unnecessary;
    keep it only ahead of genuinely compute-bound projections, where an
    explicit repartition is what you'd do on a skewed/few-split input
    anyway."""
    sc = df.sparkSession.sparkContext
    return df.repartition(partitions or sc.defaultParallelism)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table; returns {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register each as a temp view (for spark.sql)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
