"""JDBC scan/sink surface (SURVEY §2.2 D3/D5, §2.1 R21).

The reference writes MySQL row-at-a-time with unbounded exponential
backoff (/root/reference/charlotte/__init__.py:372-433). The Spark
shape is set-wise: `df.write.jdbc(mode="append")` per fact batch inside
`foreachBatch`, wrapped in the same backoff (`with_retry`), idempotent
on `(sid, cid)` natural keys because JDBC commits are not coordinated
with the streaming checkpoint (SURVEY §7 hard #1).

No external database server exists in this container, but Spark ships
embedded Apache Derby (for the Hive metastore), which has a real JDBC
driver — so D3/D5 and the full JDBC star pipeline ARE exercised here
against `jdbc:derby:memory:` endpoints (`d3_jdbc_scan`, `d5_jdbc_sink`,
tests/test_jdbc.py). MySQL specifics live in mysql_dialect.py
(type/quote mapping, snorby DDL with natural-key replay backstops,
ON DUPLICATE KEY UPDATE, INET_ATON equivalence vectors), golden-tested
in tests/test_mysql_dialect.py since no MySQL server exists here; the
engine-side JDBC path — partitioned reads, batched appends, retry,
dialect type mapping — runs for real against Derby. The retry
semantics are additionally unit-tested with fakes in
tests/test_streaming.py; `JdbcSnorbyDB` mirrors `SnorbyDB`'s interface
so `apply_batch` works unchanged against a real endpoint.

At scale: each executor partition opens its own connection
(`numPartitions` bounds the connection fan-in); dimension upserts stay
single-writer (anti-join-then-append races otherwise — same assumption
the reference makes, backstopped by unique keys in DDL).

MySQL dialect parity notes (what changes off-Derby, none of it
engine-side logic):
- identifier quoting: Spark's MySQLDialect quotes with backticks
  automatically; no table/column here needs quoting in either dialect.
- upsert: the reference relies on MySQL `INSERT ... ON DUPLICATE KEY
  UPDATE` semantics implicitly (unique keys absorb replays). This
  engine gets idempotence from the applied-batch marker + natural-key
  anti-joins instead, which is dialect-neutral; on MySQL the DDL's
  unique keys remain the final backstop, as in the reference.
- type mapping: the star uses only int/bigint/varchar/timestamp, which
  map 1:1 in both Derby and MySQL JDBC dialects (no decimal/blob edge
  cases in this schema; payload hex is varchar by design, matching the
  reference's `data_payload` text column).
- `inet_aton(%s)` (charlotte/__init__.py:488) is MySQL-only; the engine
  computes the dotted-quad → bigint conversion in Spark (S9 row) so the
  SQL sent over JDBC is dialect-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.snorby import with_retry


def _permanent_sql_error(e: Exception) -> bool:
    """Errors retrying cannot fix: missing table/view (Derby 42X05,
    MySQL 42S02, generic 'does not exist') or SQL syntax (42X01/42000).
    Everything else (connection reset, lock timeout, node loss) stays
    retryable."""
    s = str(e)
    return any(
        tok in s
        for tok in ("42X05", "42S02", "42X01", "does not exist", "not exist")
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """D3: JDBC scan with retry; `predicates` split the read into one
    partition per predicate (the parallel-scan shape)."""
    def _read():
        reader = spark.read
        if predicates:
            return reader.jdbc(url, table, predicates=predicates, properties=properties or {})
        return reader.jdbc(url, table, properties=properties or {})

    return with_retry(_read, fatal=_permanent_sql_error)


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """D5/R21: append with bounded connection fan-in and backoff."""
    def _write():
        out = df.repartition(num_partitions) if num_partitions else df
        (
            out.write.option("batchsize", str(batchsize))
            .jdbc(url, table, mode="append", properties=properties or {})
        )

    with_retry(_write)


class JdbcSnorbyDB:
    """SnorbyDB-compatible facade over a real database endpoint: same
    read/overwrite/append/applied_batches surface `apply_batch` uses,
    so the streaming pipeline switches sinks by constructor alone."""

    def __init__(self, spark: SparkSession, url: str, properties: dict | None = None):
        self.spark = spark
        self.url = url
        self.properties = properties or {}

    @staticmethod
    def _table(name: str) -> str:
        """SQL identifiers can't start with '_' in most DBMSs (Derby,
        ANSI): the parquet tier's `_batches` marker maps to `meta_batches`."""
        return f"meta{name}" if name.startswith("_") else name

    def read(self, name: str, schema: str) -> DataFrame:
        return read_jdbc(self.spark, self.url, self._table(name), self.properties)

    def overwrite(self, name: str, df: DataFrame) -> None:
        def _w():
            df.write.jdbc(
                self.url, self._table(name), mode="overwrite", properties=self.properties
            )

        with_retry(_w)

    def append(self, name: str, df: DataFrame) -> None:
        write_jdbc_append(df, self.url, self._table(name), self.properties)

    def read_small(self, name: str, schema: str) -> list[dict]:
        """KB-sized dim as driver-side rows; over JDBC this is one
        bounded SELECT (the reference's cache-fill reads, :543-552)."""
        try:
            return [r.asDict() for r in self.read(name, schema).collect()]
        except Exception:  # table absent on first run
            return []

    def overwrite_small(self, name: str, rows: list[dict], schema: str) -> None:
        from ..session import local_df

        cols = [p.strip().split()[0] for p in schema.split(",")]
        self.overwrite(
            name, local_df(self.spark, [tuple(r[c] for c in cols) for r in rows], schema)
        )

    def applied_batches(self) -> set[int]:
        try:
            return {r.batch_id for r in self.read("_batches", "batch_id long").collect()}
        except Exception:  # table absent on first run
            return set()

    def mark_applied(self, batch_id: int) -> None:
        from ..session import local_df

        self.append("_batches", local_df(self.spark, [(batch_id,)], "batch_id long"))

    def create_schema(self, run_sql, dialect: str = "mysql") -> None:
        """Provision the star on the endpoint: executes the dialect's
        DDL (mysql_dialect.ddl_statements — golden-tested strings)
        through the caller-supplied ``run_sql(statement)``, because raw
        DDL needs a statement channel Spark's DataFrame API doesn't
        expose (MySQLdb cursor, JayDeBeApi, an ops migration tool)."""
        from .mysql_dialect import ddl_statements

        for stmt in ddl_statements(dialect):
            run_sql(stmt)
