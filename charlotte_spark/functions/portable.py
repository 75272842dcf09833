"""Portable (cross-engine deterministic) expression helpers.

SURVEY §2 determinism rules require every float in a declared result to
be rounded — but Spark's ``round`` (BigDecimal HALF_UP over the exact
binary expansion) and DuckDB's ``round`` disagree whenever the true
value sits on a ``.xx5`` decimal boundary, which happens constantly
with 2-decimal money columns. Both engines DO produce bit-identical
IEEE doubles for the same arithmetic, so ``floor(x*10^n + 0.5)/10^n``
evaluated in each engine yields identical results. Use :func:`pround`
on the Spark side and :func:`sql_round` when building oracle SQL.

Same story for hashes used in query logic (SURVEY §2 caveats):
engine-native ``hash()`` differs, so :func:`portable_hash_long` /
:func:`sql_hash_long` derive a 32-bit-bounded integer from the hex
prefix of ``md5`` — identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int = 2) -> Column:
    """Deterministic cross-engine round-half-up to ``n`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**n))
    return F.floor(c * scale + F.lit(0.5)) / scale


def sql_round(expr: str, n: int = 2) -> str:
    """DuckDB SQL equivalent of :func:`pround` (same IEEE ops, same bits)."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def portable_hash_long(col: Column | str, seed: str = "") -> Column:
    """Stable non-negative int from md5 — same value in Spark and DuckDB.

    Uses the first 8 hex chars of md5(seed || value-as-string), so the
    result fits in 32 bits (no signedness disagreements).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), c.cast("string"))), 1, 8), 16, 10).cast(
        "long"
    )


def sql_hash_long(expr: str, seed: str = "") -> str:
    """DuckDB SQL equivalent of :func:`portable_hash_long`."""
    return f"CAST('0x' || substring(md5('{seed}' || CAST(({expr}) AS VARCHAR)), 1, 8) AS BIGINT)"
