"""Token n-gram (shingle) construction, JVM-side.

Perf note (measured at sf0.1): referencing the `split()` *expression*
inside a higher-order lambda re-evaluates the split per element access
— Catalyst does no common-subexpression elimination across lambda
bodies — which made shingling O(tokens × n) splits per row (~8 s for
5k docs). Materializing the token array as a real column first makes
`element_at` a bound reference: ~1 s for the same input. Always build
shingles through this helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_shingles(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    out: str = "shingles",
    distinct: bool = True,
) -> DataFrame:
    """Add `out` = array of space-joined token n-grams of `text_col`;
    rows with fewer than n tokens are dropped (matches the DuckDB-side
    `WHERE len(toks) >= n` the oracle queries use)."""
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return (
        df.withColumn("__toks", F.split(text_col, " "))
        .filter(F.size("__toks") >= n)
        .withColumn(out, grams)
        .drop("__toks")
    )
