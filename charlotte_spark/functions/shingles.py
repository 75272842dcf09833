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


def explode_shingles(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    out: str = "gram",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One output row per (kept-cols, n-gram) — via explode of the
    POSITION sequence, not of the shingle array.

    Perf note (measured at sf0.1, 250k grams): Spark's Generate operator
    re-evaluates its generator expression per OUTPUT row, and Catalyst
    inlines the shingle-building `transform(...)` into the Generate —
    so exploding the O(g)-cost shingle array is O(g²) work per document
    (~6 s). Exploding `sequence(1, n_positions)` instead and building
    each gram AFTER the explode is O(g) (~0.3 s, 20×). Use this for any
    per-gram row stream; use :func:`with_shingles` when the gram ARRAY
    itself is the operand (set intersections, minhash folds)."""
    toks = F.col("__toks")
    d = df.withColumn("__toks", F.split(text_col, " ")).filter(F.size("__toks") >= n)
    pos = d.select(
        *keep,
        "__toks",
        F.explode(F.sequence(F.lit(1), F.size("__toks") - (n - 1))).alias("__i"),
    )
    gram = F.concat_ws(
        " ", *[F.element_at(toks, F.col("__i") + k) for k in range(n)]
    )
    return pos.select(*keep, gram.alias(out))
