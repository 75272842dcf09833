"""As-of join (D21) — Spark has no native one; this is the scale path.

Semantics: for each *probe* row, attach the latest *quote* row with the
same key and ``quote.time <= probe.time`` (backward-inclusive, like
DuckDB ASOF JOIN / pandas merge_asof).

Strategy (SURVEY §2.2 D21): tag both sides, union, and run one
``last(..., ignorenulls=True)`` window per attached column over
``partitionBy(key).orderBy(time, side, tiebreak)``. This costs exactly
ONE shuffle+sort of |probe|+|quote| rows — linear at 100 TB — versus
the naive range-join formulation whose intermediate blows up to
|probe| × (matching quotes per key). Ties (equal time): quotes sort
before probes, so a probe at time t sees a quote at time t; among
simultaneous quotes the largest tiebreak wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    on: str,
    time_probe: str,
    time_quote: str,
    attach: dict[str, str],
    tiebreak_quote: str | None = None,
) -> DataFrame:
    """Backward as-of join; returns all probe columns + ``attach`` columns.

    ``attach`` maps output-column-name -> quote column to carry forward.
    ``tiebreak_quote`` (a quote column) makes simultaneous quotes
    deterministic: the row with the greatest tiebreak value wins.
    """
    probe_cols = probe.columns
    tb = F.col(tiebreak_quote) if tiebreak_quote else F.lit(0)

    qt = quote.select(
        F.col(on).alias("__key"),
        F.col(time_quote).alias("__t"),
        tb.cast("long").alias("__tb"),
        *[F.col(src).alias(f"__a_{out}") for out, src in attach.items()],
    ).withColumn("__side", F.lit(0))
    for c in probe_cols:
        qt = qt.withColumn(f"__p_{c}", F.lit(None).cast(probe.schema[c].dataType))

    pb = probe.select(
        F.col(on).alias("__key"),
        F.col(time_probe).alias("__t"),
        F.lit(0).cast("long").alias("__tb"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    ).withColumn("__side", F.lit(1))
    for out in attach:
        pb = pb.withColumn(f"__a_{out}", F.lit(None).cast(qt.schema[f"__a_{out}"].dataType))

    unioned = pb.select(*sorted(pb.columns)).unionByName(qt.select(*sorted(pb.columns)))
    w = (
        W.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out_df = unioned
    for out in attach:
        out_df = out_df.withColumn(f"__a_{out}", F.last(f"__a_{out}", ignorenulls=True).over(w))
    return out_df.filter(F.col("__side") == 1).select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        *[F.col(f"__a_{out}").alias(out) for out in attach],
    )
