"""Network-domain column expressions (charlotte's domain, SURVEY D52).

charlotte pushes ``inet_aton(%s)`` into MySQL for the iphdr fact table
(/root/reference/charlotte/__init__.py:488). Here it's a pure Spark
column expression — split + shifts — so it stays inside whole-stage
codegen (no UDF, no Python boundary) and is portable to DuckDB SQL as
split_part arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_str_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 string -> unsigned 32-bit value in a long."""
    part = lambda i: F.split(ip, r"\.").getItem(i).cast("long")  # noqa: E731
    return part(0) * 16777216 + part(1) * 65536 + part(2) * 256 + part(3)


def long_to_ip_str(v: Column) -> Column:
    """Inverse of :func:`ip_str_to_long` (inet_ntoa analog)."""
    return F.concat_ws(
        ".",
        ((v / 16777216).cast("long") % 256).cast("string"),
        ((v / 65536).cast("long") % 256).cast("string"),
        ((v / 256).cast("long") % 256).cast("string"),
        (v % 256).cast("string"),
    )
