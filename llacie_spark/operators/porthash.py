"""Portable 60-bit hash: identical in Spark SQL and DuckDB.

Spark's ``xxhash64`` has no DuckDB equivalent, so operators whose output must
be oracle-verifiable value-for-value (simhash signatures, synthetic media
typing) hash through md5 instead: both engines produce the same lowercase hex
digest, and the first 15 hex chars parse to the same non-negative 60-bit
integer (15 × 4 = 60 bits < 63, so it always fits a signed BIGINT on both
sides — no overflow/sign divergence).

``xxhash64`` remains the default for pure-Spark scale paths (it's cheaper);
this module is the verification-friendly twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 60


def portable_hash60(col: Column | str, salt: str | None = None) -> Column:
    """Spark side: first 60 bits of md5(salt || col) as a non-negative long."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB side: hex-fold of the same md5 prefix (DuckDB has no base-16
    integer parse, so fold digit-by-digit with list_reduce)."""
    inner = f"'{salt}' || ({expr})" if salt is not None else f"({expr})"
    return (
        "list_reduce(list_transform(range(1, 16), i -> "
        f"strpos('0123456789abcdef', substr(md5({inner}), i::int, 1)) - 1), "
        "(a, b) -> a * 16 + b)"
    )
