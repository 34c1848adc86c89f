"""Deterministic 60-bit string hashing available identically in Spark and
DuckDB — the foundation for MinHash/fingerprints whose oracles must
value-hash-match across engines.

Spark:  conv(substr(md5(s), 1, 15), 16, 10) cast to long
DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

15 hex chars = 60 bits, always positive, no int64 overflow anywhere.
(xxhash64 would be faster JVM-side but has no DuckDB twin; md5 is the
portable choice and is still evaluated in whole-stage codegen.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits


def hash64(col: Column | str) -> Column:
    """Spark-side portable 60-bit hash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`hash64`."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_CHARS}) AS BIGINT)"
