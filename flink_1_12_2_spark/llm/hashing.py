"""Deterministic cross-engine hashing primitives for the LLM-pipeline operators.

All dedup/similarity operators hash with **md5**, not Spark's xxhash64/hash,
because md5 is bit-identical in every engine (Spark, DuckDB, Python) — which
is what lets the driver's DuckDB oracle replicate minhash/simhash/LSH results
value-for-value. 60 bits of md5 (15 hex chars) fit a signed int64.

At 100 TB scale md5 is ~2× slower than xxhash64 per call, but both are
JVM-side codegen'd expressions; the shuffle, not the hash, dominates these
pipelines. A production deployment could swap ``md5int60`` for xxhash64
without touching any operator logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Mersenne-ish modulus keeping rolling-hash accumulators in 36 bits.
FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1


def md5int60(col: Column) -> Column:
    """First 60 bits of md5 as bigint — identical in Spark and DuckDB
    (``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5int60_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`md5int60` for oracle generation."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded_hash(col: Column, seed: Column | int) -> Column:
    """Seeded 60-bit hash: md5 of ``value || '#' || seed``."""
    s = seed if isinstance(seed, Column) else F.lit(seed)
    return md5int60(F.concat(col, F.lit("#"), s.cast("string")))


def seeded_hash_sql(expr: str, seed_expr: str) -> str:
    return md5int60_sql(f"{expr} || '#' || CAST({seed_expr} AS VARCHAR)")
