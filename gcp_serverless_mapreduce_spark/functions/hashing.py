"""Hashing expressions: MinHash primitives and the reference's FNV-32a.

Design note (cross-engine determinism): the dedup operators must produce
bit-identical results under both Spark and the DuckDB oracle, so MinHash is
built on ``md5`` — the one high-quality hash both engines share — rather than
Spark-private ``xxhash64``/``hash``.  A MinHash permutation is simulated by
salting: ``min(md5(salt_i || token))`` over a document's tokens; the
lexicographic min of uniformly-distributed hex strings is a valid min-hash.
At 100 TB scale md5-per-shingle stays JVM-side (codegen'd commons-codec), no
Python boundary.

FNV-32a reproduces the reference's shuffle partitioner
(reducephase/shuffle.go:84-91) byte-for-byte.  It exists for parity testing
only — production partitioning is Spark's Murmur3 via ``repartition(N, col)``;
which *file* a key lands in is an execution detail, the content union is the
contract (SURVEY §7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

FNV_OFFSET_32 = 2166136261
FNV_PRIME_32 = 16777619


def fnv32a_py(s: str) -> int:
    """Pure-python FNV-1a 32-bit, identical to Go's hash/fnv New32a
    (shuffle.go:86-88: Write bytes, Sum32)."""
    h = FNV_OFFSET_32
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * FNV_PRIME_32) & 0xFFFFFFFF
    return h


def fnv32a():
    """Vectorized FNV-32a pandas UDF (Arrow-batched; not a hot-path
    operator).  Factory form — decorating at import time requires an active
    SparkSession for return-type parsing."""

    @pandas_udf("long")
    def _fnv32a(words: pd.Series) -> pd.Series:
        return words.map(fnv32a_py).astype("int64")

    return _fnv32a


def md5_long(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit positive integer from md5 (shared with DuckDB:
    both engines agree on md5 hex; 15 hex chars < 2^63).

    DuckDB twin: ``CAST(('0x' || substr(md5(salt || x), 1, 15)) AS BIGINT)``
    is not portable, so oracle SQL compares the *hex strings* instead where
    possible; use this only Spark-side (e.g. bucketing).
    """
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def minhash_expr(tokens: Column, seed: int) -> Column:
    """One MinHash signature component: min over the token set of
    md5(seed || '|' || token), as a hex string.

    DuckDB twin: ``list_min(list_transform(tokens, t -> md5(seed || '|' || t)))``
    — byte-identical because md5 and lexicographic string min agree.
    """
    return F.array_min(
        F.transform(tokens, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t)))
    )
