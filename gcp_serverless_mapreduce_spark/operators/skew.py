"""Skew-mitigation operators — salting patterns for hot keys.

Spark's map-side partial aggregation already neutralizes skew for
algebraic aggregates (sum/count/min/max compress before the shuffle), and
AQE splits skewed *join* partitions.  The remaining gap is distinct-style
aggregation on skewed keys: ``countDistinct(v) GROUP BY k`` must co-locate
every distinct v of a hot key on one reducer.  The fix is the standard
two-phase salted plan:

  phase 1: group by (k, salt(v)) — the hot key's values spread over
           ``buckets`` reducers; distinct-count within each bucket
  phase 2: group by k — SUM the bucket counts (buckets partition the
           value space, so distinct counts are additive)

The reference's analog is its fixed FNV(key) % N fan-out
(reducephase/shuffle.go:84-91), which cannot split a hot key; salting is
exactly the missing second dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_equijoin(big: DataFrame, small: DataFrame, key: str,
                    hot_keys, num_salts: int = 8,
                    salt_src: str = None) -> DataFrame:
    """Skew-safe fact-to-dimension equi-join for a non-broadcastable
    ``small`` side with known-hot join keys: the classic two-dimensional
    salting plan.

    Hot rows of ``big`` get ``_salt = hash(salt_src) % num_salts`` (a
    deterministic spread column, e.g. the fact row's id); the matching
    ``small`` rows are replicated once per salt via an exploded
    sequence, so the join key becomes (key, _salt) and a hot key's rows
    land on ``num_salts`` reducers instead of one.  Cold keys pay
    nothing (salt 0, no replication).  The result set is exactly the
    plain join's — salting only re-partitions work — so an oracle can
    check it with ordinary SQL.

    ``hot_keys`` is a literal allowlist (the "known skew" form: stop
    words, null-ish sentinel ids, the celebrity user).  When the hot
    set must be discovered, run a cheap sampled pre-pass and pass its
    result here.  AQE's skew-join split covers sort-merge cases
    adaptively at runtime; the explicit form is for when you need the
    mitigation in the PLAN — deterministic partition bounds, joins AQE
    won't rewrite, or engines without it.
    """
    if salt_src is None:
        raise ValueError("salt_src is required (deterministic spread col)")
    hot_keys = list(hot_keys)
    if not hot_keys:                      # no skew declared: plain join
        return big.join(small, key)
    is_hot = F.col(key).isin(*hot_keys)
    big_s = big.withColumn(
        "_salt",
        F.when(is_hot, F.pmod(F.xxhash64(F.col(salt_src)),
                              F.lit(num_salts)))
        .otherwise(F.lit(0)).cast("int"))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.when(is_hot,
                         F.sequence(F.lit(0), F.lit(num_salts - 1)))
                  .otherwise(F.array(F.lit(0)))))
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def salted_distinct_count(df: DataFrame, key: str, value: str,
                          buckets: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """-> (key, n_distinct): exact COUNT(DISTINCT value) per key, skew-safe.

    Salt = hash(value) % buckets, so each value lands in exactly one
    bucket and per-bucket distinct counts sum to the true distinct count.
    Both phases are ordinary hash aggregations with map-side combine.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(value)), F.lit(buckets)))
    per_bucket = (
        salted.groupBy(key, "_salt")
        .agg(F.countDistinct(value).alias("_n"))
    )
    return (
        per_bucket.groupBy(key)
        .agg(F.sum("_n").cast("long").alias(out_col))
    )
