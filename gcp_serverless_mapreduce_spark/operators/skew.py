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
