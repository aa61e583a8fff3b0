"""Data-layout operators: multi-dimensional clustering keys for scan
pruning at scale.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is decided by LAYOUT: parquet row-group min/max statistics only
prune when rows with similar key values are physically adjacent.  A sort
on one column clusters that column perfectly and scatters every other;
a Z-order (Morton) key interleaves the bits of several columns so that
writing sorted-by-zkey clusters ALL of them approximately — each file /
row group then covers a narrow value range in every interleaved
dimension, and predicates on ANY of them prune files.  This is the
clustering scheme behind Delta/Iceberg ``ZORDER BY``; here it is a plain
column expression (pure integer bit arithmetic, whole-stage codegen, no
shuffle) so any writer can ``repartitionByRange(zkey).sortWithinPartitions``
into clustered files.

No counterpart in the reference (its only layout decision is the static
FNV-partitioned output of shuffle.go:84-91); this is the lakehouse
generalization of that idea.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 16 bits per dimension -> 32-bit z-key: enough for file-level clustering
# (the key orders FILES, not rows — 2^32 distinct keys is far beyond the
# file count of any table) while keeping the expression a short, exact
# integer fold on both engines.
ZBITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns.

    Bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1.  The
    fold is unrolled at plan-build time into one flat sum of 2*bits
    shift/mask terms (shift amounts are plan constants), so the whole
    key is a single whole-stage-codegen integer expression; no UDF, no
    shuffle.  Inputs are masked to ``bits`` bits so oversized values
    wrap instead of colliding the interleave positions.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (key
               + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
               + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)),
                             2 * i + 1))
    return key.cast("long")


def zorder_key_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The DuckDB twin of :func:`zorder_key` (same fold, same masking) —
    kept next to the Spark expression so the two cannot drift apart."""
    mask = (1 << bits) - 1
    return (
        f"list_sum(list_transform(generate_series(0, {bits - 1}), i -> "
        f"(((({x} & {mask}) >> i) & 1) << (2 * i)) "
        f"+ (((({y} & {mask}) >> i) & 1) << (2 * i + 1))))"
    )
