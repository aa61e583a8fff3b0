"""Data-layout queries: Z-order clustering keys, oracle-gated.

The SQL twin of ``operators/layout.py`` is generated from the SAME
function (``zorder_key_sql``) that documents the Spark fold, so the two
interleave expressions cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import layout
from ..registry import register
from ..tables import load_table

# Day number relative to the fixture's order-date epoch; fits 12 bits
# (the dates span ~2400 days), custkey fits 11 — both inside the 16-bit
# interleave budget.
DATE_EPOCH = "1995-01-01"
# Coarse bucket = top bits of the 32-bit z-key: orders of magnitude more
# buckets than files at any scale, few enough that per-bucket min/max
# stats stay a small result.
BUCKET_SHIFT = 18

_ZKEY_SQL = layout.zorder_key_sql(
    "o_custkey", f"datediff('day', DATE '{DATE_EPOCH}', CAST(o_orderdate AS DATE))")


@register("zorder_layout_keys", f"""
WITH z AS (
    SELECT o_custkey,
           datediff('day', DATE '{DATE_EPOCH}', CAST(o_orderdate AS DATE)) AS day_no,
           {_ZKEY_SQL} AS zkey
    FROM orders)
SELECT CAST(zkey >> {BUCKET_SHIFT} AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(o_custkey) AS BIGINT) AS max_custkey,
       CAST(MIN(day_no) AS BIGINT) AS min_day,
       CAST(MAX(day_no) AS BIGINT) AS max_day
FROM z GROUP BY zbucket
""")
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over orders on (custkey, order
    day), summarized per coarse z-bucket with each bucket's min/max in
    BOTH dimensions — the row-group statistics a zkey-sorted writer
    would produce, i.e. the pruning ranges a predicate on EITHER column
    could skip by.  The key itself is a pure codegen integer fold (no
    UDF, no shuffle); the only exchange is the small bucket aggregate.

    A 100 TB writer uses this as
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` before the
    sink; the query gates the key computation and its locality effect.
    """
    orders = load_table(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate").cast("date"),
                        F.lit(DATE_EPOCH).cast("date"))
    z = orders.select(
        "o_custkey", day_no.alias("day_no"),
        layout.zorder_key(F.col("o_custkey"), day_no).alias("zkey"))
    return (z.groupBy(F.shiftright("zkey", BUCKET_SHIFT).cast("long")
                      .alias("zbucket"))
            .agg(F.count("*").alias("n_orders"),
                 F.min("o_custkey").alias("min_custkey"),
                 F.max("o_custkey").alias("max_custkey"),
                 F.min("day_no").cast("long").alias("min_day"),
                 F.max("day_no").cast("long").alias("max_day")))
