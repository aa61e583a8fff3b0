"""Fixture-table loaders for the driver-generated parquet star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale notes: each loader is a plain ``spark.read.parquet`` so column pruning
and predicate pushdown reach the scan (check ``PushedFilters`` / ``ReadSchema``
in ``.explain("formatted")``).  At 100 TB the fact tables (lineitem, orders,
events, documents) arrive as many files/partitions; nothing here assumes a
single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events timestamp.

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4
    rejects unless ``spark.sql.legacy.parquet.nanosAsLong=true``; we read the
    raw int64 nanos and convert to a session-TZ-independent timestamp (the
    session TZ is pinned to UTC in session.RUNTIME_CONFS).
    """
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: `/` would go through double and lose precision
        # (ns epochs ~1.7e18 exceed double's 53-bit mantissa).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
