"""Source-format queries: JSON-lines and CSV ingestion, oracle-gated.

Each query writes the typed events table through the text format into a
scratch directory, reads it back schema-explicit, and reduces every
column of every row into an order-free content fingerprint (sum of
md5-prefix row hashes per event_type).  The oracle computes the same
fingerprint from the PARQUET fixture — so the hash matches only if the
text roundtrip preserved every value bit-for-bit, including microsecond
timestamps (Spark's default millisecond timestampFormat silently fails
this gate) and the embedded-JSON ``props`` strings under CSV quoting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.formats import write_then_read
from ..tables import load_table

_FINGERPRINT_SQL = """
WITH h AS (
    SELECT event_type,
           CAST(('0x' || substr(md5(concat_ws('|', event_id,
                epoch_us(ts), user_id, event_type,
                CAST(round(value * 100) AS BIGINT), props)), 1, 15))
               AS BIGINT) AS h
    FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       -- DECIMAL accumulation: row hashes are up to 2^60, so a BIGINT
       -- sum overflows past ~8 rows' worth of headroom; DECIMAL(38,0)
       -- is exact to ~10^24 rows on both engines.  The OUTPUT is a
       -- STRING: raw DECIMAL(38,0) columns were round 3's only red
       -- rows — the driver's value-hash canonicalizes ~2^70-magnitude
       -- decimals differently per engine (a float-coercing fetch path
       -- loses different low bits), while digit strings hash stably.
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS content_sum
FROM h GROUP BY event_type
"""


_SCRATCH_ROOT = "/tmp/spark_graft_scratch"
_SCRATCH_TTL_S = 6 * 3600


def _scratch(spark: SparkSession, *parts: str) -> str:
    """Per-session scratch directory: the Spark applicationId component
    keeps two concurrent runs (e.g. the driver's correctness sweep and a
    local bench) from overwriting each other's roundtrip files while the
    other is mid-read.  Unique dirs would otherwise accumulate one
    events-table copy per session, so stale app dirs (untouched for
    _SCRATCH_TTL_S — far beyond any run's lifetime, so never a live
    concurrent session's) are pruned on entry."""
    import shutil
    import time

    app_id = spark.sparkContext.applicationId
    try:
        cutoff = time.time() - _SCRATCH_TTL_S
        for name in os.listdir(_SCRATCH_ROOT):
            p = os.path.join(_SCRATCH_ROOT, name)
            if name != app_id and os.path.isdir(p) \
                    and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    try:
        # Writes land in nested fmt/sf subdirs and would not refresh the
        # app dir's own mtime — touch it so a session alive past the TTL
        # can't have its scratch pruned mid-read by a new session.
        os.utime(os.path.join(_SCRATCH_ROOT, app_id))
    except OSError:
        pass
    return os.path.join(_SCRATCH_ROOT, app_id, *parts)


def _fingerprint(df: DataFrame) -> DataFrame:
    # unix_micros/epoch_us on both engines: an integer comparison with
    # zero formatting surface (the old date_format/strftime pair worked
    # but pinned two format mini-languages to each other).
    row = F.concat_ws(
        "|", F.col("event_id"), F.unix_micros("ts"),
        F.col("user_id"), F.col("event_type"),
        F.round(F.col("value") * 100).cast("long"), F.col("props"))
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (df.withColumn("_h", h)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("_h").cast("decimal(38,0)"))
                 .cast("string").alias("content_sum")))


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    scratch = _scratch(spark, fmt,
                       os.path.basename(os.path.normpath(sf_dir)))
    return _fingerprint(write_then_read(events, fmt, scratch))


@register("events_json_roundtrip_fingerprint", _FINGERPRINT_SQL)
def events_json_roundtrip_fingerprint(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """JSON-lines source: events written to and re-read from JSON with an
    explicit schema + microsecond timestampFormat; the per-type content
    fingerprint must equal the parquet fixture's."""
    return _roundtrip(spark, sf_dir, "json")


@register("events_csv_roundtrip_fingerprint", _FINGERPRINT_SQL)
def events_csv_roundtrip_fingerprint(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """CSV source: same lossless-roundtrip gate as the JSON variant, plus
    header handling and quoting of the embedded-JSON props column."""
    return _roundtrip(spark, sf_dir, "csv")


@register("events_orc_roundtrip_fingerprint", _FINGERPRINT_SQL)
def events_orc_roundtrip_fingerprint(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """ORC source: the second columnar format next to parquet, same
    content-fingerprint gate (types carry natively — this pins the
    reader/writer pair rather than text-format options)."""
    return _roundtrip(spark, sf_dir, "orc")


@register("events_json_corrupt_routing", f"""
SELECT 'good' AS status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events
UNION ALL
SELECT 'corrupt', {{n}}, NULL
""".format(n=__import__("gcp_serverless_mapreduce_spark.sources.formats",
                        fromlist=["N_CORRUPT"]).N_CORRUPT))
def events_json_corrupt_routing(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode corrupt-record routing: the events JSON landing
    zone with deterministic malformed lines injected; bad lines land in
    ``_corrupt_record`` (counted), good rows survive bit-exact (gated by
    the event_id checksum).  FAILFAST would kill the job on one bad
    upstream file; DROPMALFORMED would silently lose rows — PERMISSIVE
    is the auditable quarantine a 100 TB ingestion needs."""
    from ..sources.formats import write_with_corruption_then_read

    events = load_table(spark, sf_dir, "events")
    scratch = _scratch(spark, "json_corrupt",
                       os.path.basename(os.path.normpath(sf_dir)))
    back = write_with_corruption_then_read(events, scratch)
    good = F.col("_corrupt_record").isNull()
    return (back.withColumn("status",
                            F.when(good, F.lit("good"))
                            .otherwise(F.lit("corrupt")))
            .groupBy("status")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.when(good, F.col("event_id"))).alias("sum_event_id")))


@register("pyds_click_user_stats", """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_click
FROM events WHERE event_type = 'click'
GROUP BY user_id
""")
def pyds_click_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE (Spark 4 `pyspark.sql.datasource`) read
    path: events served by a pluggable Arrow-batch connector with real
    split planning (8 InputPartitions over disjoint batch subsets) and
    `EqualTo(event_type)` filter PUSHDOWN absorbed inside the source —
    rows are filtered per Arrow batch before they ever reach Spark.
    The oracle reads the same parquet directly, so the gate covers the
    whole connector contract: splits, pushdown, Arrow transfer, and the
    epoch-micros timestamp wire encoding.  See sources/pyds.py."""
    from ..sources import pyds
    pyds.register(spark)
    ev = (spark.read.format("events_pyds")
          .option("path", f"{sf_dir}/events.parquet")
          .load()
          .withColumn("ts", F.timestamp_micros(F.col("ts_us"))))
    return (ev.where(F.col("event_type") == "click")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_clicks"),
                 F.sum(F.col("value").cast("decimal(14,2)")).cast("double")
                  .alias("total_value"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
                  .alias("first_click")))


@register("events_parquet_schema_evolution", """
WITH h AS (
    SELECT event_type,
           CAST(('0x' || substr(md5(concat_ws('|', event_id,
                epoch_us(ts), user_id, event_type,
                CAST(round(value * 100) AS BIGINT),
                CASE WHEN event_id % 2 = 1 THEN COALESCE(props, '-')
                     ELSE '-' END,
                CASE WHEN event_id % 2 = 1 THEN 2 ELSE 1 END)), 1, 15))
               AS BIGINT) AS h
    FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS content_sum
FROM h GROUP BY event_type
""")
def events_parquet_schema_evolution(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches: even-id events are
    written with the ORIGINAL schema (no props), odd-id events with an
    EVOLVED one (props kept, a new schema_v column added) — the
    landing-zone reality where yesterday's files lack today's columns.
    A single mergeSchema read reconciles both batches; rows from the
    old batch surface NULL for the added columns, folded to sentinels
    inside the same content fingerprint the other format roundtrips
    use.  At 100 TB this is exactly how a corpus absorbs new metadata
    without rewriting history: merge on read, NULL-fill, never a
    backfill job."""
    events = load_table(spark, sf_dir, "events")
    scratch = _scratch(spark, "evolve",
                       os.path.basename(os.path.normpath(sf_dir)))
    v1 = events.where(F.col("event_id") % 2 == 0).drop("props")
    v2 = (events.where(F.col("event_id") % 2 == 1)
          .withColumn("schema_v", F.lit(2)))
    v1.write.mode("overwrite").parquet(os.path.join(scratch, "v1"))
    v2.write.mode("overwrite").parquet(os.path.join(scratch, "v2"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(os.path.join(scratch, "v1"),
                       os.path.join(scratch, "v2")))
    # props sentinel mirrors the oracle's CASE exactly: old-schema rows
    # (even ids, schema_v NULL after mergeSchema) fold to '-'
    # unconditionally; new-schema rows keep props with NULL coalesced to
    # the same sentinel — so a future NULL-props fixture row hashes
    # identically on both engines (concat_ws would otherwise silently
    # drop a NULL on the oracle side only).
    row = F.concat_ws(
        "|", F.col("event_id"), F.unix_micros("ts"),
        F.col("user_id"), F.col("event_type"),
        F.round(F.col("value") * 100).cast("long"),
        F.when(F.col("event_id") % 2 == 1,
               F.coalesce(F.col("props"), F.lit("-")))
        .otherwise(F.lit("-")),
        F.coalesce(F.col("schema_v"), F.lit(1)))
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (merged.withColumn("_h", h)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("_h").cast("decimal(38,0)"))
                 .cast("string").alias("content_sum")))
