"""Temporal-join queries over ``events`` — as-of and range joins, gated
against DuckDB's *native* ASOF JOIN / inequality join (strongest possible
oracle: a different algorithm computing the same relation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import temporal
from ..registry import register
from ..tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register("asof_click_before_purchase", f"""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, MAX(value) AS click_value FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{_FMT_DUCK}') AS purchase_at,
       c.click_value,
       strftime(c.ts, '{_FMT_DUCK}') AS clicked_at
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase + the user's most recent click at or
    before it.  Union + window plan (operators/temporal.py): one shuffle
    on user_id, no range explosion; DuckDB verifies with native ASOF."""
    events = load_table(spark, sf_dir, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("value").alias("click_value")))
    joined = temporal.asof_join(purchases, clicks, on="user_id")
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", _FMT).alias("purchase_at"),
        F.col("click_value_asof").alias("click_value"),
        F.date_format("ts_asof", _FMT).alias("clicked_at"),
    )


@register("clicks_within_1h_of_error", """
SELECT e.event_id, e.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CAST(c.value AS DECIMAL(14,2))) AS DOUBLE) AS click_value_sum
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error' AND c.event_type = 'click'
GROUP BY e.event_id, e.user_id
""")
def clicks_within_1h_of_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks in [error.ts, error.ts + 1 h] per user, as a
    bin-bucketed equi-join (operators/temporal.py) — sparse shuffle on
    (user, time-bin), never a nested-loop theta join; DuckDB verifies
    with its native inequality join."""
    events = load_table(spark, sf_dir, "events")
    errors = (events.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "value"))
    joined = temporal.range_join_binned(
        errors, clicks, on="user_id", lo_s=0, hi_s=3600)
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_clicks"),
             F.sum(F.col("value").cast("decimal(14,2)"))
             .cast("double").alias("click_value_sum"))
    )
