"""Behavioral event-analytics queries over ``events``: conversion funnel,
Markov transition matrix, and weekly retention cohorts — the product-
analytics surface (sequential patterns over per-user ordered event
streams) that the reference's batch MapReduce model cannot express but a
100 TB event store is routinely asked for.

Scale shape shared by all three: ONE shuffle on ``user_id`` (window sort
or groupBy), map-side partial aggregation everywhere else, and final
results that are tiny (single row / 25 transitions / weeks² cohort
cells).  No self-joins on the event table, no driver-side loops.

Float determinism: every cross-row aggregate that feeds an output value
is an exact BIGINT sum (micros, counts); doubles appear only in final
per-row divisions, which are order-independent, so the DuckDB oracle
matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import behavior
from ..registry import register
from ..tables import load_table

#: Funnel stage sequence: a user converts when the stages happen in
#: order — first signup, then a click at-or-after it, then a purchase
#: at-or-after that click.  Order within equal timestamps is pinned by
#: event_id, same as the sessionize queries.
FUNNEL_STAGES = ("signup", "click", "purchase")

#: Cohort epoch: week 0 starts at the fixture's first event day.  An
#: absolute date (not ``min(ts)``) so week numbers are stable when new
#: data arrives — at 100 TB the cohort table is incrementally extended,
#: never recomputed from a shifting epoch.
COHORT_EPOCH = "2024-01-01"

_ORDERED_W = "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING"


@register("funnel_signup_click_purchase", f"""
WITH w1 AS (
    SELECT user_id, event_id, ts, event_type,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END)
               OVER ({_ORDERED_W}) AS t1r
    FROM events),
w2 AS (
    SELECT *, min(CASE WHEN event_type = '{FUNNEL_STAGES[1]}'
                        AND t1r IS NOT NULL THEN ts END)
               OVER ({_ORDERED_W}) AS t2r
    FROM w1),
u AS (
    SELECT user_id,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END) AS t1,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[1]}'
                     AND t1r IS NOT NULL THEN ts END) AS t2,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[2]}'
                     AND t2r IS NOT NULL THEN ts END) AS t3
    FROM w2 GROUP BY user_id)
SELECT CAST(count(t1) AS BIGINT) AS n_{FUNNEL_STAGES[0]},
       CAST(count(t2) AS BIGINT) AS n_{FUNNEL_STAGES[1]}_after,
       CAST(count(t3) AS BIGINT) AS n_{FUNNEL_STAGES[2]}_after,
       round(CAST(sum(CASE WHEN t3 IS NOT NULL
                           THEN epoch_us(t3) - epoch_us(t1) END) AS DOUBLE)
             / NULLIF(count(t3), 0) / 1e6, 6) AS avg_convert_s
FROM u
""")
def funnel_signup_click_purchase(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase, computed in a
    SINGLE window pass per user: a running ``min(stage ts)`` carries each
    completed stage forward, so stage k+1 only counts events at-or-after
    stage k's first completion.  The window sort is the only shuffle; the
    per-user reduction reuses its partitioning and the result is one row.

    Mean time-to-convert is an exact BIGINT micros sum divided once at
    the end — no cross-row double accumulation, so the oracle hash is
    order-independent.
    """
    events = load_table(spark, sf_dir, "events")
    return behavior.funnel_summary(events, FUNNEL_STAGES)


@register("event_transition_matrix", """
WITH t AS (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events),
c AS (
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM t WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type)
SELECT prev_type, next_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / sum(n_transitions) OVER (PARTITION BY prev_type),
             6) AS p_next
FROM c
""")
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    ``lag`` over the user-time window pairs each event with its
    predecessor, one groupBy counts the (prev, next) cells, and the
    row-normalized transition probability is a window over the TINY
    |event_types|² matrix.  One event-table shuffle total.
    """
    events = load_table(spark, sf_dir, "events")
    return behavior.transition_matrix(events)


@register("user_retention_cohorts", f"""
WITH wk AS (
    SELECT user_id,
           CAST(floor(datediff('day', DATE '{COHORT_EPOCH}',
                               CAST(ts AS DATE)) / 7) AS BIGINT) AS week_no
    FROM events),
coh AS (
    SELECT user_id, min(week_no) AS cohort_week FROM wk GROUP BY user_id),
act AS (
    SELECT DISTINCT w.user_id, c.cohort_week,
           w.week_no - c.cohort_week AS week_offset
    FROM wk w JOIN coh c USING (user_id)),
size_ AS (
    SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
    FROM coh GROUP BY cohort_week)
SELECT a.cohort_week, a.week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users,
       round(CAST(count(*) AS DOUBLE) / any_value(s.cohort_size), 6)
           AS retention
FROM act a JOIN size_ s USING (cohort_week)
GROUP BY a.cohort_week, a.week_offset
""")
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week,
    counted per week offset since their cohort.  Week numbers are day
    arithmetic from a FIXED epoch (no engine-specific week-truncation
    semantics, incrementally extendable).  The plan is two shuffles on
    ``user_id`` (first-week agg + activity join — co-partitioned, AQE
    merges them) and one on the tiny ``cohort_week``; cohort sizes join
    broadcast.
    """
    events = load_table(spark, sf_dir, "events")
    return behavior.retention_cohorts(events, COHORT_EPOCH)


# ---- CEP-style sequence pattern matching ----------------------------------

CEP_PATTERN = "c[ve]*p"   # click, any views/errors, purchase


@register("event_pattern_matches", f"""
WITH s AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), ''
                      ORDER BY ts, event_id) AS seq
    FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, '{CEP_PATTERN}')) AS BIGINT)
           AS n_patterns,
       md5(seq) AS seq_md5
FROM s
""")
def event_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern matching, the MATCH_RECOGNIZE
    shape: each user's event history becomes an ordered initial-letter
    string (one char per event, (ts, event_id)-ordered), and the
    click->...->purchase pattern `{CEP_PATTERN}` is counted by the
    regex engine — non-overlapping left-to-right in both engines.  One
    exchange on user_id; the sequence string is gated byte-exact via
    md5, so one out-of-order event anywhere fails the hash.  At 100 TB
    the per-user window would sessionize first (bounded sequence
    length) — the fixture's per-user histories are already bounded."""
    from pyspark.sql import functions as F
    ev = load_table(spark, sf_dir, "events")
    item = F.struct(F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("i"),
                    F.substring("event_type", 1, 1).alias("c"))
    seq = F.concat_ws("", F.transform(
        F.array_sort(F.collect_list(item)), lambda s: s["c"]))
    return (ev.groupBy("user_id").agg(seq.alias("seq"))
            .select("user_id",
                    F.length("seq").cast("long").alias("seq_len"),
                    F.regexp_count("seq", F.lit(CEP_PATTERN)).cast("long")
                     .alias("n_patterns"),
                    F.md5("seq").alias("seq_md5")))


@register("touch_attribution_revenue", f"""
WITH w AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(CASE WHEN event_type IN ('click', 'view')
                           THEN event_type END IGNORE NULLS)
               OVER ({_ORDERED_W}) AS last_t,
           first_value(CASE WHEN event_type IN ('click', 'view')
                            THEN event_type END IGNORE NULLS)
               OVER ({_ORDERED_W}) AS first_t
    FROM events),
p AS (SELECT * FROM w WHERE event_type = 'purchase'),
m AS (
    SELECT 'last' AS model, COALESCE(last_t, '(none)') AS touch_type,
           CAST(round(value * {behavior.REV_U}) AS BIGINT) AS vu
    FROM p
    UNION ALL
    SELECT 'first', COALESCE(first_t, '(none)'),
           CAST(round(value * {behavior.REV_U}) AS BIGINT)
    FROM p)
SELECT model, touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(vu) AS DOUBLE) / {behavior.REV_U}, 6) AS revenue
FROM m GROUP BY model, touch_type
""")
def touch_attribution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch revenue attribution: each purchase's value
    credited to the user's first/last preceding click-or-view, in ONE
    window pass over the user-ordered stream (running first/last with
    ignorenulls) — never the naive purchases-join-touches shape.
    Purchases with no preceding touch credit '(none)', so both models
    reconcile to total revenue; sums are exact BIGINT micro-units.
    See operators/behavior.py:touch_attribution."""
    ev = load_table(spark, sf_dir, "events")
    return behavior.touch_attribution(ev)
