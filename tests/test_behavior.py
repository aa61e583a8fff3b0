"""Unit tests for the behavioral-analytics operators (funnel, transition
matrix, retention cohorts) plus the round-5 additions: label centroid
distances, the percentile quality gate, and the stream-static join."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import behavior
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])


def test_funnel_requires_stage_order(spark):
    ev = _events(spark, [
        # user 1: full ordered funnel
        (1, _ts(1), 1, "signup"), (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "purchase"),
        # user 2: click BEFORE signup only -> stage 2 never completes,
        # so the later purchase cannot count either
        (4, _ts(1), 2, "click"), (5, _ts(2), 2, "signup"),
        (6, _ts(3), 2, "purchase"),
        # user 3: out-of-order noise between stages still converts
        (7, _ts(1), 3, "signup"), (8, _ts(2), 3, "purchase"),
        (9, _ts(3), 3, "click"), (10, _ts(5), 3, "purchase"),
        # user 4: never signs up
        (11, _ts(1), 4, "click"), (12, _ts(2), 4, "purchase"),
    ])
    u = {r["user_id"]: r for r in
         behavior.funnel_stage_times(ev, ("signup", "click", "purchase"))
         .collect()}
    assert u[1]["t1"] == _ts(1) and u[1]["t2"] == _ts(2) \
        and u[1]["t3"] == _ts(3)
    assert u[2]["t1"] == _ts(2) and u[2]["t2"] is None and u[2]["t3"] is None
    assert u[3]["t2"] == _ts(3) and u[3]["t3"] == _ts(5)
    assert u[4]["t1"] is None

    s = behavior.funnel_summary(ev, ("signup", "click", "purchase")).first()
    assert s["n_signup"] == 3
    assert s["n_click_after"] == 2
    assert s["n_purchase_after"] == 2
    # conversions: user 1 in 120s, user 3 in 240s
    assert s["avg_convert_s"] == 180.0


def test_funnel_tie_breaks_on_event_id(spark):
    # click shares the signup's timestamp; the higher event_id orders it
    # after, so it counts as at-or-after the signup
    ev = _events(spark, [(1, _ts(1), 1, "signup"), (2, _ts(1), 1, "click")])
    u = behavior.funnel_stage_times(ev, ("signup", "click")).first()
    assert u["t2"] == _ts(1)
    # reversed ids -> the click precedes the signup and must not count
    ev2 = _events(spark, [(2, _ts(1), 1, "signup"), (1, _ts(1), 1, "click")])
    u2 = behavior.funnel_stage_times(ev2, ("signup", "click")).first()
    assert u2["t2"] is None


def test_transition_matrix_rows_and_shares(spark):
    ev = _events(spark, [
        (1, _ts(1), 1, "a"), (2, _ts(2), 1, "b"), (3, _ts(3), 1, "a"),
        (4, _ts(4), 1, "b"), (5, _ts(1), 2, "a"), (6, _ts(2), 2, "a"),
    ])
    rows = {(r["prev_type"], r["next_type"]): r
            for r in behavior.transition_matrix(ev).collect()}
    assert rows[("a", "b")]["n_transitions"] == 2
    assert rows[("b", "a")]["n_transitions"] == 1
    assert rows[("a", "a")]["n_transitions"] == 1
    # row-stochastic: per-prev shares sum to 1
    assert rows[("a", "b")]["p_next"] + rows[("a", "a")]["p_next"] == 1.0
    assert rows[("b", "a")]["p_next"] == 1.0


def test_retention_cohorts_offsets(spark):
    day = dt.timedelta(days=1)
    base = dt.datetime(2024, 1, 1)
    ev = _events(spark, [
        # users 1,2 start week 0; user 1 returns week 1 and 3
        (1, base, 1, "x"), (2, base + 11 * day, 1, "x"),
        (3, base + 22 * day, 1, "x"), (4, base + 2 * day, 2, "x"),
        # user 3 starts week 2
        (5, base + 15 * day, 3, "x"),
    ])
    out = {(r["cohort_week"], r["week_offset"]): r
           for r in behavior.retention_cohorts(ev, "2024-01-01").collect()}
    assert out[(0, 0)]["n_active_users"] == 2
    assert out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active_users"] == 1
    assert out[(0, 1)]["retention"] == 0.5
    assert out[(0, 3)]["n_active_users"] == 1
    assert out[(2, 0)]["n_active_users"] == 1
    assert set(out) == {(0, 0), (0, 1), (0, 3), (2, 0)}


def test_label_centroid_distances_match_numpy(spark):
    import numpy as np

    from gcp_serverless_mapreduce_spark.suite.similarity_q import (
        CENTROID_SCALE, label_centroid_distances)

    emb = load_table(spark, SF_DIR, "embeddings").collect()
    sums, counts = {}, {}
    for r in emb:
        v = np.round(np.array(r["embedding"], dtype=np.float64)
                     * CENTROID_SCALE)
        sums[r["label"]] = sums.get(r["label"], 0) + v
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    cents = {lb: sums[lb] / (counts[lb] * CENTROID_SCALE) for lb in sums}
    got = {(r["label_a"], r["label_b"]): r["l2_dist"]
           for r in label_centroid_distances(spark, SF_DIR).collect()}
    assert len(got) == len(cents) * (len(cents) - 1) // 2
    for (a, b), d in got.items():
        want = float(np.sqrt(np.sum((cents[a] - cents[b]) ** 2)))
        assert abs(d - round(want, 6)) < 1e-9


def test_quality_percentile_filter_keeps_top_half(spark):
    from gcp_serverless_mapreduce_spark.suite.curation_q import (
        quality_percentile_filter)

    n_by_lang = {r["lang"]: r["n"] for r in
                 load_table(spark, SF_DIR, "documents")
                 .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r for r in
            quality_percentile_filter(spark, SF_DIR).collect()}
    assert set(kept) == set(n_by_lang)
    for lang, n in n_by_lang.items():
        # percent_rank >= 0.5 over a fully tie-broken order keeps
        # exactly n - ceil((n-1)/2) rows
        assert kept[lang]["n_kept"] == n - math.ceil((n - 1) / 2)
        assert 0.0 <= kept[lang]["threshold_score"] <= 1.0


def test_stream_static_enrich_matches_batch_join(spark):
    from gcp_serverless_mapreduce_spark.suite.streaming_q import (
        stream_static_enrich)

    got = {(r["mktsegment"], r["event_type"]): (r["n_events"], r["n_users"],
                                                r["total_value"])
           for r in stream_static_enrich(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer")
    want = {(r["c_mktsegment"], r["event_type"]):
            (r["n"], r["nu"], r["tv"]) for r in
            (ev.join(cust, ev.user_id == cust.c_custkey)
             .groupBy("c_mktsegment", "event_type")
             .agg(F.count("*").alias("n"),
                  F.countDistinct("user_id").alias("nu"),
                  F.sum(F.col("value").cast("decimal(14,2)"))
                  .cast("double").alias("tv"))).collect()}
    assert got == want


def test_touch_attribution_models(spark):
    from gcp_serverless_mapreduce_spark.operators import behavior

    rows = [
        # user 1: view -> click -> purchase(10) ; click is last, view first
        (1, 1, "2024-01-01 10:00:00", "view", 0.0),
        (2, 1, "2024-01-01 10:01:00", "click", 0.0),
        (3, 1, "2024-01-01 10:02:00", "purchase", 10.0),
        # user 2: purchase with NO preceding touch -> (none)
        (4, 2, "2024-01-01 09:00:00", "purchase", 5.0),
        # user 2: later view then purchase(2.5)
        (5, 2, "2024-01-01 09:30:00", "view", 0.0),
        (6, 2, "2024-01-01 09:45:00", "purchase", 2.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string,"
              " value double").withColumn("ts", F.to_timestamp("ts"))
    got = {(r["model"], r["touch_type"]): (r["n_purchases"], r["revenue"])
           for r in behavior.touch_attribution(ev).collect()}
    assert got[("last", "click")] == (1, 10.0)
    assert got[("first", "view")] == (2, 12.5)
    assert got[("last", "view")] == (1, 2.5)
    assert got[("last", "(none)")] == (1, 5.0)
    assert got[("first", "(none)")] == (1, 5.0)
    # both models reconcile to total purchase revenue
    for model in ("first", "last"):
        assert sum(v for (m, _t), (_n, v) in got.items()
                   if m == model) == 17.5
