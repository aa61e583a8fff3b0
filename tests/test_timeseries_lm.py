"""Hand-computed goldens for the time-weighted average, M4 downsample,
and bigram-coherence queries, fed through synthetic parquet fixture dirs
shaped like the driver tables (the query functions are sf_dir-bound)."""

from __future__ import annotations

import datetime as dt

from gcp_serverless_mapreduce_spark.suite.temporal_q import (
    m4_downsample_hourly, time_weighted_avg_value)
from gcp_serverless_mapreduce_spark.suite.textstats_q import (
    bigram_coherence_score)


def _events_dir(spark, tmp_path, rows):
    d = str(tmp_path / "fixtures")
    (spark.createDataFrame(
        [(i, ts, uid, et, float(v), "{}") for i, (ts, uid, et, v)
         in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
     .coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet"))
    return d


def _docs_dir(spark, tmp_path, texts):
    d = str(tmp_path / "fixtures")
    (spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
     .coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet"))
    return d


def _t(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_time_weighted_avg_golden(spark, tmp_path):
    # user 1: 10 held for 10s, 20 held for 20s -> (100+400)/30
    # user 2: single event -> no interval, absent from the result
    d = _events_dir(spark, tmp_path, [
        (_t(0), 1, "view", 10), (_t(10), 1, "view", 20),
        (_t(30), 1, "view", 30), (_t(0), 2, "view", 99),
    ])
    out = {r["user_id"]: r for r in time_weighted_avg_value(spark, d).collect()}
    assert set(out) == {1}
    assert out[1]["n_intervals"] == 2
    assert out[1]["time_weighted_avg"] == round((10 * 10 + 20 * 20) / 30, 6)


def test_m4_downsample_golden(spark, tmp_path):
    d = _events_dir(spark, tmp_path, [
        (_t(0), 1, "view", 5), (_t(10), 2, "view", 1),
        (_t(20), 3, "view", 9), (_t(30), 4, "view", 4),
        # second bucket, single point: all four stats collapse to it
        (_t(3600), 1, "view", 7),
        # other series, same hour
        (_t(40), 1, "click", 2),
    ])
    out = {(r["event_type"], r["bucket_start"]): r
           for r in m4_downsample_hourly(spark, d).collect()}
    b0 = out[("view", "2024-01-01 00:00:00")]
    assert (b0["n_points"], b0["v_min"], b0["v_max"]) == (4, 1.0, 9.0)
    assert (b0["v_first"], b0["v_last"]) == (5.0, 4.0)
    b1 = out[("view", "2024-01-01 01:00:00")]
    assert (b1["v_min"], b1["v_max"], b1["v_first"], b1["v_last"]) == (
        7.0, 7.0, 7.0, 7.0)
    assert out[("click", "2024-01-01 00:00:00")]["n_points"] == 1


def test_bigram_coherence_golden(spark, tmp_path):
    # corpus LM: c(a,b)=3 c(b,a)=1 c(b,c)=1; prefixes c(a)=3 c(b)=2
    # doc0 "a b a b": mean(1, 1/2, 1) = 5/6;  doc1 "a b c": mean(1, 1/2)
    # doc2 single token: no bigrams, absent
    d = _docs_dir(spark, tmp_path, ["a b a b", "a b c", "solo"])
    out = {r["doc_id"]: r for r in bigram_coherence_score(spark, d).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["coherence"] == round(5 / 6, 6)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["coherence"] == 0.75
