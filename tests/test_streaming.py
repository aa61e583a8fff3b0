"""Streaming surface: the same transform must produce identical results on
a static frame and through a real readStream -> memory-sink execution."""

from __future__ import annotations

from gcp_serverless_mapreduce_spark.streaming import pipeline
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_matches_batch(spark):
    batch = pipeline.windowed_event_stats(load_table(spark, SF_DIR, "events"))
    streamed = pipeline.run_available_now(
        pipeline.windowed_event_stats(pipeline.stream_events(spark, SF_DIR)),
        "test_stream_matches_batch_sink")
    assert _as_set(streamed) == _as_set(batch)
    assert streamed.columns == ["window_start", "event_type", "n_events",
                                "total_value"]


def test_stream_is_actually_streaming(spark):
    assert pipeline.stream_events(spark, SF_DIR).isStreaming
