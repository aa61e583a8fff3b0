"""applyInPandasWithState operator: streaming grouped state must agree
with the batch aggregate after one availableNow pass."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.streaming import pipeline, stateful
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark):
    stream = stateful.running_user_totals(
        pipeline.stream_events(spark, SF_DIR))
    q = (stream.writeStream.format("memory")
         .queryName("stateful_totals_sink")
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table("stateful_totals_sink").collect()}
    q.stop()

    batch = {r["user_id"]: (r["n"], r["v"]) for r in
             load_table(spark, SF_DIR, "events")
             .groupBy("user_id")
             .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
             .collect()}
    assert got.keys() == batch.keys()
    for uid, (n, v) in batch.items():
        assert got[uid][0] == n
        assert math.isclose(got[uid][1], v, rel_tol=1e-9)


def test_transform_with_state_totals_or_env_skip(spark):
    """transformWithStateInPandas port of the running totals: equal to the
    batch aggregate where the runtime supports it; skipped (not silently
    passed) where the TWS worker's protobuf dependency is unusable."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unusable: TWS worker cannot start")

    from pyspark.sql import functions as F

    from gcp_serverless_mapreduce_spark.streaming import pipeline, stateful
    from gcp_serverless_mapreduce_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = pipeline.stream_events(spark, sf)
    updates = pipeline.run_available_now(
        stateful.running_user_totals_tws(ev), "tws_test_sink", mode="update")
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in
           (updates.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max_by("total_value", "n_events").alias("total_value"))
            .collect())}
    expect = {r["user_id"]: (r["n"], float(r["tv"])) for r in
              (load_table(spark, sf, "events").groupBy("user_id")
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("value").cast("decimal(14,2)"))
                    .cast("double").alias("tv")).collect())}
    assert got == expect
