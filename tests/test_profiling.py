"""Profiling/maintenance operators: histogram-quantile accuracy bound,
z-score spike detection, IVM merge == full recompute."""

import pyspark.sql.functions as F

from gcp_serverless_mapreduce_spark.operators import profiling


def test_histogram_quantiles_within_bin_width(spark):
    # Uniform 0..999 -> true p50=500, p90=900; estimate within one bin.
    df = spark.createDataFrame([("g", float(i)) for i in range(1000)],
                               "grp string, v double")
    got = {r.q: r.est for r in profiling.histogram_quantiles(
        df, "grp", "v", bin_width=10.0, qs=(0.5, 0.9)).collect()}
    assert abs(got[0.5] - 500.0) <= 10.0
    assert abs(got[0.9] - 900.0) <= 10.0


def test_trailing_zscore_flags_spike(spark):
    # Flat series of 10s with one 100 at bucket 30 -> flagged; the flat
    # rows have sd=0 -> NULL z, never flagged.
    rows = [("s", b, 100 if b == 30 else 10) for b in range(40)]
    df = spark.createDataFrame(rows, "series string, bucket int, n long")
    out = profiling.trailing_zscore(df, "series", "bucket", "n",
                                    trail=5, z_flag=2.0)
    by_bucket = {r.bucket: r for r in out.collect()}
    # Constant baseline -> sd=0 -> no finite z, but the spike IS flagged.
    assert by_bucket[30].is_anomaly and by_bucket[30].z is None
    assert not by_bucket[29].is_anomaly and by_bucket[29].z is None
    assert by_bucket[2].z is None  # partial trailing window
    # Buckets 31-35 have the spike in their window -> sd>0, z defined;
    # their own value (10) sits below the inflated mean, not flagged.
    assert by_bucket[33].z is not None and not by_bucket[33].is_anomaly


def test_merge_agg_delta_equals_recompute(spark):
    rows = [(k, v) for k in range(20) for v in range(k + 1)]
    df = spark.createDataFrame(rows, "k int, v long")
    full = df.groupBy("k").agg(F.count("*").alias("n"),
                               F.sum("v").alias("s"))

    def agg(part):
        return part.groupBy("k").agg(F.count("*").alias("n"),
                                     F.sum("v").alias("s"))

    merged = profiling.merge_agg_delta(
        agg(df.where("v < 3")), agg(df.where("v >= 3")), ["k"], ["n", "s"])
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))
