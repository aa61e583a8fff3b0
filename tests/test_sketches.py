"""Sketch operators: Count-Min one-sided error + fixed grid; KMV bounds."""

import pyspark.sql.functions as F
import pytest

from gcp_serverless_mapreduce_spark.operators import sketches


@pytest.fixture(scope="module")
def words(spark):
    # Skewed stream: 'alpha' x 400, 'beta' x 50, 20 singletons.
    rows = [("alpha",)] * 400 + [("beta",)] * 50 + [
        (f"tail{i}",) for i in range(20)]
    return spark.createDataFrame(rows, "key string").repartition(8)


def test_cms_is_one_sided_and_bounded(words):
    sketch = sketches.cms_build(words)
    # The sketch never exceeds the fixed cell grid (the 100 TB property).
    assert sketch.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
    total = sketch.where(F.col("row") == 0).agg(
        F.sum("cnt")).collect()[0][0]
    assert total == 470  # every row of the grid sees the full stream

    exact = words.groupBy("key").count()
    est = sketches.cms_estimate(exact.select("key"), sketch)
    joined = {r["key"]: (r["count"], r["cms_est"])
              for r in exact.join(est, "key").collect()}
    for key, (ex, es) in joined.items():
        assert es >= ex, f"CMS must upper-bound: {key}"
        assert es <= ex + 470  # trivially bounded by stream size
    assert joined["alpha"][1] == 400  # heavy key: no collision at this width


def test_kmv_exact_below_k_and_close_above(spark):
    # 40 distinct keys < k=64 -> exact path.
    small = spark.createDataFrame(
        [("g", f"u{i % 40}") for i in range(500)], "grp string, key string")
    row = sketches.kmv_distinct(small, "grp", "key").collect()[0]
    assert row["n_hashes"] == 40 and row["kmv_est"] == 40.0

    # 5000 distinct keys >> k -> estimate within 40% (k=64 -> ~12% stderr).
    big = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(5000)], "grp string, key string")
    row = sketches.kmv_distinct(big, "grp", "key").collect()[0]
    assert row["n_hashes"] == sketches.KMV_K
    assert 3000 <= row["kmv_est"] <= 7000
