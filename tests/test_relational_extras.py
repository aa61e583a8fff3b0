"""Accuracy bounds for sketch aggregates and the salted distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators.skew import salted_distinct_count
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_sketches_within_bounds(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    r = li.agg(
        F.approx_count_distinct("l_partkey").alias("apx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("apx_p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
    ).collect()[0]
    assert abs(r["apx"] - r["exact"]) / r["exact"] < 0.05
    assert abs(r["apx_p50"] - r["p50"]) / r["p50"] < 0.01


def test_approx_stats_parts_deterministic_sketches(spark):
    """The oracle-gated approx_stats_parts (KMV distinct + histogram
    median) must also be ACCURATE: KMV(k=64) within 2.8 sigma (~35%) of
    the exact distinct count, histogram median within one bin width of
    the exact median."""
    from gcp_serverless_mapreduce_spark.suite.relational_q import (
        APPROX_BIN, approx_stats_parts,
    )
    got = {r["l_returnflag"]: r
           for r in approx_stats_parts(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {r["l_returnflag"]: r for r in li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50")).collect()}
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_parts"] - e["nd"]) / e["nd"] < 0.35, (flag, g)
        assert abs(g["approx_p50"] - float(e["p50"])) <= APPROX_BIN, (flag, g)


def test_salted_distinct_count_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    salted = {r["event_type"]: r["n_distinct"] for r in
              salted_distinct_count(ev, "event_type", "user_id",
                                    buckets=7).collect()}
    assert salted == plain


def test_stratified_sample_proportions_and_determinism(spark):
    from gcp_serverless_mapreduce_spark.suite.relational_q import (
        stratified_sample_by_lang,
    )

    base = {r["lang"]: r["n"] for r in
            load_table(spark, SF_DIR, "documents").groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    s1 = stratified_sample_by_lang(spark, SF_DIR).collect()
    s2 = stratified_sample_by_lang(spark, SF_DIR).collect()
    # seeded => identical across runs
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))

    got = {}
    for r in s1:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    # fraction-1.0 strata keep every row; the 0.5 stratum is Bernoulli
    # around half (loose 3-sigma-ish bound for the small fixture)
    for lang, n in base.items():
        if lang == "en":
            assert 0.25 * n <= got[lang] <= 0.75 * n
        else:
            assert got[lang] == n


def test_salted_equijoin_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from gcp_serverless_mapreduce_spark.operators.skew import salted_equijoin

    # 'hot' appears 50x on the fact side (the skewed key), others once
    facts = spark.createDataFrame(
        [(i, "hot" if i < 50 else f"k{i}") for i in range(60)],
        ["row_id", "k"])
    dims = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(50, 60)] + [("unused", 9)],
        ["k", "payload"])
    salted = salted_equijoin(facts, dims, "k", hot_keys=["hot"],
                             num_salts=4, salt_src="row_id")
    plain = facts.join(dims, "k")
    cols = ["k", "row_id", "payload"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == \
        sorted(map(tuple, plain.select(*cols).collect()))
    # hot fact rows really spread across multiple salts pre-join
    spread = (facts.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(4)))
        .filter(F.col("k") == "hot")
        .select("_salt").distinct().count())
    assert spread > 1


def test_salted_equijoin_empty_hot_keys_is_plain_join(spark):
    from gcp_serverless_mapreduce_spark.operators.skew import salted_equijoin
    facts = spark.createDataFrame([(1, "a"), (2, "b")], ["row_id", "k"])
    dims = spark.createDataFrame([("a", 10), ("b", 20)], ["k", "payload"])
    got = sorted(map(tuple, salted_equijoin(
        facts, dims, "k", hot_keys=[], salt_src="row_id")
        .select("k", "row_id", "payload").collect()))
    assert got == [("a", 1, 10), ("b", 2, 20)]


def test_observed_metrics_on_batch_action(spark):
    # df.observe(): accumulator-style metrics collected DURING the action
    # (one pass, no second scan) — the observability hook a production
    # pipeline uses to assert row counts / null rates inline.
    from pyspark.sql import Observation
    import pyspark.sql.functions as F
    obs = Observation("events_metrics")
    df = spark.range(1000).selectExpr("id", "id % 7 AS k")
    out = (df.observe(obs,
                      F.count(F.lit(1)).alias("n_rows"),
                      F.sum("k").alias("sum_k"),
                      F.max("id").alias("max_id"))
           .groupBy("k").count())
    assert out.count() == 7          # the action that fires the metrics
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["sum_k"] == sum(i % 7 for i in range(1000))
    assert got["max_id"] == 999
