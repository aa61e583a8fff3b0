"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the per-query shuffle entirely — the 100 TB answer to
"orders ⋈ lineitem shuffles 6 TB every night"."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (load_table(spark, SF_DIR, name)
         .write.mode("overwrite")
         .bucketBy(8, key).sortBy(key)
         .option("path", str(tmp_path / f"b_{name}"))
         .saveAsTable(f"b_{name}"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    bo, bl = bucketed_tables
    # force the co-located (sort-merge) path: at fixture scale the dims
    # would broadcast, which hides exactly the shuffle bucketing removes
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run_bucketed_join_assertions(spark, bo, bl)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _run_bucketed_join_assertions(spark, bo, bl):
    joined = (spark.table(bo).join(
        spark.table(bl),
        F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SortMergeJoin|ShuffledHashJoin", plan)
    assert m, plan  # co-located join, not broadcast: buckets line up
    # the join's inputs are printed BELOW the join node: no Exchange may
    # feed it — the bucket layout satisfies the join distribution (the
    # only exchange allowed is the post-join aggregate above)
    join_subtree = plan[m.start():]
    assert "Exchange hashpartitioning" not in join_subtree, plan
    assert "SelectedBucketsCount: 8 out of 8" in join_subtree, plan

    # and the result is still correct
    got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    expect = {r["o_orderstatus"]: r["n"] for r in (
        load_table(spark, SF_DIR, "orders").join(
            load_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect())}
    assert got == expect
