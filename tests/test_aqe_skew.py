"""AQE skew-join split: the UNSALTED hot-key path the README's scale
table claims (salting covers known-hot keys; AQE covers skew you did
not predict).  hot_key_join_aqe funnels ~30% of event rows onto join
key 0; with skew thresholds scaled down to the fixture's shuffle sizes
(the same ratios a 100 TB run hits with the 256 MB defaults), the final
adaptive plan must carry a skew=true sort-merge join."""

from __future__ import annotations

from contextlib import contextmanager

from gcp_serverless_mapreduce_spark.suite.relational_q import hot_key_join_aqe

SF_DIR = "/root/testdata/sf0.01"

SKEW_CONFS = {
    # fixture shuffle partitions are ~100 KB; the defaults (256 MB
    # threshold / 64 MB advisory) are the same ratios at cluster scale
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8kb",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4kb",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    # the per-key side must stay non-broadcast, as it would be at scale
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _confs(spark, confs: dict):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_hot_key_join(spark):
    # build FIRST: load_table -> apply_runtime_confs would overwrite the
    # scaled-down test confs (AQE reads them at execution, not build)
    df = hot_key_join_aqe(spark, SF_DIR)
    with _confs(spark, SKEW_CONFS):
        rows = df.collect()
        # skew markers only exist in the FINAL adaptive plan (post-action)
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert rows, "query returned no rows"
    assert "skew=true" in plan, plan
