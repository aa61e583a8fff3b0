"""Physical-plan regression tests — the scale contract, asserted.

These pin the plan properties that matter at 100 TB: predicate pushdown
reaching the parquet scan, dimension joins broadcasting, the anagram
pipeline keeping exactly one shuffle, and exchange reuse in the dedup
self-joins.  A refactor that silently adds a shuffle or drops a pushdown
fails here long before a cluster run would reveal it."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.functions.hashing import fnv32a_py
from gcp_serverless_mapreduce_spark.operators import dedup
from gcp_serverless_mapreduce_spark.operators.anagram import anagram_pipeline
from gcp_serverless_mapreduce_spark.sources.text import write_anagram_sink
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    # count Exchange nodes, excluding ReusedExchange references
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning_reaches_parquet_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    scan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m and m.group(1).split(",")[0].startswith("l_orderkey")
    assert "l_comment" not in m.group(1)


def test_dim_join_broadcasts(spark):
    cust = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    plan = _plan(cust.join(nation, cust.c_nationkey == nation.n_nationkey))
    assert "BroadcastHashJoin" in plan


def test_anagram_pipeline_single_shuffle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(anagram_pipeline(docs, gutenberg=False))
    # per-doc distinct is in-row (array_distinct): the ONLY exchange is the
    # signature groupBy
    assert _exchanges(plan) == 1, plan


def test_jaccard_reuses_shingle_exchange(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = dedup.jaccard_pairs(docs, 0.8)
    df.collect()  # AQE decides reuse at runtime; inspect the FINAL plan
    plan = _plan(df)
    assert plan.count("ReusedExchange") >= 2, plan


def test_fnv32a_matches_reference_golden():
    # shuffle_test.go:138-147: "acer" lands on reducer 1 of 5
    assert fnv32a_py("acer") % 5 == 1


def test_anagram_sink_partitioned_content_union(spark, tmp_path):
    from gcp_serverless_mapreduce_spark.operators.anagram import (
        group_anagrams, map_words, tokenize_documents)

    docs = load_table(spark, SF_DIR, "documents")
    # min_group_size=1: the synthetic vocabulary has no true anagram pairs
    grouped = group_anagrams(map_words(tokenize_documents(docs)),
                             min_group_size=1)
    assert grouped.repartition(5, F.col("sorted_word")) \
        .rdd.getNumPartitions() == 5  # S6: N reducer shards (X2)
    out = str(tmp_path / "anagrams")
    write_anagram_sink(grouped, out, num_partitions=5)
    files = [p for p in __import__("os").listdir(out) if p.startswith("part-")]
    # empty shards write no object; non-empty ones land in distinct files
    assert 1 <= len(files) <= 5
    lines = set()
    for p in files:
        with open(f"{out}/{p}") as fh:
            lines.update(ln.rstrip("\n") for ln in fh if ln.strip())
    expect = {f"{r['sorted_word']}: {' '.join(r['anagrams'])}"
              for r in grouped.collect()}
    assert lines == expect  # content union is the contract (SURVEY §7)
