"""r15 batch 7 pins: sorted-neighborhood spread + explicit block-exchange
width, and the one-call bloom bitmap literal."""
from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import linkage, sketches
from gcp_serverless_mapreduce_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sorted_neighborhood_block_exchange_has_explicit_width(spark):
    docs = load_table(spark, SF, "documents")
    out = linkage.sorted_neighborhood_pairs(docs)
    n = max(spark.sparkContext.defaultParallelism,
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # the CPU-bound window/jaccard stage reads an explicit-width blk
    # exchange (opted out of AQE byte-based coalescing), and the scan is
    # spread before the tokenize/key build
    assert re.search(rf"hashpartitioning\(blk#\d+, {n}\)", plan), plan
    assert "RoundRobinPartitioning" in plan, plan


def test_bloom_hit_expr_sql_literal_matches_lit_construction(spark):
    # The parsed-SQL bitmap literal must probe bit-identically to the
    # old per-element F.lit construction on every fixture gram.
    from gcp_serverless_mapreduce_spark.operators import curation

    docs = load_table(spark, SF, "documents")
    grams = (curation.word_ngrams(
        docs.filter(F.col("doc_id") % 7 == 0), 3)
        .select("gram").distinct())
    bitmap = sketches.bloom_bitmap(
        sketches.bloom_build(grams, key_col="gram"))

    probe = (curation.word_ngrams(docs, 3)
             .select("gram").distinct().limit(2000))

    def old_expr(key):
        lit_map = F.lit(bitmap).cast("array<bigint>")
        checks = []
        for s in range(sketches.BLOOM_K):
            p = sketches.bloom_pos(key, s)
            word = F.element_at(lit_map, (p / 64).cast("int") + 1)
            bit = F.call_function("shiftright", word, (p % 64).cast("int"))
            checks.append(bit.bitwiseAND(F.lit(1)) == 1)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out

    both = probe.select(
        "gram",
        sketches.bloom_hit_expr(F.col("gram"), bitmap).alias("new"),
        old_expr(F.col("gram")).alias("old")).collect()
    assert both and all(r["new"] == r["old"] for r in both)
