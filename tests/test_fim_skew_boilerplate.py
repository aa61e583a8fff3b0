"""Unit tests for the round-7 additions: FIM splits, join-key skew
profile, and the boilerplate-prefix profile — invariants plus
independent pure-Python recomputation on the sf0.001 fixture."""

import hashlib

import duckdb
import pyspark.sql.functions as F

from gcp_serverless_mapreduce_spark.suite.curation_q import (
    PREFIX_KS, source_boilerplate_prefix)
from gcp_serverless_mapreduce_spark.suite.layout_q import (
    FIM_MIN_CHARS, fim_split_plan)
from gcp_serverless_mapreduce_spark.suite.profiling_q import (
    SKEW_KEYS, join_key_skew_profile)

SF_DIR = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_fim_segments_partition_the_document(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    rows = fim_split_plan(spark, SF_DIR).collect()
    eligible = {d for d, t in docs.items() if len(t) >= FIM_MIN_CHARS}
    assert {r["doc_id"] for r in rows} == eligible
    for r in rows:
        n = len(docs[r["doc_id"]])
        assert r["prefix_len"] >= 1 and r["middle_len"] >= 1 \
            and r["suffix_len"] >= 1
        assert r["prefix_len"] + r["middle_len"] + r["suffix_len"] == n


def test_fim_fingerprint_matches_pure_python_recompute(spark):
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    rows = fim_split_plan(spark, SF_DIR).orderBy("doc_id").limit(8).collect()
    for r in rows:
        text = docs[r["doc_id"]]
        n = len(text)
        s1 = 1 + _h32(f"f1|{r['doc_id']}") % (n - 2)
        s2 = s1 + 1 + _h32(f"f2|{r['doc_id']}") % (n - s1 - 1)
        psm = f"{text[:s1]}|{text[s2:]}|{text[s1:s2]}"
        assert r["prefix_len"] == s1 and r["middle_len"] == s2 - s1
        assert r["psm_fingerprint"] == hashlib.md5(psm.encode()).hexdigest()


def test_skew_profile_invariants_and_totals(spark):
    rows = {r["key_name"]: r for r in
            join_key_skew_profile(spark, SF_DIR).collect()}
    assert set(rows) == {label for label, _, _ in SKEW_KEYS}
    for r in rows.values():
        assert 1 <= r["p50_cnt"] <= r["p99_cnt"] <= r["max_cnt"]
        assert 0 < r["top_share_bp"] <= 10000
        assert r["n_keys"] <= r["total_rows"]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert rows["lineitem.l_orderkey"]["total_rows"] == li.count()
    assert rows["lineitem.l_orderkey"]["n_keys"] == \
        li.select("l_orderkey").distinct().count()


def test_boilerplate_profile_invariants_and_modal_prefix(spark):
    rows = source_boilerplate_prefix(spark, SF_DIR).collect()
    by_k = {}
    for r in rows:
        assert 0 < r["share_bp"] <= 10000
        assert 1 <= r["cnt"] <= r["n_docs"]
        assert len(r["prefix"].split(" ")) == r["k"]
        by_k.setdefault(r["k"], []).append(r)
    assert set(by_k) == set(PREFIX_KS)
    # Independent modal k=1 prefix via DuckDB over the raw parquet.
    want = dict(duckdb.sql(f"""
        SELECT source, prefix FROM (
            SELECT source, toks[1] AS prefix, count(*) AS cnt,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY count(*) DESC, toks[1])
                       AS rk
            FROM (SELECT source,
                         list_filter(string_split_regex(
                             trim(lower(text)), '\\s+'),
                             x -> length(x) > 0) AS toks
                  FROM '{SF_DIR}/documents.parquet')
            WHERE len(toks) >= 1
            GROUP BY source, toks[1]) WHERE rk = 1""").fetchall())
    got = {r["source"]: r["prefix"] for r in by_k[1]}
    assert got == want


def test_bloom_semijoin_no_false_negatives_and_reduction(spark):
    from gcp_serverless_mapreduce_spark.suite.sketch_q import (
        bloom_semijoin_reduction)
    r = bloom_semijoin_reduction(spark, SF_DIR).collect()[0]
    # no false negatives: every true match passes the filter
    assert r["n_pass_bloom"] >= r["n_true_match"]
    assert r["bloom_fp"] == r["n_pass_bloom"] - r["n_true_match"]
    # the filter actually reduces the probe side (selective predicate)
    assert r["n_pass_bloom"] < 0.2 * r["n_probe_rows"]
    # matched revenue equals the direct semi-join aggregate
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = orders.where(
        (F.year(F.col("o_orderdate").cast("date")) == 1994)
        & (F.col("o_orderpriority") == "1-URGENT")).select("o_orderkey")
    want = (li.join(q, li.l_orderkey == q.o_orderkey, "left_semi")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double")).collect()[0][0])
    assert r["matched_revenue"] == want
    assert r["n_true_match"] == \
        li.join(q, li.l_orderkey == q.o_orderkey, "left_semi").count()


def test_neyman_allocation_favors_big_variable_strata(spark):
    from gcp_serverless_mapreduce_spark.suite.curation_q import (
        NEYMAN_BUDGET, neyman_allocation_sample)
    rows = neyman_allocation_sample(spark, SF_DIR).collect()
    assert sum(r["alloc_n"] for r in rows) <= NEYMAN_BUDGET
    for r in rows:
        assert 0 <= r["n_sampled"] == min(r["alloc_n"], r["n_docs"])
    # allocation is monotone in the Neyman weight N_h * sigma_h
    by_w = sorted(rows, key=lambda r: r["w_q"])
    allocs = [r["alloc_n"] for r in by_w]
    assert allocs == sorted(allocs)
