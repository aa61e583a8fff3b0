"""Sorted-neighborhood and record-linkage operators: pair-space bounds
and agreement semantics on hand-built frames."""

import pyspark.sql.functions as F

from gcp_serverless_mapreduce_spark.operators import linkage


def test_sorted_neighborhood_bounds_and_finds_dups(spark):
    # Three near-identical docs sharing a prefix + two unrelated ones.
    docs = spark.createDataFrame([
        (1, "apple banana cherry date egg"),
        (2, "apple banana cherry date fig"),
        (3, "apple banana cherry date grape"),
        (4, "zebra yak xylophone walrus vulture"),
        (5, "zebra unrelated words entirely different"),
    ], "doc_id long, text string")
    pairs = linkage.sorted_neighborhood_pairs(docs, window=2,
                                              jaccard_min=0.5)
    got = {(r.doc_id_a, r.doc_id_b): r.jacc for r in pairs.collect()}
    # The apple-block trio all land within the window and pass 0.5.
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    # Cross-block pairs never compared; dissimilar zebra pair filtered.
    assert all(not (a <= 3 < b) for a, b in got)
    assert (4, 5) not in got
    # Jaccard of docs 1,2: 4 shared / 6 union.
    assert abs(got[(1, 2)] - 4 / 6) < 1e-6


def test_sorted_neighborhood_pair_count_is_linear(spark):
    # One block of n identical-prefix docs -> at most n*w pairs, not n^2.
    n, w = 40, 5
    docs = spark.createDataFrame(
        [(i, f"same same same filler{i} filler{i + 1}") for i in range(n)],
        "doc_id long, text string")
    pairs = linkage.sorted_neighborhood_pairs(docs, window=w,
                                              jaccard_min=0.0)
    assert pairs.count() == n * w - w * (w + 1) // 2  # tail rows truncate


def test_multipass_superset_and_boundary_catch(spark):
    # Docs 1 and 2 share everything but their FIRST token: pass 0 puts
    # them in different blocks (never compared); pass 1 keys on tokens
    # 2..4 ("common words here") and catches them.
    docs = spark.createDataFrame([
        (1, "apple common words here now"),
        (2, "zebra common words here now"),
        (3, "apple banana cherry date egg"),
        (4, "apple banana cherry date fig"),
    ], "doc_id long, text string")
    single = linkage.sorted_neighborhood_pairs(docs, window=2,
                                               jaccard_min=0.5)
    norm = {tuple(sorted((r.doc_id_a, r.doc_id_b)))
            for r in single.collect()}
    multi_rows = linkage.sorted_neighborhood_multipass(
        docs, passes=2, window=2, jaccard_min=0.5).collect()
    multi = {(r.doc_id_a, r.doc_id_b) for r in multi_rows}
    assert all(a < b for a, b in multi)  # normalized pair order
    assert norm <= multi                 # superset of the single pass
    assert (3, 4) in multi
    assert (1, 2) in multi and (1, 2) not in norm  # boundary straddler
    # each pair emitted once despite appearing in both passes
    assert len(multi_rows) == len(multi)


def test_record_linkage_weights(spark):
    cust = spark.createDataFrame([
        (1, 7, "AUTO", 100.0),   # links with 2 (delta 50, same sign)
        (2, 7, "AUTO", 150.0),
        (3, 7, "AUTO", 5000.0),  # sign agrees, balance far -> no link
        (4, 8, "AUTO", 101.0),   # different nation: never compared to 1
    ], "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double")
    out = {(r.custkey_a, r.custkey_b): (r.fs_score, r.is_link)
           for r in linkage.record_linkage_pairs(cust).collect()}
    assert out[(1, 2)] == (round(linkage.FS_W_BAL_AGREE
                                 + linkage.FS_W_SIGN_AGREE, 6), True)
    assert (2, 3) not in out and (1, 3) not in out  # fs_score <= 0 dropped
    assert not any(4 in p for p in out)


def test_sorted_neighborhood_hot_block_thinning(spark):
    # 600 docs all opening with the same token, cap 100 -> stride 6
    # thins the block to roughly 1/6 BEFORE any sort; a small block
    # (stride 1) is untouched.
    docs = spark.createDataFrame(
        [(i, f"same opener tokens filler{i}") for i in range(600)]
        + [(1000 + i, f"rare opener tokens filler{i}") for i in range(4)],
        "doc_id long, text string")
    from gcp_serverless_mapreduce_spark.operators import linkage
    pairs = linkage.sorted_neighborhood_pairs(
        docs, window=2, jaccard_min=0.0, max_block=100)
    ids = {i for r in pairs.collect() for i in (r.doc_id_a, r.doc_id_b)}
    hot = {i for i in ids if i < 1000}
    assert 40 <= len(hot) <= 160          # ~600/6, hash-thinned
    assert {1000, 1001, 1002, 1003} <= ids  # small block intact
