"""Round-5 operators vs independent pure-Python oracles: fixed-iteration
PageRank, prefix-filtering Jaccard join (exactness incl. the
at-threshold boundary), and SemDeDup discard selection.
"""

from __future__ import annotations

import collections
import math
import random

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import dedup, graph, similarity

RNG = random.Random(20260814)


# ---- PageRank ----------------------------------------------------------

def _py_pagerank(adj: dict[int, set[int]], iters: int, d: float):
    nodes = sorted(adj)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        r = {v: (1 - d) / n + d * sum(r[u] / len(adj[u])
                                      for u in nodes if v in adj[u])
             for v in nodes}
    return r


def _random_adj(n_nodes: int, n_edges: int) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = collections.defaultdict(set)
    while sum(len(v) for v in adj.values()) < 2 * n_edges:
        a, b = RNG.sample(range(n_nodes), 2)
        adj[a].add(b)
        adj[b].add(a)
    return adj


def test_pagerank_fuzz_vs_python(spark):
    adj = _random_adj(40, 80)
    edges = spark.createDataFrame(
        [(a, b) for a, nbrs in adj.items() for b in nbrs], ["src", "dst"])
    got = {r["node"]: r["rank"]
           for r in graph.pagerank_rounded(edges, iters=5).collect()}
    expect = _py_pagerank(adj, 5, 0.85)
    assert set(got) == set(expect)
    for v, rank in expect.items():
        assert abs(got[v] - rank) < 2e-6, (v, got[v], rank)


def test_pagerank_mass_conserved(spark):
    adj = _random_adj(25, 40)
    edges = spark.createDataFrame(
        [(a, b) for a, nbrs in adj.items() for b in nbrs], ["src", "dst"])
    pr = graph.pagerank(edges, iters=4)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


# ---- prefix-filtering Jaccard ------------------------------------------

def _py_jaccard_pairs(texts: dict[int, str], t: float, k: int = 3):
    sets = {}
    for doc, text in texts.items():
        toks = text.strip().lower().split()
        sets[doc] = {" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= t:
                out[(a, b)] = round(j, 9)
    return out


def _run_prefix(spark, texts: dict[int, str], t: float):
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = dedup.jaccard_pairs_prefix(docs, t).collect()
    return {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 9) for r in rows}


def test_prefix_jaccard_fuzz_vs_bruteforce(spark):
    vocab = [f"w{i}" for i in range(30)]
    texts = {i: " ".join(RNG.choices(vocab, k=RNG.randint(3, 25)))
             for i in range(60)}
    # seed guaranteed near-dup chains: clones and one-token edits
    base = " ".join(RNG.choices(vocab, k=20))
    texts[100] = base
    texts[101] = base
    texts[102] = base + " w0"
    assert _run_prefix(spark, texts, 0.5) == _py_jaccard_pairs(texts, 0.5)


def test_prefix_jaccard_exact_at_threshold(spark):
    # B's shingles are a strict subset of A's with J == 0.8 EXACTLY, and
    # |A| = 25 shingles — the size where IEEE 0.8*25 rounds to
    # 20.000000000000004, so a double-based ceil gives alpha = 21 and a
    # prefix one element too short: A's only shared prefix shingle is its
    # 6th, so the buggy prefix (5 elements, all A-private) misses the
    # pair entirely.  Pins the exact-integer alpha in
    # dedup.jaccard_pairs_prefix.
    toks = [f"t{i:02d}" for i in range(27)]
    a = " ".join(toks)                            # 25 shingles s0..s24
    b = " ".join(toks[5:])                        # 20 shingles s5..s24
    texts = {1: a, 2: b}
    expect = _py_jaccard_pairs(texts, 0.8)
    assert expect == {(1, 2): 0.8}, "test fixture must sit at J == t"
    assert _run_prefix(spark, texts, 0.8) == expect


# ---- SemDeDup ----------------------------------------------------------

def test_semdedup_fuzz_vs_bruteforce(spark):
    dim, n = 16, 120
    planes = similarity.srp_planes(4, dim)
    vecs = {i: [RNG.gauss(0, 1) for _ in range(dim)] for i in range(n)}
    # seed exact and near duplicates
    vecs[200] = vecs[0][:]
    vecs[201] = [x * 2.0 for x in vecs[1]]       # same direction
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cell"], r["keep_id"])
           for r in similarity.semdedup_discards(emb, planes, 0.6).collect()}

    # python oracle — float32-roundtrip the vectors like the fixture column
    import numpy as np
    f32 = {i: np.array(v, dtype=np.float32).astype(np.float64)
           for i, v in vecs.items()}
    cells = collections.defaultdict(list)
    for i in sorted(f32):
        sig = "".join(
            "1" if float(np.dot(f32[i], np.array(p, dtype=np.float64))) >= 0
            else "0" for p in planes)
        cells[sig].append(i)
    expect = {}
    for sig, members in cells.items():
        for v in members:
            uv = f32[v] / np.linalg.norm(f32[v])
            keeps = [u for u in members if u < v
                     and float(np.dot(f32[u] / np.linalg.norm(f32[u]), uv))
                     >= 0.6]
            if keeps:
                expect[v] = (sig, min(keeps))
    assert got == expect
    assert 200 in got and 201 in got  # the seeded duplicates are caught


# ---- directed containment join -----------------------------------------

def test_containment_fuzz_vs_bruteforce(spark):
    vocab = [f"w{i}" for i in range(25)]
    texts = {i: " ".join(RNG.choices(vocab, k=RNG.randint(3, 25)))
             for i in range(50)}
    # seed subset pairs: doc 101's tokens are a prefix of doc 100's
    base = " ".join(RNG.choices(vocab, k=24))
    texts[100] = base
    texts[101] = " ".join(base.split()[:15])
    k, t = 3, 0.7

    def shingles(text):
        toks = text.strip().lower().split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sets = {d: shingles(x) for d, x in texts.items()}
    expect = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                expect[(a, b)] = round(c, 9)

    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): round(r["containment"], 9)
           for r in dedup.containment_pairs(docs, t, k).collect()}
    assert got == expect
    assert (101, 100) in got  # the seeded subset pair is found


# ---- multi-probe SRP ---------------------------------------------------

def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe (home + all hamming-1 buckets) must recover at least
    every true neighbor single-probe finds, and strictly more on the
    fixture (that's the point of probing)."""
    import numpy as np

    from gcp_serverless_mapreduce_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    planes = similarity.srp_planes(8, 64)
    k = 5

    def topk_set(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    single = topk_set(similarity.srp_ann_topk(emb, k, planes))
    multi = topk_set(similarity.srp_multiprobe_topk(emb, k, planes))
    exact = topk_set(similarity.brute_force_topk(emb, k, 10**9))

    hits_single = len(single & exact)
    hits_multi = len(multi & exact)
    assert hits_multi > hits_single, (hits_multi, hits_single)
    # probing more buckets can only improve the candidate pool
    assert hits_multi / len(exact) > hits_single / len(exact)


def test_triangle_counts_ordered_wedges(spark):
    from gcp_serverless_mapreduce_spark.operators import graph
    # K4 on a,b,c,d (4 triangles, each node in 3) plus a pendant edge.
    nodes = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1:]]
        + [("d", "e")], "u string, v string")
    got = {r.node: r.n_triangles for r in
           graph.triangle_counts(edges).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_undirect_dedups_both_directions(spark):
    from gcp_serverless_mapreduce_spark.operators import graph
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "b"), ("c", "a")],
        "word_a string, word_b string")
    got = {(r.u, r.v) for r in graph.undirect(pairs).collect()}
    assert got == {("a", "b"), ("a", "c")}
