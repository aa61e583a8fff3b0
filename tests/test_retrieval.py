"""BM25, overlapping chunking, and split assignment vs pure-Python
oracles on seeded random corpora."""

from __future__ import annotations

import hashlib
import math
import random

from gcp_serverless_mapreduce_spark.operators import curation, retrieval

RNG = random.Random(20260814)
VOCAB = [f"w{i}" for i in range(40)] + ["vector", "join", "scan"]


def test_bm25_fuzz_vs_python(spark):
    texts = {i: " ".join(RNG.choices(VOCAB, k=RNG.randint(1, 30)))
             for i in range(80)}
    terms = ["vector", "join", "scan"]
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["n_hit_terms"], r["score"])
           for r in retrieval.bm25_scores(docs, terms).collect()}

    toks = {d: t.split() for d, t in texts.items()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    expect = {}
    for d, t in toks.items():
        hits = [q for q in terms if q in t]
        if not hits:
            continue
        score = 0.0
        for q in hits:
            tf = t.count(q)
            idf = math.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            score += (idf * tf * (retrieval.K1 + 1.0)
                      / (tf + retrieval.K1
                         * (1.0 - retrieval.B
                            + retrieval.B * len(t) / avgdl)))
        expect[d] = (len(t), len(hits), round(score, 6))
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert got[d][1] == expect[d][1]
        assert abs(got[d][2] - expect[d][2]) < 2e-6, (d, got[d], expect[d])


def test_overlapping_chunks_fuzz_vs_python(spark):
    c, s = 7, 5
    texts = {i: " ".join(RNG.choices(VOCAB, k=RNG.randint(0, 40)))
             for i in range(60)}
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"],
                                           r["chunk_hash"])
           for r in curation.overlapping_chunks(docs, c, s).collect()}
    expect = {}
    for d, text in texts.items():
        t = text.split()
        for idx, start in enumerate(range(0, len(t), s)):
            chunk = t[start:start + c]
            expect[(d, idx)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest())
    assert got == expect


def test_split_assignment_is_exhaustive_and_sized(spark):
    docs = spark.createDataFrame(
        [(i, "srcA" if i % 2 else "srcB") for i in range(4000)],
        ["doc_id", "source"])
    rows = curation.split_assignment(docs).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert sum(by_split.values()) == 4000          # every doc in one split
    assert set(by_split) == {"train", "val", "test"}
    assert 0.85 < by_split["train"] / 4000 < 0.94  # ~0xe6/0x100
    assert by_split["val"] / 4000 < 0.09
    assert by_split["test"] / 4000 < 0.09

    # membership is a pure function of doc_id: reversing the input
    # produces the identical assignment
    rev = spark.createDataFrame(
        [(i, "srcA" if i % 2 else "srcB") for i in range(3999, -1, -1)],
        ["doc_id", "source"])
    assert (sorted(map(tuple, rows))
            == sorted(map(tuple, curation.split_assignment(rev).collect())))


def test_rrf_fuse_vs_python(spark):
    from gcp_serverless_mapreduce_spark.operators.retrieval import rrf_fuse
    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    r2 = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    got = {r["doc_id"]: (r["rrf_score"], r["n_rankers"])
           for r in rrf_fuse([r1, r2], k=60).collect()}
    expect = {1: (1 / 61, 1), 2: (1 / 62, 1),
              3: (1 / 63 + 1 / 61, 2), 4: (1 / 62, 1)}
    assert set(got) == set(expect)
    for d, (s, n) in expect.items():
        assert got[d][1] == n
        assert abs(got[d][0] - s) < 1e-15


def test_weighted_sample_vs_python(spark):
    import hashlib
    import math

    from gcp_serverless_mapreduce_spark.operators.curation import (
        weighted_sample)

    rows = [(i, (i * 37) % 500 + 50) for i in range(800)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = [(r["doc_id"], r["weight"], r["samp_rank"])
           for r in weighted_sample(docs, 50).collect()]

    keyed = []
    for i, w in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 16 ** 13
        keyed.append((round(-math.log(u) / w, 9), i, w))
    keyed.sort()
    expect = [(i, w, rank + 1) for rank, (_, i, w) in enumerate(keyed[:50])]
    assert sorted(got, key=lambda t: t[2]) == expect


def test_weighted_sample_favors_heavy_docs(spark):
    from gcp_serverless_mapreduce_spark.operators.curation import (
        weighted_sample)

    # weight 1000 vs weight 1: heavy ids should dominate the sample
    rows = [(i, 1000 if i < 400 else 1) for i in range(800)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    picked = [r["doc_id"] for r in weighted_sample(docs, 50).collect()]
    heavy = sum(1 for d in picked if d < 400)
    assert heavy >= 45  # P[any light doc beats a heavy one] is tiny


def test_vocab_and_pmi_fuzz_vs_python(spark):
    import collections
    import math

    from gcp_serverless_mapreduce_spark.operators import textstats

    texts = {i: " ".join(RNG.choices(VOCAB[:12], k=RNG.randint(0, 25)))
             for i in range(50)}
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    wc = collections.Counter()
    pc = collections.Counter()
    for t in texts.values():
        toks = t.split()
        wc.update(toks)
        for g in (1, 2):
            for i in range(len(toks) - g):
                pc[(toks[i], toks[i + g])] += 1

    got_v = [(r["vocab_id"], r["word"], r["freq"])
             for r in textstats.build_vocab(docs, 8).collect()]
    expect_v = [(i + 1, w, c) for i, (w, c) in enumerate(
        sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:8])]
    assert sorted(got_v) == expect_v

    got_p = {(r["word_a"], r["word_b"]): (r["n_pair"], r["pmi"])
             for r in textstats.cooccurrence_pmi(docs, 2, 3).collect()}
    t_pairs = sum(pc.values())
    t_words = sum(wc.values())
    expect_p = {}
    for (a, b), c in pc.items():
        if c >= 3:
            pmi = math.log((c / t_pairs)
                           / ((wc[a] / t_words) * (wc[b] / t_words)))
            expect_p[(a, b)] = (c, round(pmi, 6))
    assert set(got_p) == set(expect_p)
    for k, (c, pmi) in expect_p.items():
        assert got_p[k][0] == c
        assert abs(got_p[k][1] - pmi) < 2e-6


def test_entropy_and_kl_fuzz_vs_python(spark):
    import collections
    import math

    from gcp_serverless_mapreduce_spark.operators import textstats

    texts = {i: (" ".join(RNG.choices(VOCAB[:10], k=RNG.randint(1, 30))),
                 f"src{i % 4}") for i in range(60)}
    docs = spark.createDataFrame(
        [(d, t, s) for d, (t, s) in texts.items()],
        ["doc_id", "text", "source"])

    got_e = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
             for r in textstats.token_entropy(docs).collect()}
    for d, (t, _) in texts.items():
        c = collections.Counter(t.split())
        n = sum(c.values())
        h = -sum((v / n) * math.log(v / n) for v in c.values())
        assert got_e[d][0] == n and got_e[d][1] == len(c)
        assert abs(got_e[d][2] - round(h, 6)) < 2e-6

    got_k = {r["source"]: (r["n_tokens"], r["kl_from_corpus"])
             for r in textstats.source_token_kl(docs).collect()}
    corpus = collections.Counter()
    per_src: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    for t, s in texts.values():
        toks = t.split()
        corpus.update(toks)
        per_src[s].update(toks)
    nc = sum(corpus.values())
    for s, cnt in per_src.items():
        ns = sum(cnt.values())
        kl = sum((v / ns) * math.log((v / ns) / (corpus[tok] / nc))
                 for tok, v in cnt.items())
        assert got_k[s][0] == ns
        assert abs(got_k[s][1] - round(kl, 6)) < 2e-6
    assert set(got_k) == set(per_src)


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup cluster must land wholly inside ONE split — the
    property the per-doc hash split cannot give."""
    from gcp_serverless_mapreduce_spark.operators import dedup

    vocab = [f"w{i}" for i in range(30)]
    rows = []
    # 20 clusters of 3 clones each + 40 singletons
    for c in range(20):
        base = " ".join(RNG.choices(vocab, k=15))
        for j in range(3):
            rows.append((c * 10 + j, base))
    for i in range(40):
        rows.append((1000 + i, " ".join(RNG.choices(vocab, k=15))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    import hashlib

    sig = dedup.minhash_signatures(docs, 8)
    pairs = dedup.lsh_candidate_pairs(sig, 4, 2, max_bucket=64)
    clusters = {r["doc_id"]: r["cluster_id"]
                for r in dedup.dup_clusters(pairs).collect()}

    def split_of(rep):
        h2 = hashlib.md5(str(rep).encode()).hexdigest()[:2]
        return "train" if h2 < "e6" else ("val" if h2 < "f3" else "test")

    by_cluster: dict[int, set[str]] = {}
    for d, _ in rows:
        rep = clusters.get(d, d)
        by_cluster.setdefault(rep, set()).add(split_of(rep))
    assert all(len(s) == 1 for s in by_cluster.values())
    # sanity: the clone clusters were actually detected
    assert sum(1 for d, _ in rows if d in clusters) >= 55
