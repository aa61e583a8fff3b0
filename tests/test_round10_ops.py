"""Round-10 operators: MMR diversified retrieval + PSI snapshot drift.

Both queries are oracle-gated end-to-end by the driver; these tests pin
the SEMANTICS the hash can't explain by itself — that MMR actually
trades relevance for diversity (a pure-relevance top-k would fail the
synthetic), and that PSI separates a drifted snapshot pair from a
stable one — via exact pure-Python recomputations on synthetic frames,
plus structural invariants on the fixture.
"""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import similarity
from gcp_serverless_mapreduce_spark.suite import profiling_q, similarity_q
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
RNG = random.Random(0xD1E5)


# ---- pure-Python MMR reference (same fold order as the Arrow kernel) ------

def _unit(v):
    nrm = math.sqrt(_dot(v, v))
    return [x / nrm for x in v] if nrm else None


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _py_mmr(vecs, k, num_queries, shortlist, lam, lam_comp):
    units = {i: u for i, v in vecs.items() if (u := _unit(v)) is not None}
    out = []
    for q in range(num_queries):
        if q not in units:
            continue
        rel = {c: _dot(units[q], units[c]) for c in units if c != q}
        short = sorted(rel, key=lambda c: (-rel[c], c))[:shortlist]
        selected = []
        for step in range(1, k + 1):
            best = None
            for c in short:
                if c in selected:
                    continue
                if selected:
                    redund = max(_dot(units[c], units[s])
                                 for s in selected)
                    score = lam * rel[c] - lam_comp * redund
                else:
                    score = lam * rel[c]
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            _, sel, score = best
            selected.append(sel)
            out.append((q, step, sel, round(score, 4)))
    return sorted(out)


def test_mmr_matches_python_reference_on_random_vectors(spark):
    dim, n = 8, 30
    vecs = {i: [RNG.uniform(-1, 1) for _ in range(dim)] for i in range(n)}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = sorted(
        (r["query_id"], r["step"], r["sel_id"], r["mmr_score"])
        for r in similarity.mmr_diverse_topk(
            emb, k=4, num_queries=2, shortlist=6,
            lam=0.7, lam_comp=0.3).collect())
    assert got == _py_mmr(vecs, 4, 2, 6, 0.7, 0.3)


def test_mmr_prefers_diverse_over_redundant(spark):
    """The semantic point of MMR: with two near-duplicate top-relevance
    candidates and a slightly-less-relevant orthogonal one, plain top-2
    takes both duplicates; MMR's step 2 must take the diverse one."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]),          # the query
         (10, [0.99, 0.141, 0.0]),      # top relevance
         (11, [0.985, 0.172, 0.0]),     # near-duplicate of 10
         (12, [0.97, 0.0, 0.243])],     # lower rel, orthogonal 3rd dim
        "vec_id long, embedding array<double>")
    rows = similarity.mmr_diverse_topk(
        emb, k=2, num_queries=1, shortlist=3,
        lam=0.7, lam_comp=0.3).collect()
    by_step = {r["step"]: r["sel_id"] for r in rows}
    assert by_step[1] == 10            # pure-relevance argmax
    assert by_step[2] == 12            # diversity beats the near-dup
    # sanity: plain relevance order WOULD have picked 11 second
    top2 = [r["neighbor_id"] for r in similarity.brute_force_topk(
        emb, k=2, num_queries=1).collect()]
    assert top2 == [10, 11]


def test_mmr_fixture_invariants(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = similarity.mmr_diverse_topk(
        emb, similarity_q.MMR_K, similarity_q.MMR_NQ,
        similarity_q.MMR_SHORTLIST, similarity_q.MMR_LAM,
        similarity_q.MMR_LAM_COMP).collect()
    assert len(rows) == similarity_q.MMR_K * similarity_q.MMR_NQ
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert sorted(r["step"] for r in rs) == list(
            range(1, similarity_q.MMR_K + 1))
        sels = [r["sel_id"] for r in rs]
        assert len(set(sels)) == len(sels)      # no repeats
        assert q not in sels                    # never selects the query
    # step 1 is the global exact top-1 (shortlist contains it)
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in similarity.brute_force_topk(
                emb, 1, similarity_q.MMR_NQ).collect()}
    got1 = {r["query_id"]: r["sel_id"] for r in rows if r["step"] == 1}
    assert got1 == top1


# ---- PSI snapshot drift ----------------------------------------------------

def _py_psi(doc_rows, buckets=profiling_q.PSI_BUCKETS,
            quantum=profiling_q.PSI_QUANTUM):
    per_src: dict[str, dict] = {}
    for doc_id, source, n_chars in doc_rows:
        half = 1 if hashlib.md5(
            str(doc_id).encode()).hexdigest()[0] >= "8" else 0
        b = min(len(format(n_chars, "b")), buckets)
        d = per_src.setdefault(source, {"nref": {}, "ncur": {}})
        key = "ncur" if half else "nref"
        d[key][b] = d[key].get(b, 0) + 1
    out = {}
    for source, d in per_src.items():
        tref, tcur = sum(d["nref"].values()), sum(d["ncur"].values())
        qsum = 0
        for b in range(1, buckets + 1):
            pc = (d["ncur"].get(b, 0) + 1.0) / (tcur + buckets)
            pr = (d["nref"].get(b, 0) + 1.0) / (tref + buckets)
            term = (pc - pr) * math.log(pc / pr) * quantum
            # round-half-away-from-zero (Spark/DuckDB round())
            qsum += int(math.copysign(math.floor(abs(term) + 0.5), term))
        out[source] = (tref, tcur, round(qsum / quantum, 6))
    return out


def test_psi_fuzz_matches_python_recompute(spark, tmp_path):
    rows = []
    did = 0
    # "stable": length independent of the snapshot hash
    for _ in range(400):
        rows.append((did, "stable", RNG.randint(50, 2000)))
        did += 1
    # "drift": the cur half is ~4x longer than the ref half
    for _ in range(400):
        half = hashlib.md5(str(did).encode()).hexdigest()[0] >= "8"
        lo, hi = (800, 4000) if half else (50, 900)
        rows.append((did, "drift", RNG.randint(lo, hi)))
        did += 1
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {r["source"]: (r["n_ref"], r["n_cur"], r["psi_len"])
           for r in profiling_q.source_drift_psi(
               spark, str(tmp_path)).collect()}
    want = _py_psi(rows)
    assert got == want
    # PSI separates the two regimes decisively
    assert got["drift"][2] > 0.5
    assert got["stable"][2] < 0.05
    # every term (p - q) ln(p/q) is >= 0, so PSI is too
    assert all(v[2] >= -1e-9 for v in got.values())


def test_psi_fixture_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_per_src = {r["source"]: r["n"] for r in
                 docs.groupBy("source")
                 .agg(F.count("*").alias("n")).collect()}
    rows = profiling_q.source_drift_psi(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(n_per_src)
    for r in rows:
        assert r["n_ref"] + r["n_cur"] == n_per_src[r["source"]]
        assert r["psi_len"] >= -1e-9


def test_mmr_reduces_redundancy_vs_plain_topk(spark):
    """The measurable point of the operator: over the fixture corpus,
    the MMR selection's mean pairwise cosine (its redundancy) must be
    strictly below the plain relevance top-k's for the same k — i.e.
    the diversity term does real work, not just reordering."""
    emb = load_table(spark, SF_DIR, "embeddings")
    k, nq = similarity_q.MMR_K, similarity_q.MMR_NQ
    mmr_sel: dict[int, list[int]] = {}
    for r in similarity.mmr_diverse_topk(
            emb, k, nq, similarity_q.MMR_SHORTLIST,
            similarity_q.MMR_LAM, similarity_q.MMR_LAM_COMP).collect():
        mmr_sel.setdefault(r["query_id"], []).append(r["sel_id"])
    plain_sel: dict[int, list[int]] = {}
    for r in similarity.brute_force_topk(emb, k, nq).collect():
        plain_sel.setdefault(r["query_id"], []).append(r["neighbor_id"])

    vecs = {r["vec_id"]: list(r["embedding"]) for r in
            emb.filter(F.col("vec_id").isin(
                sorted({v for s in (*mmr_sel.values(),
                                    *plain_sel.values()) for v in s})))
            .collect()}

    def mean_pairwise(ids):
        us = [_unit(vecs[i]) for i in ids]
        sims = [_dot(a, b) for i, a in enumerate(us)
                for b in us[i + 1:]]
        return sum(sims) / len(sims)

    mmr_red = sum(mean_pairwise(v) for v in mmr_sel.values()) / nq
    plain_red = sum(mean_pairwise(v) for v in plain_sel.values()) / nq
    assert mmr_red < plain_red, (mmr_red, plain_red)


# ---- label propagation ------------------------------------------------------

def _py_lpa(edges, rounds):
    bi = {}
    for u, v in edges:
        bi.setdefault(u, []).append(v)
        bi.setdefault(v, []).append(u)
    labels = {n: n for n in bi}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in bi.items():
            cnt: dict[str, int] = {}
            for m in nbrs:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            nxt[n] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        labels = nxt
    return labels


def test_lpa_matches_python_reference(spark):
    from gcp_serverless_mapreduce_spark.operators import graph
    nodes = [f"n{i:02d}" for i in range(14)]
    edges = set()
    # two dense clusters + one bridge + a pendant chain
    for grp in (nodes[:6], nodes[6:12]):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                if RNG.random() < 0.7:
                    edges.add((min(a, b), max(a, b)))
    edges.add((nodes[5], nodes[6]))            # bridge
    edges.add((nodes[11], nodes[12]))          # pendant
    edges.add((nodes[12], nodes[13]))
    e = spark.createDataFrame(sorted(edges), "u string, v string")
    got = {r["node"]: r["community"]
           for r in graph.label_propagation(e, 3).collect()}
    assert got == _py_lpa(sorted(edges), 3)


def test_lpa_separates_two_cliques(spark):
    from gcp_serverless_mapreduce_spark.operators import graph
    ca, cb = [f"a{i}" for i in range(4)], [f"b{i}" for i in range(4)]
    edges = [(x, y) for grp in (ca, cb)
             for i, x in enumerate(grp) for y in grp[i + 1:]]
    edges.append(("a3", "b0"))                 # single bridge
    e = spark.createDataFrame(edges, "u string, v string")
    got = {r["node"]: r["community"]
           for r in graph.label_propagation(e, 4).collect()}
    # each clique converges to ONE community, and the two differ
    assert len({got[n] for n in ca}) == 1
    assert len({got[n] for n in cb[1:]}) == 1  # b0 touches the bridge
    assert got["a0"] != got["b1"]


# ---- k-anonymity / l-diversity audit ---------------------------------------

def test_k_anonymity_audit_fuzz(spark, tmp_path):
    from gcp_serverless_mapreduce_spark.suite.profiling_q import (
        KANON_K, LDIV_L, SENS_BUCKET, k_anonymity_audit)
    rows, want = [], {}
    cid = 0
    specs = [  # (nation, segment, group size, distinct sens buckets)
        (1, "AUTO", 12, 6), (1, "HOME", 3, 2), (2, "AUTO", 5, 1),
        (3, "CARS", 40, 9), (4, "HOME", 1, 1),
    ]
    for nat, seg, size, nsens in specs:
        for i in range(size):
            bal = (i % nsens) * SENS_BUCKET + 17.5
            rows.append((cid, f"c{cid}", nat, bal, seg))
            cid += 1
        want[(nat, seg)] = (size, nsens, 10000 // size,
                            size < KANON_K, nsens < LDIV_L)
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
              "c_acctbal double, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {(r["c_nationkey"], r["c_mktsegment"]):
           (r["n_rows"], r["l_distinct"], r["reident_risk_bp"],
            r["violates_k"], r["violates_l"])
           for r in k_anonymity_audit(spark, str(tmp_path)).collect()}
    assert got == want


# ---- k-center coreset -------------------------------------------------------

def test_kcenter_matches_python_reference(spark):
    from gcp_serverless_mapreduce_spark.suite.similarity_q import (
        KC_K, KC_POOL)
    emb = load_table(spark, SF_DIR, "embeddings")
    got = [(r["step"], r["sel_id"], r["nearest_sim"]) for r in
           similarity.kcenter_coreset(emb, KC_K, KC_POOL)
           .orderBy("step").collect()]
    # pure-Python recompute: same md5 pool, same greedy
    rows = emb.collect()
    units = {r["vec_id"]: _unit(list(r["embedding"])) for r in rows}
    units = {i: u for i, u in units.items() if u is not None}
    pool = sorted(units, key=lambda i: (hashlib.md5(
        str(i).encode()).hexdigest(), i))[:KC_POOL]
    sel = [pool[0]]
    want = [(1, pool[0], None)]
    for step in range(2, KC_K + 1):
        best = None
        for c in pool:
            if c in sel:
                continue
            near = max(_dot(units[c], units[s]) for s in sel)
            if best is None or (near, c) < best[0]:
                best = ((near, c), c, near)
        _, s_, near = best
        sel.append(s_)
        want.append((step, s_, round(near, 4)))
    assert got == want
    # coverage radius is non-decreasing after the seed: each pick is
    # the farthest remaining point, so its nearest-selected similarity
    # can only grow (space fills up)
    sims = [s for _, _, s in got[1:]]
    assert all(a <= b + 1e-12 for a, b in zip(sims, sims[1:]))


def test_kcenter_covers_clusters_before_duplicates(spark):
    """Three tight clusters + k=3 must pick one member of EACH cluster,
    never two of one — the semantic k-center exists for."""
    base = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    rows, vid = [], 0
    cluster_of = {}
    for cid, b in base.items():
        for j in range(4):
            v = [x + 0.01 * ((vid * 7 + j) % 3) for x in b]
            rows.append((vid, v))
            cluster_of[vid] = cid
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.kcenter_coreset(emb, 3, 12).collect()
    picked_clusters = [cluster_of[r["sel_id"]] for r in got]
    assert sorted(picked_clusters) == [0, 1, 2], picked_clusters


# ---- blocklist filter -------------------------------------------------------

def test_badwords_token_boundaries(spark, tmp_path):
    from gcp_serverless_mapreduce_spark.suite.curation_q import (
        badwords_filter_rates)
    docs = [
        (0, "dup dup value dup", "en", "s1", 0),      # 3 hits, flagged
        (1, "dupes and dupdup stay clean", "en", "s1", 0),  # substrings: 0
        (2, "a big table scan", "en", "s1", 0),       # phrase hit
        (3, "big value table", "en", "s1", 0),        # split phrase: 0
        (4, "drop table now", "en", "s2", 0),         # absent-in-fixture term
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r.asDict() for r in
           badwords_filter_rates(spark, str(tmp_path)).collect()}
    s1 = got["s1"]
    assert (s1["n_docs"], s1["n_flagged"]) == (4, 2)
    assert s1["hits_dup"] == 3
    assert s1["hits_big_table"] == 1
    assert s1["hits_drop_table"] == 0
    assert s1["flag_rate_bp"] == 5000
    s2 = got["s2"]
    assert s2["hits_drop_table"] == 1 and s2["n_flagged"] == 1


def test_badwords_short_and_empty_docs(spark, tmp_path):
    # Docs with fewer tokens than the longest phrase used to make
    # sequence(0, size(toks)-N) DESCEND and throw INVALID_ARRAY_INDEX
    # under ANSI mode (round-10 ADVICE).  They must count as 0 hits.
    from gcp_serverless_mapreduce_spark.suite.curation_q import (
        badwords_filter_rates)
    docs = [
        (0, "dup", "en", "s1", 0),          # 1 token < 2-token phrases
        (1, "", "en", "s1", 0),             # empty text
        (2, "big", "en", "s1", 0),          # phrase prefix only
        (3, "big table", "en", "s1", 0),    # exactly phrase-length
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r.asDict() for r in
           badwords_filter_rates(spark, str(tmp_path)).collect()}
    s1 = got["s1"]
    assert s1["n_docs"] == 4
    assert s1["hits_dup"] == 1          # doc 0 (token-boundary match)
    assert s1["hits_big_table"] == 1    # doc 3 only
    assert s1["hits_drop_table"] == 0
    assert s1["n_flagged"] == 2


def test_badwords_quote_escaping(spark):
    # A real blocklist will contain quoted terms; both the Spark
    # expression and the DuckDB SQL must survive them (round-10 ADVICE).
    import duckdb

    from gcp_serverless_mapreduce_spark.suite.curation_q import (
        _occ_col, _occ_sql)
    toked = spark.createDataFrame(
        [(["don't", "panic"],), (["don’t",],), ([],)],
        "toks array<string>")
    got = [r[0] for r in
           toked.select(_occ_col("don't panic").alias("n")).collect()]
    assert got == [1, 0, 0]
    con = duckdb.connect()
    sql = _occ_sql("don't panic")
    rows = con.execute(
        f"SELECT {sql} FROM (SELECT ['don''t','panic'] AS toks "
        f"UNION ALL SELECT CAST([] AS VARCHAR[]))").fetchall()
    assert sorted(v for (v,) in rows) == [0, 1]


def test_kcenter_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.kcenter_coreset(emb, 3, 8).collect() == []
    zeros = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    assert similarity.kcenter_coreset(zeros, 3, 8).collect() == []


# ---- Hilbert layout key -----------------------------------------------------

def _py_hilbert(x, y, bits=16):
    n = 1 << bits
    mask = n - 1
    x &= mask
    y &= mask
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = mask - x, mask - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_python_reference(spark):
    from gcp_serverless_mapreduce_spark.operators import layout
    pts = ([(a, b) for a in range(0, 70000, 7321) for b in
            (0, 1, 255, 4096, 65535)]
           + [(RNG.randrange(1 << 16), RNG.randrange(1 << 16))
              for _ in range(60)])
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["h"] for r in
           df.select("x", "y", layout.hilbert_key(
               F.col("x"), F.col("y")).alias("h")).collect()}
    assert got == {(x, y): _py_hilbert(x, y) for x, y in pts}


def test_hilbert_consecutive_cells_adjacent(spark):
    """The curve property the locality claim rests on: consecutive
    indices are adjacent cells (Manhattan distance 1) — checked
    exhaustively at 4 bits via the pure-Python twin the Spark fold is
    pinned to above."""
    n = 16
    inv = {}
    for x in range(n):
        for y in range(n):
            inv[_py_hilbert(x, y, bits=4)] = (x, y)
    assert sorted(inv) == list(range(n * n))
    assert all(abs(inv[d][0] - inv[d + 1][0])
               + abs(inv[d][1] - inv[d + 1][1]) == 1
               for d in range(n * n - 1))


def test_hilbert_row_groups_prune_tighter_than_zorder(spark):
    """The measured point of the operator: sort the fixture orders by
    each key and chunk into fixed-size row groups (what a clustered
    writer actually produces — row-group boundaries do NOT align to
    quadrant boundaries); the mean row-group bounding-box AREA (the
    min/max pruning granule) must be materially smaller under Hilbert.
    Note: on quadrant-ALIGNED key-range buckets the two curves tile
    space into the SAME squares (both visit each 2^k x 2^k quadrant
    contiguously), so the suite queries' aligned-bucket summaries are
    equal by construction — the advantage only exists (and a real
    writer only cares) at unaligned boundaries.  Measured here:
    ~22k vs ~40k at sf0.01, chunk=64."""
    from gcp_serverless_mapreduce_spark.operators import layout
    from gcp_serverless_mapreduce_spark.suite.layout_q import DATE_EPOCH
    orders = load_table(spark, SF_DIR, "orders")
    day_no = F.datediff(F.col("o_orderdate").cast("date"),
                        F.lit(DATE_EPOCH).cast("date"))
    rows = orders.select(
        "o_custkey", day_no.alias("day_no"),
        layout.hilbert_key(F.col("o_custkey"), day_no).alias("hkey"),
        layout.zorder_key(F.col("o_custkey"), day_no).alias("zkey")
    ).collect()

    def mean_area(key, chunk=64):
        srt = sorted(rows, key=lambda r: r[key])
        areas = []
        for i in range(0, len(srt) - 1, chunk):
            ch = srt[i:i + chunk]
            xs = [r["o_custkey"] for r in ch]
            ys = [r["day_no"] for r in ch]
            areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return sum(areas) / len(areas)

    h, z = mean_area("hkey"), mean_area("zkey")
    assert h < 0.8 * z, (h, z)
