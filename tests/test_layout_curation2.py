"""Unit tests for the round-5 operators: z-order keys, per-domain cap,
latest-per-key compaction, and the redelivered-stream dedup."""

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import curation, layout


def _z(spark, x, y):
    return spark.range(1).select(
        layout.zorder_key(F.lit(x), F.lit(y)).alias("z")).first()["z"]


def test_zorder_key_golden(spark):
    # x=3 (bits 0,1 -> even positions 0,2), y=5 (bits 0,2 -> odd
    # positions 1,5): 1 + 4 + 2 + 32 = 39.
    assert _z(spark, 3, 5) == 39
    assert _z(spark, 0, 0) == 0
    assert _z(spark, 1, 0) == 1
    assert _z(spark, 0, 1) == 2
    # 16-bit mask: values wrap, never collide into other bit positions
    assert _z(spark, (1 << 16) + 3, 5) == 39


def test_zorder_key_locality(spark):
    # Interleaving bounds each dimension's range within a coarse bucket:
    # keys sharing their high bits agree on the high bits of BOTH inputs.
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y"))
    z = df.select("x", "y", layout.zorder_key(F.col("x"), F.col("y")).alias("z"))
    stats = (z.groupBy(F.shiftright("z", 4).alias("b"))
             .agg((F.max("x") - F.min("x")).alias("xr"),
                  (F.max("y") - F.min("y")).alias("yr"))
             .agg(F.max("xr").alias("xr"), F.max("yr").alias("yr")).first())
    # each 16-key bucket spans at most a 4-wide range in x and y
    assert stats["xr"] <= 3 and stats["yr"] <= 3


def test_cap_per_source_bounds_and_order(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", " ".join(f"w{j}" for j in range(i + 1)))
         for i in range(10)],
        ["doc_id", "source", "text"])
    out = curation.cap_per_source(docs, cap=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        assert len(rows) <= 3
        ranked = sorted(rows, key=lambda r: r["rank"])
        # quality (distinct tokens) is non-increasing with rank
        uniqs = [r["n_uniq_tokens"] for r in ranked]
        assert uniqs == sorted(uniqs, reverse=True)
    # highest-token docs win: doc 9 (10 tokens) leads s1, doc 8 leads s0
    assert by_src["s1"][0]["doc_id"] == 9 or by_src["s1"][0]["rank"] > 1
    top = {src: min(rows, key=lambda r: r["rank"])["doc_id"]
           for src, rows in by_src.items()}
    assert top == {"s0": 8, "s1": 9}


def test_latest_per_key_golden(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (2, 5, "d")],
        ["k", "ord", "val"])
    out = {r["k"]: r["val"]
           for r in curation.latest_per_key(df, ["k"], ["ord", "val"]).collect()}
    # k=1: ord 20 wins; k=2: ord tie -> val 'd' (desc) wins
    assert out == {1: "b", 2: "d"}


def test_stream_redelivery_dedup_exact(spark, tmp_path):
    # A duplicated stream deduped on event_id must equal the single copy.
    from gcp_serverless_mapreduce_spark.streaming import pipeline

    sf_dir = "/root/testdata/sf0.001"
    ev = pipeline.stream_events_redelivered(spark, sf_dir)
    deduped = (ev.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["event_id"]))
    rows = pipeline.run_available_now(deduped, "test_dedup_replay_sink",
                                      mode="append")
    single = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert rows.count() == single.count()
    assert rows.select("event_id").distinct().count() == single.count()


def test_pack_sequences_offset_bucketing(spark):
    # budget 5; docs of 3,3,4 tokens in one source: cumulative ends 3,6,10;
    # start offsets 0,3,6 -> packs 0,0,1.  Pack 0 holds 6 tokens (overflow),
    # pack 1 holds 4 (fill 0.8).
    docs = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "d e f"), (3, "s", "g h i j")],
        ["doc_id", "source", "text"])
    rows = {r["pack_id"]: r
            for r in curation.pack_sequences(docs, budget=5).collect()}
    assert rows[0]["n_docs"] == 2 and rows[0]["token_sum"] == 6
    assert rows[0]["overflowed"] is True
    assert rows[1]["n_docs"] == 1 and rows[1]["token_sum"] == 4
    assert rows[1]["overflowed"] is False
    assert abs(rows[1]["fill_ratio"] - 0.8) < 1e-9


def test_temperature_sample_flattens_sources(spark):
    # 100-doc source vs 4-doc source, scale 2: quotas 20 vs 4 — the big
    # source is 25x larger but only 5x more sampled (sqrt flattening);
    # the small source keeps everything (quota >= n).
    docs = spark.createDataFrame(
        [(i, "big", "t") for i in range(100)]
        + [(1000 + i, "small", "t") for i in range(4)],
        ["doc_id", "source", "text"])
    out = curation.temperature_sample(docs, scale=2).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["source"], []).append(r)
    assert len(kept["big"]) == 20 and all(r["quota"] == 20 for r in kept["big"])
    assert len(kept["small"]) == 4
    # deterministic: same draw on re-run
    again = curation.temperature_sample(docs, scale=2).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_source_overlap_exact_jaccard(spark):
    from gcp_serverless_mapreduce_spark.operators import curation

    rows = [
        (0, "a b c d", "s1"), (1, "b c d e", "s1"),
        (2, "a b c x", "s2"), (3, "x y z w", "s2"),
        (4, "p q r s", "s3"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r["src_a"], r["src_b"]): r
           for r in curation.source_overlap(docs, n=2).collect()}

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}

    sets = {}
    for _id, t, s in rows:
        sets.setdefault(s, set()).update(grams(t))
    import itertools
    want_pairs = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            want_pairs.add((a, b))
            r = got[(a, b)]
            assert r["inter"] == inter
            assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
            assert abs(r["jaccard"]
                       - inter / len(sets[a] | sets[b])) < 1e-9
    # disjoint pairs emit no row (inter joins drop them)
    assert set(got) == want_pairs


def test_unimax_water_filling_regimes(spark):
    from gcp_serverless_mapreduce_spark.operators.curation import (
        unimax_language_budget)

    docs = spark.createDataFrame(
        [(i, lang, chars) for i, (lang, chars) in enumerate(
            [("en", 500), ("es", 250), ("de", 150), ("fr", 60),
             ("und", 20)])],
        "doc_id long, lang string, n_chars long")

    # mixed regime: B=800 of 980 chars, caps = 2x chars -> und and fr
    # cap out, the remaining three share the residual equally
    got = {r["lang"]: r for r in unimax_language_budget(
        docs, budget_frac=800 / 980, max_epochs=2.0).collect()}
    assert got["und"]["alloc_chars"] == 40.0 and got["und"]["epochs"] == 2.0
    assert got["fr"]["alloc_chars"] == 120.0
    level = round((800 - 40 - 120) / 3, 4)
    for lang in ("de", "es", "en"):
        assert got[lang]["alloc_chars"] == level
    # allocations are rounded to 4dp individually, so the sum can be a
    # few 1e-4 off the exact budget
    assert abs(sum(r["alloc_chars"] for r in got.values()) - 800) < 1e-3

    # budget covers every cap -> all capped, theta never binds
    got = {r["lang"]: r["alloc_chars"] for r in unimax_language_budget(
        docs, budget_frac=5.0, max_epochs=2.0).collect()}
    assert got == {"en": 1000.0, "es": 500.0, "de": 300.0,
                   "fr": 120.0, "und": 40.0}

    # tiny budget, no cap binds -> pure uniform split
    got = {r["lang"]: r["alloc_chars"] for r in unimax_language_budget(
        docs, budget_frac=100 / 980, max_epochs=2.0).collect()}
    assert set(got.values()) == {20.0}


def test_file_compaction_plan_packing_invariants(spark):
    """Next-fit exclusive-prefix binning, pinned: packed bytes are
    conserved per partition, bin ids are dense from 0, and the running
    prefix through every non-final bin reaches that bin's boundary
    (so no bin closes early — the property that keeps output files
    near the target)."""
    from pyspark.sql import functions as F

    from gcp_serverless_mapreduce_spark.suite.layout_q import (
        COMPACT_TARGET, file_compaction_plan)
    from gcp_serverless_mapreduce_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    plan = file_compaction_plan(spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    truth = {r["source"]: r["b"] for r in
             (docs.filter(F.col("n_chars") < COMPACT_TARGET)
              .groupBy("source").agg(F.sum("n_chars").alias("b"))
              .collect())}
    by_src = {}
    for r in plan:
        by_src.setdefault(r["source"], {})[r["bin_id"]] = r
    assert set(by_src) == set(truth)
    for src, bins in by_src.items():
        ids = sorted(bins)
        assert ids == list(range(len(ids)))          # dense from 0
        assert sum(b["bin_bytes"] for b in bins.values()) == truth[src]
        run = 0
        for i in ids:
            run += bins[i]["bin_bytes"]
            if i < ids[-1]:
                # the next file opened bin i+1, so the prefix through
                # bin i crossed the (i+1)*target boundary
                assert run >= (i + 1) * COMPACT_TARGET
        assert all(b["n_files"] >= 1 for b in bins.values())
