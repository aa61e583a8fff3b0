"""Sketch operators: Count-Min one-sided error + fixed grid; KMV bounds."""

import pyspark.sql.functions as F
import pytest

from gcp_serverless_mapreduce_spark.operators import sketches


@pytest.fixture(scope="module")
def words(spark):
    # Skewed stream: 'alpha' x 400, 'beta' x 50, 20 singletons.
    rows = [("alpha",)] * 400 + [("beta",)] * 50 + [
        (f"tail{i}",) for i in range(20)]
    return spark.createDataFrame(rows, "key string").repartition(8)


def test_cms_is_one_sided_and_bounded(words):
    sketch = sketches.cms_build(words)
    # The sketch never exceeds the fixed cell grid (the 100 TB property).
    assert sketch.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
    total = sketch.where(F.col("row") == 0).agg(
        F.sum("cnt")).collect()[0][0]
    assert total == 470  # every row of the grid sees the full stream

    exact = words.groupBy("key").count()
    est = sketches.cms_estimate(exact.select("key"), sketch)
    joined = {r["key"]: (r["count"], r["cms_est"])
              for r in exact.join(est, "key").collect()}
    for key, (ex, es) in joined.items():
        assert es >= ex, f"CMS must upper-bound: {key}"
        assert es <= ex + 470  # trivially bounded by stream size
    assert joined["alpha"][1] == 400  # heavy key: no collision at this width


def test_kmv_exact_below_k_and_close_above(spark):
    # 40 distinct keys < k=64 -> exact path.
    small = spark.createDataFrame(
        [("g", f"u{i % 40}") for i in range(500)], "grp string, key string")
    row = sketches.kmv_distinct(small, "grp", "key").collect()[0]
    assert row["n_hashes"] == 40 and row["kmv_est"] == 40.0

    # 5000 distinct keys >> k -> estimate within 40% (k=64 -> ~12% stderr).
    big = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(5000)], "grp string, key string")
    row = sketches.kmv_distinct(big, "grp", "key").collect()[0]
    assert row["n_hashes"] == sketches.KMV_K
    assert 3000 <= row["kmv_est"] <= 7000


def test_bloom_no_false_negatives_and_tiny_fp(spark):
    import hashlib

    inserted = [f"ngram-{i}" for i in range(200)]
    keys = spark.createDataFrame([(k,) for k in inserted], "key string")
    bits = sketches.bloom_build(keys)
    # bounded by min(m, k * n) regardless of input volume
    assert bits.count() <= min(sketches.BLOOM_M,
                               sketches.BLOOM_K * len(inserted))
    bitmap = sketches.bloom_bitmap(bits)
    assert len(bitmap) == sketches.BLOOM_WORDS

    probes = inserted + [f"absent-{i}" for i in range(2000)]
    pf = spark.createDataFrame([(k,) for k in probes], "key string")
    got = {r["key"]: r["hit"] for r in pf.select(
        "key", sketches.bloom_hit_expr(F.col("key"), bitmap).alias("hit")
    ).collect()}
    # no false negatives, ever
    assert all(got[k] for k in inserted)
    # m=65536, k=4, n=200 -> FP rate ~2e-8; allow a couple anyway
    fps = sum(got[k] for k in probes[200:])
    assert fps <= 2

    # bit positions match the md5-prefix convention exactly
    def py_pos(key, seed):
        return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8],
                   16) % sketches.BLOOM_M

    def py_hit(key):
        return all(
            (bitmap[py_pos(key, s) // 64] >> (py_pos(key, s) % 64)) & 1
            for s in range(sketches.BLOOM_K))

    for k in probes[:50] + probes[200:250]:
        assert got[k] == py_hit(k)


def test_kmv_merge_states_equals_single_pass(spark):
    rows = [("g", f"user-{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, key string") \
        .withColumn("par", F.length("key") % 2)
    s0 = sketches.kmv_state(df.where("par = 0"), "grp", "key")
    s1 = sketches.kmv_state(df.where("par = 1"), "grp", "key")
    merged = sketches.kmv_merge_states(s0, s1)
    direct = sketches.kmv_state(df, "grp", "key")
    # state-level equality: the merge is lossless, not just close
    assert sorted(r["h"] for r in merged.collect()) == \
        sorted(r["h"] for r in direct.collect())
    est_m = sketches.kmv_estimate(merged, "grp").collect()[0]["kmv_est"]
    est_d = sketches.kmv_estimate(direct, "grp").collect()[0]["kmv_est"]
    assert est_m == est_d


def test_hll_rho_matches_leading_zero_definition(spark):
    # rho = leading zeros of the 38 scored bits + 1, via bit-length.
    cases = [
        (0, sketches.HLL_MAX_RHO),          # all-zero scored bits
        (1, sketches.HLL_REST_BITS),        # 37 leading zeros + 1
        (sketches.HLL_REST_MOD - 1, 1),     # top bit set
        (1 << 10, sketches.HLL_REST_BITS - 10),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "rest long")
    got = [r[0] for r in
           df.select(sketches.hll_rho(F.col("rest"))).collect()]
    assert got == [exp for _, exp in cases]


def test_hll_state_bounded_and_estimate_close(spark):
    # 20 distinct keys: registers <= 20, estimate within HLL small-n bias
    # (raw estimator overshoots below ~2.5m; just bound the state here).
    small = spark.createDataFrame(
        [("g", f"u{i % 20}") for i in range(300)], "grp string, key string")
    st = sketches.hll_state(small, "grp", "key")
    assert st.count() <= 20
    assert st.agg(F.max("r")).collect()[0][0] <= sketches.HLL_MAX_RHO

    # 5000 distinct keys >> m=1024: raw estimate within ~3 stderr
    # (1.04/sqrt(1024) ~ 3.3% stderr -> 10% band).
    big = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(5000)], "grp string, key string")
    row = sketches.hll_estimate(
        sketches.hll_state(big, "grp", "key"), "grp").collect()[0]
    assert row["registers_used"] <= sketches.HLL_M
    assert 4500 <= row["hll_est"] <= 5500


def test_hll_merge_states_equals_single_pass(spark):
    rows = [("g", f"k{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, key string")
    parts = [df.where(F.crc32(F.col("key")) % 3 == i) for i in range(3)]
    merged = sketches.hll_merge_states(
        *[sketches.hll_state(p, "grp", "key") for p in parts])
    direct = sketches.hll_state(df, "grp", "key")
    diff = (merged.withColumnRenamed("r", "mr")
            .join(direct, ["grp", "idx"], "full_outer")
            .where(~F.col("mr").eqNullSafe(F.col("r"))))
    assert diff.count() == 0
