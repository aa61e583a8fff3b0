"""Regenerate the join-key skew-profile stacking A/B table in TUNING.md.

Round 10's losslessness fix (stack every audited key as STRING so a
future date/string key can't truncate to NULL) cost 1.54x at sf0.1:
every numeric key paid a long->string cast before the big hash
aggregate, and the shuffled (key_name, val) rows got wider.  Round 11's
dual-typed stack keeps the guarantee — integral keys ride a LONG lane,
everything else a STRING lane, and the lanes union AFTER the per-lane
aggregate where only (key_name, cnt) survives — so the numeric fast
path is back without reopening the truncation hole.

This tool measures both variants end-to-end (full query, collect) in
one warm JVM, alternated min-of-k, asserts identical results, and
rewrites the "skew-stack-ab" section of TUNING.md.

Usage: python tools/skew_stack_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 3


def run_variant(spark, sf_dir: str, dual_typed: bool):
    """The full skew-profile query on top of the chosen stacking."""
    from pyspark.sql import Window

    from pyspark.sql import functions as F
    from gcp_serverless_mapreduce_spark.suite.profiling_q import (
        SKEW_KEYS, _stacked_key_counts)
    cnts = _stacked_key_counts(spark, sf_dir, dual_typed=dual_typed)
    cc = cnts.groupBy("key_name", "cnt").agg(F.count(F.lit(1)).alias("k"))
    w_all = Window.partitionBy("key_name")
    w_cum = w_all.orderBy("cnt")
    cum = (cc.withColumn("cum", F.sum("k").over(w_cum))
           .withColumn("nk", F.sum("k").over(w_all)))
    agg = (cum.groupBy("key_name")
           .agg(F.sum("k").cast("long").alias("n_keys"),
                F.sum(F.col("cnt") * F.col("k")).cast("long")
                .alias("total_rows"),
                F.max("cnt").cast("long").alias("max_cnt"),
                F.min(F.when(
                    F.col("cum") >= F.floor((F.col("nk") + 1) / 2),
                    F.col("cnt"))).cast("long").alias("p50_cnt"),
                F.min(F.when(
                    F.col("cum") >= F.floor(
                        (99 * F.col("nk") + 99) / 100),
                    F.col("cnt"))).cast("long").alias("p99_cnt")))
    labels = spark.createDataFrame(
        [(label,) for label, _, _ in SKEW_KEYS], "key_name string")
    return (labels.join(F.broadcast(agg), "key_name", "left")
            .select("key_name",
                    F.coalesce("n_keys", F.lit(0)).cast("long")
                    .alias("n_keys"),
                    "total_rows", "max_cnt", "p50_cnt", "p99_cnt",
                    F.floor(F.col("max_cnt") * 10000
                            / F.col("total_rows")).cast("long")
                    .alias("top_share_bp")))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TUNING.md")

    from gcp_serverless_mapreduce_spark.session import get_spark
    spark = get_spark("skew-stack-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    variants = {
        "r10: all-string stack (one lane, long->string cast)": False,
        "r11: dual-typed lanes (long lane + string lane)": True,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    results: dict[str, frozenset] = {}
    for _ in range(ROUNDS):
        for name, dual in variants.items():
            t0 = time.monotonic()
            rows = run_variant(spark, sf_dir, dual).collect()
            times[name].append(time.monotonic() - t0)
            got = frozenset(tuple(r) for r in rows)
            if name in results:
                assert results[name] == got, f"{name}: nondeterministic"
            results[name] = got
    vals = list(results.values())
    assert all(v == vals[0] for v in vals), "variants disagree on results"

    lines = [
        "### Join-key skew-profile stacking A/B (tools/skew_stack_ab.py)",
        "",
        f"Full `join_key_skew_profile` (collect) at `{sf_dir}`, min of "
        f"{ROUNDS} alternated runs in one warm JVM; both variants "
        "verified result-identical.  All five audited keys are BIGINT, "
        "so the dual-typed variant runs entirely in the long lane here; "
        "the string lane only materializes once a string/date key is "
        "audited.",
        "",
        "| variant | min wall (s) | runs (s) |",
        "|---|---|---|",
    ]
    for name in variants:
        ts = times[name]
        lines.append(
            f"| {name} | {min(ts):.2f} | "
            f"{', '.join(f'{t:.2f}' for t in ts)} |")
    a, b = (min(times[n]) for n in variants)
    ratio = a / b if b else float("inf")
    lines += [
        "",
        f"Dual-typed is {ratio:.2f}x the all-string stack at this "
        "scale.  The win is the hash aggregate: LONG group keys hash "
        "and compare as fixed 8-byte values inside codegen and the "
        "shuffled (key_name, val) rows stay narrow, while the string "
        "stack pays a per-row long->string render plus variable-length "
        "hashing on the audit's hottest path.  Losslessness is "
        "preserved structurally: a non-integral audited column lands "
        "in the string lane (never a lossy cast), and the lanes union "
        "only after aggregation where the value column is already "
        "gone.  Kept: dual-typed lanes in production.",
    ]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from md_section import replace_section  # noqa: E402
    replace_section(out_md, "skew-stack-ab", "\n".join(lines))
    print("\n".join(lines))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
