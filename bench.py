"""Benchmark harness — the driver runs this per-round and records the JSON.

Times every registered query (the full SURVEY §2 + LLM-pipeline suite) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, materializing each result with ``collect()``
(results are aggregates — small), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Context vs BASELINE.md: the reference's only published number is the 43 MB
anagram job in <20 s (≈2.15 MB/s).  ``anagram_groups``/``anagram_pairs``
below are that same pipeline (tokenize → per-doc distinct → normalize →
signature → set-agg → having) over the fixture corpus, so their per-query
seconds are the direct comparable; the rest of the suite is the added
relational/dedup surface the reference lacks.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e
    from gcp_serverless_mapreduce_spark.session import get_spark

    spark = get_spark("bench")

    # untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    # whichever query happens to run first
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").collect()
    # Spark ML class loading (~4 s, one-time) must not bill to the first
    # KMeans-using query
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    _toy = (spark.range(32).selectExpr("cast(array(id, id+1) as array<double>) arr")
            .withColumn("features", array_to_vector("arr")))
    KMeans(k=2, seed=1, maxIter=1, featuresCol="features").fit(_toy)

    # Each query is timed TWICE and reported as min(run1, run2): the first
    # execution of a family pays one-time Python-worker spawn / Arrow
    # serializer / codegen warm-up, which otherwise bills to whichever
    # family the registration rotation put first (round 2: the dedup
    # family appeared 2-3x slower than its warm SCALING.md numbers purely
    # from running first).  min() makes per-query numbers
    # rotation-invariant and cross-round comparable; both runs land in
    # BENCH_DETAIL.json.
    # Machine-load stamps: the r8->r9 driver bench moved 15% on zero code
    # change (uniform inflation across unrelated families = a loaded box).
    # getloadavg() before/after lets the next judge separate regression
    # from contention without an investigation.
    load_before = [round(x, 2) for x in os.getloadavg()]
    t_suite0 = time.perf_counter()

    from gcp_serverless_mapreduce_spark.streaming import pipeline as _sp

    runs: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    # Per-(query, attempt) streaming progress: how much of the wall was
    # micro-batch execution vs harness overhead (query start/stop,
    # availableNow termination latency, rate-replay polling).  Streaming
    # walls are trigger-wait dominated and load-sensitive; compute_ms is
    # the round-over-round comparable number.
    stream_attempts: dict[str, list[dict]] = {}
    for attempt in range(2):
        for name, fn in e.queries().items():
            n_stats0 = len(_sp.RUN_STATS)
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                dt = round(time.perf_counter() - t0, 3)
            except Exception as ex:  # a failed query must not hide the rest
                print(f"bench: {name} FAILED (run {attempt + 1}): {ex}",
                      file=sys.stderr)
                dt = -1.0
            runs.setdefault(name, []).append(dt)
            new_stats = _sp.RUN_STATS[n_stats0:]
            if new_stats and dt >= 0:
                stream_attempts.setdefault(name, []).append({
                    "wall_s": dt,
                    "batches": sum(s["batches"] for s in new_stats),
                    "input_rows": sum(s["input_rows"] for s in new_stats),
                    "compute_ms": sum(s["trigger_exec_ms"]
                                      for s in new_stats),
                    "add_batch_ms": sum(s["add_batch_ms"]
                                        for s in new_stats),
                    # driver-timed batch-side builds of hybrid queries
                    # (static probe indexes, Lloyd training, replay-sort)
                    # — counted into the adjusted total (ADVICE r12)
                    "batch_side_ms": sum(s.get("batch_side_ms", 0)
                                         for s in new_stats),
                })
    spreads: dict[str, float] = {}
    for name, pair in runs.items():
        ok = [t for t in pair if t >= 0]
        timings[name] = min(ok) if ok else -1.0
        # per-query spread (max-min across attempts): the r12->r11 bench
        # drift was unexplainable from plans; spread separates "the query
        # got slower" (both attempts moved) from "one attempt hit a loaded
        # moment" (spread ~= the drift).  Round-13 verdict task 3.
        spreads[name] = round(max(ok) - min(ok), 3) if len(ok) > 1 else -1.0
    streaming_breakdown: dict[str, dict] = {}
    for name, attempts in stream_attempts.items():
        best = min(attempts, key=lambda a: a["wall_s"])
        streaming_breakdown[name] = dict(
            best,
            overhead_s=round(best["wall_s"] - best["compute_ms"] / 1000
                             - best.get("batch_side_ms", 0) / 1000, 3))

    # Flagship smoke at the SUITE's scale: entry() itself runs the
    # anagram pipeline over the sf0.001 smoke fixture; this row times the
    # same flagship callable over the bench sf_dir so the headline
    # 43 MB-corpus number (BASELINE_RESULT.json) has a same-fixture-family
    # companion that moves with the suite.
    from gcp_serverless_mapreduce_spark import suite
    entry_runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        suite.anagram_groups(spark, sf_dir).collect()
        entry_runs.append(round(time.perf_counter() - t0, 3))

    load_after = [round(x, 2) for x in os.getloadavg()]
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Compute-adjusted total: streaming walls are dominated by fixed
    # harness costs (query start/stop, first-use Python-datasource
    # spin-up, availableNow termination latency) that are load-sensitive
    # and NOT plan quality — substitute each streaming query's measured
    # micro-batch compute for its wall so round-over-round comparisons
    # track the number that actually responds to plan changes
    # (round-11 verdict item 2).
    stream_wall = round(sum(b["wall_s"]
                            for b in streaming_breakdown.values()), 3)
    stream_compute = round(sum(b["compute_ms"] + b.get("batch_side_ms", 0)
                               for b in streaming_breakdown.values()) / 1000,
                           3)
    total_compute_adj = round(total - stream_wall + stream_compute, 3)

    # Full-precision per-query detail goes to a sidecar file; stdout gets
    # ONE compact JSON line that must fit the driver's 2000-char tail
    # capture WHOLE (round 1's full dict overflowed it -> "parsed": null).
    # Slowest queries first, dict truncated to the budget; headline fields
    # lead so the line is self-describing even in a narrower window.
    # r16 (verdict task 6, additions-only): the SAME detail dict is also
    # written to BENCH_DETAIL_c{cpus}.json so the driver's second
    # (low-core) scaling run stops clobbering the 32-core per-attempt
    # detail.  BENCH_DETAIL.json keeps its existing semantics (last run
    # wins) for every current consumer; the stdout contract and timing
    # methodology are untouched.
    detail = {"metric": "suite_wall_clock", "value": total,
                   "unit": "sec", "sf": sf,
                   "value_compute_adjusted": total_compute_adj,
                   # ADVICE r12: the adjustment swaps each streaming
                   # query's wall for its micro-batch trigger compute
                   # PLUS the driver-timed batch-side builds
                   # (batch_side_ms: static probe indexes, Lloyd
                   # training, replay-sort — timed_batch_side call
                   # sites).  Still excluded: POST-sink finalize
                   # aggregations over the memory sink (they execute
                   # lazily at collect() outside the trigger; small —
                   # a groupBy over the already-materialized sink rows)
                   # — so the adjusted number remains a slight lower
                   # bound for hybrid queries, comparable round-over-
                   # round since the hybrid set is stable.
                   "compute_adjusted_excludes":
                       "post-sink finalize aggs of hybrid queries",
                   "streaming_wall_s": stream_wall,
                   "streaming_compute_s": stream_compute,
                   "method": "min_of_2_single_jvm",
                   "loadavg_before": load_before,
                   "loadavg_after": load_after,
                   "suite_wall_both_runs": round(
                       time.perf_counter() - t_suite0, 1),
                   "entry_at_sf_dir": {"runs": entry_runs,
                                       "min2": min(entry_runs)},
                   "queries": timings,
                   "spread": spreads,
                   "streaming_breakdown": streaming_breakdown,
                   "runs": runs}
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count())
    for fname in ("BENCH_DETAIL.json", f"BENCH_DETAIL_c{cpus}.json"):
        with open(os.path.join(here, fname), "w") as fh:
            json.dump(detail, fh, indent=1)

    ok_spreads = sorted(v for v in spreads.values() if v >= 0)
    spread_total = round(sum(ok_spreads), 2)
    spread_p90 = (round(ok_spreads[int(0.9 * (len(ok_spreads) - 1))], 2)
                  if ok_spreads else -1.0)
    head = {"metric": "suite_wall_clock", "value": total, "unit": "sec",
            "sf": sf, "n_queries": len(timings),
            "compute_adj": total_compute_adj,
            "spread_total": spread_total, "spread_p90": spread_p90,
            "load1m": [load_before[0], load_after[0]]}
    budget = 1900 - len(json.dumps(head, separators=(",", ":")))
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    shown: dict[str, float] = {}
    used = len('"queries":{},"queries_omitted":00')
    for name, t in slowest:
        entry = len(f'"{name}":{round(t, 2)},')
        if used + entry > budget:
            break
        shown[name] = round(t, 2)
        used += entry
    head["queries"] = shown
    head["queries_omitted"] = len(timings) - len(shown)
    print(json.dumps(head, separators=(",", ":")))
    return 1 if any(t < 0 for t in timings.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
