"""Head-to-head against the reference's ONE published number:
100 Gutenberg books ≈ 43 MB → anagram job in < 20 s (README.md:28,
≈ 2.15 MB/s across ~7×N Cloud Function instances).

Generates a deterministic 43 MB Gutenberg-style corpus (headers, footers,
Latin-1 bytes, real anagram families), runs the EXACT reference job —
corpus scan → ISO-8859-1 decode → header/footer strip → tokenize →
per-book distinct → normalize → signature → set-agg → HAVING → sort →
partitioned formatted text sink — and prints one JSON line with wall
clock and MB/s next to the baseline.

Usage: python tools/bench_baseline.py [n_books] [out_json]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_SECONDS = 20.0
BASELINE_MB = 43.0

# vocabulary with real anagram families so the output is non-trivial
FAMILIES = [
    ["race", "care", "acre"], ["part", "trap", "rapt"], ["ate", "eat", "tea"],
    ["listen", "silent", "enlist"], ["night", "thing"], ["stop", "pots", "spot"],
    ["dear", "read", "dare"], ["angel", "glean"], ["state", "taste"],
    ["least", "steal", "tales"], ["notes", "stone", "tones"],
]
FILLER = ("the quick brown fox jumps over lazy dog with cæsar's naïve "
          "garçon reading books under pale moonlight near quiet rivers").split()


def generate_corpus(path: str, n_books: int, target_bytes: int) -> int:
    os.makedirs(path, exist_ok=True)
    rng = random.Random(42)
    words = [w for fam in FAMILIES for w in fam] + FILLER
    per_book = target_bytes // n_books
    total = 0
    for i in range(n_books):
        fp = os.path.join(path, f"book{i:03d}.txt")
        if os.path.exists(fp):
            total += os.path.getsize(fp)
            continue
        chunks = [f"Book {i} front matter junk\n"
                  "*** START OF THIS PROJECT GUTENBERG EBOOK ***\n"]
        size = 0
        while size < per_book:
            line = " ".join(rng.choices(words, k=12)) + "\n"
            chunks.append(line)
            size += len(line)
        chunks.append("End of the Project Gutenberg EBook trailing junk\n")
        data = "".join(chunks).encode("ISO-8859-1", errors="ignore")
        with open(fp, "wb") as fh:
            fh.write(data)
        total += len(data)
    return total


def main() -> int:
    n_books = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    corpus = "/tmp/spark_graft_gutenberg"
    out = "/tmp/spark_graft_anagrams_out"

    from gcp_serverless_mapreduce_spark.operators.anagram import anagram_pipeline
    from gcp_serverless_mapreduce_spark.session import get_spark
    from gcp_serverless_mapreduce_spark.sources.text import (
        read_gutenberg_corpus, write_anagram_sink)

    nbytes = generate_corpus(corpus, n_books, int(BASELINE_MB * 1e6))
    spark = get_spark("bench-baseline")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # Measurement protocol (round-6 verdict item 5 — the 5.6 vs 6.4 s
    # headline drift was run-1 JIT/JVM variance): the full job runs
    # N_RUNS times in one process; the headline is the MEDIAN, and the
    # first-run (cold-plan) and spread numbers are pinned alongside so
    # a future re-measure compares like with like.
    N_RUNS = 3
    runs = []
    for _ in range(N_RUNS):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        docs = read_gutenberg_corpus(spark, corpus).withColumnRenamed(
            "path", "doc_id").withColumnRenamed("content", "text")
        groups = anagram_pipeline(docs, gutenberg=True)
        write_anagram_sink(groups, out, num_partitions=5)
        runs.append(time.perf_counter() - t0)

    n_groups = sum(1 for p in os.listdir(out) if p.startswith("part-")
                   for _ in open(os.path.join(out, p)))
    elapsed = sorted(runs)[len(runs) // 2]
    result = {
        "metric": "anagram_job_43mb",
        "value": round(elapsed, 2),
        "unit": "sec",
        "input_mb": round(nbytes / 1e6, 1),
        "throughput_mb_s": round(nbytes / 1e6 / elapsed, 2),
        "baseline_sec": BASELINE_SECONDS,
        "baseline_mb_s": round(BASELINE_MB / BASELINE_SECONDS, 2),
        "speedup_vs_baseline": round(BASELINE_SECONDS / elapsed, 1),
        "anagram_groups_written": n_groups,
        "runs_sec": [round(r, 2) for r in runs],
        "methodology": "median of 3 back-to-back runs, one JVM "
                       "(local[32], 1M-row warmup query first); "
                       "run 1 carries plan-compilation cost",
    }
    print(json.dumps(result))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump(result, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
