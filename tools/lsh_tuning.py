"""Regenerate the MinHash-LSH banding operating-point table in TUNING.md.

Sweeps the banding layout (bands x rows_per_band over the fixed
NUM_PERM-component signatures, plus the hot-bucket cap) of the
production candidate generator (`operators/dedup.lsh_candidate_pairs`)
at a given scale factor, measuring candidate-set precision and recall
against the exact Jaccard >= threshold truth set — the same comparison
`lsh_candidate_precision` pins for the deployed configuration only.
One warm JVM; the truth set is computed once and reused.

Usage: python tools/lsh_tuning.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (bands, rows_per_band) layouts of the same 8-permutation signature:
# more bands = higher recall / lower precision (S-curve moves left).
LAYOUTS = [(8, 1), (4, 2), (2, 4)]
CAPS = [16, 64, 256]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TUNING.md")

    from gcp_serverless_mapreduce_spark.operators import dedup
    from gcp_serverless_mapreduce_spark.session import get_spark
    from gcp_serverless_mapreduce_spark.suite import dedup_q as dq
    from gcp_serverless_mapreduce_spark.tables import load_table

    spark = get_spark("lsh-tuning")
    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(docs, dq.NUM_PERM)

    truth = {(r["doc_a"], r["doc_b"]) for r in
             dedup.jaccard_pairs(docs, dq.JACCARD_THRESHOLD,
                                 df_max=dq.JACCARD_DF_MAX)
             .select("doc_a", "doc_b").collect()}

    rows = []
    for bands, rpb in LAYOUTS:
        for cap in CAPS:
            t0 = time.time()
            cand = {(r["doc_a"], r["doc_b"]) for r in
                    dedup.lsh_candidate_pairs(sig, bands, rpb,
                                              max_bucket=cap)
                    .select("doc_a", "doc_b").collect()}
            wall = time.time() - t0
            caught = len(cand & truth)
            prec = caught / len(cand) if cand else None
            rec = caught / len(truth) if truth else None
            rows.append((bands, rpb, cap, len(cand), prec, rec, wall))
            print(f"bands={bands} rows={rpb} cap={cap} "
                  f"cand={len(cand)} precision={prec} recall={rec} "
                  f"wall={wall:.2f}s")

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(out_md), capture_output=True,
            text=True, check=True).stdout.strip()
    except Exception:
        sha = "unknown"

    def fmt(x):
        return "—" if x is None else f"{x:.3f}"

    lines = [
        "## MinHash-LSH banding operating point",
        "",
        f"Candidate-set precision/recall of the production near-dup "
        f"generator (`operators/dedup.lsh_candidate_pairs` over "
        f"{dq.NUM_PERM}-permutation signatures) vs the exact "
        f"Jaccard >= {dq.JACCARD_THRESHOLD} truth set "
        f"(df-capped inverted index) at `{sf_dir}` "
        f"({docs.count()} docs), one warm JVM.  "
        f"Regenerate: `python tools/lsh_tuning.py`.  @{sha}.",
        "",
        "| bands | rows/band | bucket cap | candidates | precision "
        "| recall | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for bands, rpb, cap, n, prec, rec, wall in rows:
        mark = (" **<- production**"
                if (bands, rpb, cap) == (dq.BANDS, dq.ROWS_PER_BAND,
                                         dq.MAX_BUCKET)
                else "")
        lines.append(f"| {bands} | {rpb} | {cap} | {n} | {fmt(prec)} "
                     f"| {fmt(rec)} | {wall:.2f}{mark} |")
    lines += [
        "",
        "Reading: rows/band steepens the S-curve — (8,1) banding "
        "admits any single-component collision (high recall, low "
        "precision, biggest candidate set), (2,4) requires 4 matching "
        "components per band (near-perfect precision, recall falls "
        "off below-threshold pairs), and the production (4,2) layout "
        "holds recall 1.0 on this corpus while cutting candidates "
        "vs (8,1).  The bucket cap barely moves precision/recall "
        "here because honest buckets sit far below it — it exists to "
        "bound the degenerate-boilerplate blowup, and the Zipf "
        "skew-stress test (tests/test_dedup_similarity.py) pins its "
        "recall floor when a bucket genuinely overflows.  Candidate "
        "count is the 100 TB cost driver: it is the row count of the "
        "pair join every downstream verify/cluster stage pays for.",
    ]
    from md_section import replace_section
    replace_section(out_md, "lsh-tuning", "\n".join(lines))
    print(f"wrote {out_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
