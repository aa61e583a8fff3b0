"""Regenerate SCALING.md from two bench detail JSONs (sf0.01 and sf0.1).

Usage: python tools/scaling_report.py <detail_sf001.json> <detail_sf01.json>

Expects the BENCH_DETAIL.json format written by bench.py (per-query min of
two runs, so the ratios compare WARM executions — Python-worker/Arrow/
codegen warm-up doesn't bill to whichever family runs first).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    with open(sys.argv[1]) as fh:
        small = json.load(fh)
    with open(sys.argv[2]) as fh:
        big = json.load(fh)
    qs, qb = small["queries"], big["queries"]
    names = [n for n in qb if n in qs and qs[n] > 0 and qb[n] > 0]
    rows = sorted(names, key=lambda n: -(qb[n] / qs[n]))
    lines = [
        "# SCALING — measured per-query scaling, "
        f"sf{small['sf']} → sf{big['sf']} ({big['sf'] / small['sf']:.0f}× data)",
        "",
        f"Same machine (local[32]), same suite (`bench.py`, per-query "
        f"min of two runs — warm numbers).  Totals: {small['value']}s at "
        f"sf{small['sf']} → {big['value']}s at sf{big['sf']} for "
        f"{len(names)} queries.",
        "`ratio` = t(sf0.1) / t(sf0.01); ~1 means fixed overhead dominates,",
        "~10 means compute-bound linear scaling; sub-linear ratios on 10× data",
        "mean per-query constants (JVM, planning, parquet footers) still",
        "dominate at this scale.",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | ratio |",
        "|---|---|---|---|",
    ]
    for n in rows:
        lines.append(f"| {n} | {qs[n]} | {qb[n]} | {qb[n] / qs[n]:.2f} |")
    with open("SCALING.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote SCALING.md ({len(names)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
