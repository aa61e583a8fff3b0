"""Regenerate the clustering-layout pruning table in TUNING.md.

`zorder_layout_keys` / `hilbert_layout_keys` claim their value in
row-group pruning; this tool turns that claim into a measured number on
REAL written files.  For each candidate layout of the orders table —

- hilbert : repartitionByRange + sortWithinPartitions on hilbert_key
- zorder  : same on zorder_key
- custkey : single-column sort (perfect on custkey, scatters day)
- day     : single-column sort (perfect on day, scatters custkey)

— it writes `N_FILES` parquet files, reads each file's (o_custkey,
day_no) min/max straight from the parquet FOOTER statistics (exactly
what a scan planner prunes with), and replays three predicate families
against those boxes: a custkey range, an order-day range, and the
conjunction.  `files read` = files whose footer box intersects the
predicate box — a file-level proxy for row-group pruning with zero
data I/O.  Deterministic (seeded ranges, fixed widths).

Usage: python tools/layout_pruning.py [sf_dir]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 64
N_PREDICATES = 200
# Predicate widths as a fraction of each dimension's domain: narrow
# enough that a perfectly clustered layout prunes most files, wide
# enough that every layout keeps a few.
WIDTH_FRAC = 0.02


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gcp_serverless_mapreduce_spark.operators import layout
    from gcp_serverless_mapreduce_spark.session import get_spark
    from gcp_serverless_mapreduce_spark.suite.layout_q import DATE_EPOCH
    from gcp_serverless_mapreduce_spark.tables import load_table

    spark = get_spark("layout-pruning")
    orders = load_table(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate").cast("date"),
                        F.lit(DATE_EPOCH).cast("date")).cast("long")
    base = orders.select("o_custkey", day_no.alias("day_no"))

    layouts = {
        "hilbert(custkey, day)": layout.hilbert_key(
            F.col("o_custkey"), F.col("day_no")),
        "zorder(custkey, day)": layout.zorder_key(
            F.col("o_custkey"), F.col("day_no")),
        "sort(custkey)": F.col("o_custkey"),
        "sort(day)": F.col("day_no"),
    }

    lo = base.agg(F.min("o_custkey"), F.max("o_custkey"),
                  F.min("day_no"), F.max("day_no")).collect()[0]
    ck_lo, ck_hi, d_lo, d_hi = (int(v) for v in lo)
    ck_w = max(1, int((ck_hi - ck_lo) * WIDTH_FRAC))
    d_w = max(1, int((d_hi - d_lo) * WIDTH_FRAC))
    rng = random.Random(0x1A7007)
    ck_ranges = [(s := rng.randint(ck_lo, ck_hi - ck_w), s + ck_w)
                 for _ in range(N_PREDICATES)]
    d_ranges = [(s := rng.randint(d_lo, d_hi - d_w), s + d_w)
                for _ in range(N_PREDICATES)]

    results = {}
    tmp = tempfile.mkdtemp(prefix="layout_pruning_")
    try:
        for name, key in layouts.items():
            out = os.path.join(tmp, name.replace("(", "_")
                               .replace(")", "").replace(", ", "_"))
            (base.withColumn("_k", key)
             .repartitionByRange(N_FILES, "_k")
             .sortWithinPartitions("_k")
             .drop("_k")
             .write.mode("overwrite").parquet(out))
            boxes = []
            for fname in os.listdir(out):
                if not fname.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(out, fname)).metadata
                cols = {md.schema.column(i).name: i
                        for i in range(md.num_columns)}
                ck0 = ck1 = dd0 = dd1 = None
                for rg in range(md.num_row_groups):
                    cst = md.row_group(rg).column(
                        cols["o_custkey"]).statistics
                    dst = md.row_group(rg).column(
                        cols["day_no"]).statistics
                    ck0 = cst.min if ck0 is None else min(ck0, cst.min)
                    ck1 = cst.max if ck1 is None else max(ck1, cst.max)
                    dd0 = dst.min if dd0 is None else min(dd0, dst.min)
                    dd1 = dst.max if dd1 is None else max(dd1, dst.max)
                if ck0 is not None:
                    boxes.append((ck0, ck1, dd0, dd1))

            def frac(pred):
                hit = sum(1 for b in boxes if pred(b))
                return hit / len(boxes)

            ck_read = sum(
                frac(lambda b, lo=lo_, hi=hi_: b[0] <= hi and b[1] >= lo)
                for lo_, hi_ in ck_ranges) / N_PREDICATES
            d_read = sum(
                frac(lambda b, lo=lo_, hi=hi_: b[2] <= hi and b[3] >= lo)
                for lo_, hi_ in d_ranges) / N_PREDICATES
            both_read = sum(
                frac(lambda b, cl=cl, ch=ch, dl=dl, dh=dh:
                     b[0] <= ch and b[1] >= cl and b[2] <= dh and b[3] >= dl)
                for (cl, ch), (dl, dh) in zip(ck_ranges, d_ranges)
            ) / N_PREDICATES
            results[name] = (len(boxes), ck_read, d_read, both_read)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "### Clustering-layout file pruning (tools/layout_pruning.py)",
        "",
        f"Orders at `{sf_dir}` written as {N_FILES} files per layout "
        "(`repartitionByRange(key).sortWithinPartitions(key)`), file "
        "min/max boxes read from the parquet FOOTERS, then "
        f"{N_PREDICATES} seeded range predicates per family "
        f"(width {WIDTH_FRAC:.0%} of each domain) replayed against the "
        "boxes.  `files read` = mean fraction of files whose footer box "
        "intersects the predicate — what a min/max-pruning scan "
        "planner must open.",
        "",
        "| layout | files | custkey range | day range | both (AND) |",
        "|---|---|---|---|---|",
    ]
    for name, (nf, ck_read, d_read, both_read) in results.items():
        lines.append(f"| {name} | {nf} | {ck_read:.1%} | {d_read:.1%} "
                     f"| {both_read:.1%} |")
    hz = results["hilbert(custkey, day)"]
    zz = results["zorder(custkey, day)"]
    lines += [
        "",
        "Reading: the single-column sorts are the bounds — near-perfect "
        "on their own column, no pruning at all on the other.  Both "
        "space-filling curves buy real pruning on BOTH dimensions at "
        "once; Hilbert's tighter boxes (no quadrant-seam jumps) show up "
        f"as {hz[3]:.1%} vs Z-order's {zz[3]:.1%} files read on the "
        "conjunctive predicate — the workload multi-dimensional "
        "clustering exists for.  A workload that only ever filters one "
        "column should just sort by it; the curves are for mixed "
        "predicates, and Hilbert is the better default of the two at "
        "identical cost (both are one codegen'd integer fold).",
    ]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from md_section import replace_section  # noqa: E402
    replace_section(os.path.join(repo, "TUNING.md"),
                    "layout-pruning", "\n".join(lines))
    print("\n".join(lines))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
