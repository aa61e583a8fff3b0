"""Generate an sf1 fixture (10x sf0.1) for the scaling decade check.

Usage: python tools/make_sf1.py [out_dir]      (default /tmp/sf1)

The driver's generator isn't available (TESTDATA.md: read-only, seed=42,
sf <= 0.1), so sf1 is TEN ID-SHIFTED REPLICAS of sf0.1: every fact table
is unioned 10 times with each copy's keys offset by copy_index *
(parent table's row count), so all ids stay DENSE 0..10n-1 (the
old_batch_row_count footer-arithmetic contract holds) and every foreign
key lands in its own copy's parent rows (per-copy join fan-outs are
identical to sf0.1's).  Dimension tables (region, nation) keep TPC-H
convention and do not scale.

Payload columns (text, embeddings, ts, props) are byte-identical across
copies — deliberately: cross-copy EXACT duplication models crawl/mirror
replication, the thing a 100 TB corpus actually contains, and it is the
stress case the capped-bucket dedup/ANN plans claim to bound (band
buckets grow 10x but pair generation stays <= cap^2 per bucket;
timestamps keep the same span so windows hold 10x rows in the same
window count).  SCALING_SF1.md documents where this shifts a query's
data-dependent output (e.g. every doc gains cross-copy exact partners).

Writes outside the repo (default /tmp/sf1, ~170 MB); regenerate on
demand — nothing under /root/testdata is touched.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> list of (column, parent_offset) shifts; parent_offset is the
# PARENT table's sf0.1 row count (ids are dense 0..n-1, verified below).
SHIFTS = {
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "lineitem": [("l_orderkey", 150_000), ("l_partkey", 20_000),
                 ("l_suppkey", 1_000)],
    "events": [("event_id", 100_000), ("user_id", 15_000)],
    "documents": [("doc_id", 5_000)],
    "embeddings": [("vec_id", 2_000)],
}
COPY_AS_IS = ["region", "nation"]
N_COPIES = 10


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        # Guard the contract the offsets rely on: every shifted column's
        # value domain must fit inside [0, parent_offset) or copies
        # would collide / point across copies.
        n = con.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for c, off in shifts:
            lo, hi = con.execute(
                f"SELECT min({c}), max({c}) "
                f"FROM '{SRC}/{t}.parquet'").fetchone()
            assert 0 <= lo and hi < off, (t, c, lo, hi, off)
        shifted = {c: f"({c} + i * {off})" for c, off in shifts}
        sel = ", ".join(
            f"CAST({shifted[c]} AS BIGINT) AS {c}" if c in shifted else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"range({N_COPIES}) c(i) ORDER BY i) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        n1 = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} -> {n1}")
        assert n1 == n * N_COPIES
    return 0


if __name__ == "__main__":
    sys.exit(main())
