"""Randomized pure-Python oracle for the join-key skew audit.

The invariant test covers totals and ordering on the fixture; this pass
recomputes the whole count-of-counts quantile pick (p50/p99 as the
minimal count whose cumulative key mass reaches the floor'd rank) in
pure Python over synthetic Zipf-skewed tables written as a temp fixture
directory — the exact math a 100 TB deployment would use to choose a
salting factor, so it must not drift by one rank position.

Round-10 hardening: the replay now also audits a STRING key column (the
in-row inline() stacking casts every key to string — a lossy long cast
would silently NULL-collapse non-numeric keys into one phantom hot key)
and an EMPTY table (the profile must still emit one n_keys=0 row per
label, matching the oracle's UNION ALL of scalar aggregates).
"""
from __future__ import annotations

import math
import random

from gcp_serverless_mapreduce_spark.suite import profiling_q
from gcp_serverless_mapreduce_spark.suite.profiling_q import (
    SKEW_KEYS,
    join_key_skew_profile,
)

RNG = random.Random(0x53EB)


def _zipf_keys(n_rows: int, n_keys: int) -> list[int]:
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    return RNG.choices(range(1, n_keys + 1), weights=weights, k=n_rows)


def _py_profile(keys: list) -> tuple:
    if not keys:
        return (0, None, None, None, None, None)
    per_key: dict = {}
    for k in keys:
        per_key[k] = per_key.get(k, 0) + 1
    n_keys, total, mx = len(per_key), len(keys), max(per_key.values())
    cc: dict[int, int] = {}
    for c in per_key.values():
        cc[c] = cc.get(c, 0) + 1
    cum, p50, p99 = 0, None, None
    for cnt in sorted(cc):
        cum += cc[cnt]
        if p50 is None and cum >= math.floor((n_keys + 1) / 2):
            p50 = cnt
        if p99 is None and cum >= math.floor((99 * n_keys + 99) / 100):
            p99 = cnt
    return (n_keys, total, mx, p50, p99, math.floor(mx * 10000 / total))


def test_skew_profile_fuzz_matches_python_recompute(
        spark, tmp_path, monkeypatch):
    # Production keys plus the two drift traps: a string-typed key and
    # a key over an empty base table.
    keys_under_test = SKEW_KEYS + [
        ("custdim.c_code", "custdim", "c_code"),
        ("emptytbl.k", "emptytbl", "k"),
    ]
    monkeypatch.setattr(profiling_q, "SKEW_KEYS", keys_under_test)

    # One synthetic frame per audited key column, each with its own
    # skew shape (including a no-skew uniform one and a single-key one).
    cols: dict[tuple[str, str], list] = {}
    shapes = [(300, 80), (250, 1), (400, 200), (120, 5), (500, 350)]
    for (label, tbl, col), (n_rows, n_keys) in zip(SKEW_KEYS, shapes):
        cols[(tbl, col)] = _zipf_keys(n_rows, n_keys)
    # String keys: Zipf over "C00001"-style codes — a long cast would
    # NULL every one of these out.
    cols[("custdim", "c_code")] = [
        f"C{v:05d}" for v in _zipf_keys(220, 40)]
    cols[("emptytbl", "k")] = []
    # NULL keys form their own group in Spark, DuckDB and the replay
    # alike (round-9 single-pass rewrite must preserve that): poke ~10%
    # NULLs into one column.
    k0 = cols[(SKEW_KEYS[3][1], SKEW_KEYS[3][2])]
    cols[(SKEW_KEYS[3][1], SKEW_KEYS[3][2])] = [
        None if i % 10 == 0 else v for i, v in enumerate(k0)]

    by_tbl: dict[str, dict[str, list]] = {}
    for (tbl, col), keys in cols.items():
        by_tbl.setdefault(tbl, {})[col] = keys
    for tbl, col_map in by_tbl.items():
        n = max(len(v) for v in col_map.values())
        names = sorted(col_map)
        rows = [tuple(col_map[c][i % len(col_map[c])] for c in names)
                for i in range(n)] if n else []
        # %-recycling shorter columns changes their distribution, so
        # re-derive the oracle input from what is actually written.
        for c in names:
            col_map[c] = [r[names.index(c)] for r in rows]
        schema = ", ".join(
            f"{c} string" if tbl == "custdim" else f"{c} long"
            for c in names)
        spark.createDataFrame(rows, schema).write.parquet(
            str(tmp_path / f"{tbl}.parquet"))

    got = {r["key_name"]: (r["n_keys"], r["total_rows"], r["max_cnt"],
                           r["p50_cnt"], r["p99_cnt"], r["top_share_bp"])
           for r in join_key_skew_profile(spark, str(tmp_path)).collect()}
    want = {label: _py_profile(by_tbl[tbl][col])
            for label, tbl, col in keys_under_test}
    assert got == want
