"""Randomized pure-Python oracle for the median/MAD outlier screen.

Exact medians are the classic cross-engine trap (interpolation rule,
even/odd counts, duplicate-heavy distributions), so this recomputes the
whole query — cent quantization, interpolating median, MAD, the 3-MAD
cut and the rate — in pure Python over synthetic heavy-tailed event
values with injected spikes, including an all-constant type (MAD 0, so
EVERY deviating row is an outlier) and a two-row type.
"""
from __future__ import annotations

import random
import statistics

from gcp_serverless_mapreduce_spark.suite.profiling_q import (
    value_outliers_mad,
)

RNG = random.Random(0x3AD)


def _py_mad(rows: list[tuple[str, float]]) -> dict[str, tuple]:
    by_t: dict[str, list[int]] = {}
    for t, v in rows:
        by_t.setdefault(t, []).append(round(v * 100))
    out = {}
    for t, vcs in by_t.items():
        med = float(statistics.median(vcs))
        adevs = [abs(float(vc) - med) for vc in vcs]
        mad = float(statistics.median(adevs))
        n_out = sum(1 for a in adevs if a > 3 * mad)
        out[t] = (len(vcs), round(med, 4), round(mad, 4), n_out,
                  round(n_out / len(vcs), 6))
    return out


def test_mad_outliers_fuzz_matches_python(spark, tmp_path):
    rows: list[tuple[str, float]] = []
    for ti in range(4):
        t = f"t{ti}"
        n = RNG.choice([2, 7, 40, 81])
        base = RNG.randrange(100, 10_000)
        for _ in range(n):
            cents = base + RNG.randrange(-50, 51)
            if RNG.random() < 0.08:
                cents *= RNG.randrange(10, 100)  # injected spike
            rows.append((t, cents / 100.0))
    rows += [("const", 7.77)] * 9 + [("const", 9.99)]  # MAD 0 stratum
    spark.createDataFrame(rows, "event_type string, value double") \
        .write.parquet(str(tmp_path / "events.parquet"))

    got = {r["event_type"]: (r["n_events"], r["median_cents"],
                             r["mad_cents"], r["n_outliers"],
                             r["outlier_rate"])
           for r in value_outliers_mad(spark, str(tmp_path)).collect()}
    assert got == _py_mad(rows)
