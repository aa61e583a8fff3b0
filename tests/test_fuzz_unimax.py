"""Randomized pure-Python oracle for the UniMax water-filling allocator.

tests/test_relational_extras.py pins the three regimes by hand and the
DuckDB twin proves cross-engine agreement; this fuzz pass checks the
closed form itself against an INDEPENDENT iterative water-filler (the
textbook algorithm: give every active language the uniform level,
freeze the ones whose cap is below it, redistribute the residual) over
random corpus shapes, plus the allocation invariants.
"""
from __future__ import annotations

import random

import pytest

from gcp_serverless_mapreduce_spark.operators.curation import (
    unimax_language_budget,
)

RNG = random.Random(0x714)


def _iterative_waterfill(caps: dict[str, float],
                         budget: float) -> dict[str, float]:
    alloc: dict[str, float] = {}
    active = dict(caps)
    remaining = budget
    while active:
        level = remaining / len(active)
        frozen = {g: c for g, c in active.items() if c <= level}
        if not frozen:
            return alloc | {g: level for g in active}
        for g, c in frozen.items():
            alloc[g] = c
            remaining -= c
            del active[g]
    return alloc


@pytest.mark.parametrize("trial", range(12))
def test_unimax_matches_iterative_waterfill(spark, trial):
    n_langs = RNG.randrange(1, 9)
    rows = []
    for li in range(n_langs):
        # 1-4 docs per language, char counts spanning 4 orders of
        # magnitude so some trials cap every language and others none.
        for d in range(RNG.randrange(1, 5)):
            rows.append((f"L{trial}_{li}", RNG.randrange(1, 10_000)))
    frac = RNG.choice([0.1, 0.5, 1.0, 1.5, 3.0])
    epochs = RNG.choice([0.5, 1.0, 2.0])
    df = spark.createDataFrame(rows, "lang string, n_chars long")

    got = {r["lang"]: r for r in
           unimax_language_budget(df, budget_frac=frac,
                                  max_epochs=epochs).collect()}

    chars = {}
    for lang, n in rows:
        chars[lang] = chars.get(lang, 0) + n
    budget = sum(chars.values()) * frac
    want = _iterative_waterfill(
        {g: c * epochs for g, c in chars.items()}, budget)

    assert set(got) == set(want)
    for g, r in got.items():
        # 4-decimal rounding on the Spark side -> half-ulp tolerance,
        # widened for float-order differences between the two solvers.
        assert r["alloc_chars"] == pytest.approx(want[g], abs=1e-3), \
            (trial, g, dict(chars), frac, epochs)
        assert r["cap_chars"] == pytest.approx(chars[g] * epochs, abs=1e-3)
        assert r["alloc_chars"] <= r["cap_chars"] + 1e-3
        assert r["epochs"] <= epochs + 1e-5
        assert r["chars_total"] == chars[g]
    total = sum(r["alloc_chars"] for r in got.values())
    assert total == pytest.approx(
        min(budget, sum(c * epochs for c in chars.values())), abs=1e-2)
