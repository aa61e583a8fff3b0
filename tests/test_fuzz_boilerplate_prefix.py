"""Randomized pure-Python oracle for the boilerplate-prefix profile.

Recomputes the whole query — tokenization (lower/trim/split-on-\\s+),
the per-(source, k) modal prefix with its count-desc-then-lexicographic
tie-break, the >=k-token denominator, and the basis-point share — in
pure Python over synthetic corpora with templated and non-templated
sources, messy whitespace, mixed case, and docs shorter than the rung.
"""
from __future__ import annotations

import random
import re

from gcp_serverless_mapreduce_spark.suite.curation_q import (
    PREFIX_KS,
    source_boilerplate_prefix,
)

RNG = random.Random(0xB01)
VOCAB = ["Alpha", "beta", "GAMMA", "delta", "ep", "zeta", "x"]
WS = [" ", "  ", "\t", " \t "]


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def _py_modal(docs: list[tuple[str, str]]) -> dict[tuple[str, int], tuple]:
    out = {}
    for k in PREFIX_KS:
        per_src: dict[str, dict[str, int]] = {}
        for src, text in docs:
            toks = _py_tokens(text)
            if len(toks) >= k:
                pfx = " ".join(toks[:k])
                per_src.setdefault(src, {})[pfx] = \
                    per_src.get(src, {}).get(pfx, 0) + 1
        for src, cnts in per_src.items():
            n_docs = sum(cnts.values())
            pfx, cnt = min(cnts.items(), key=lambda it: (-it[1], it[0]))
            out[(src, k)] = (pfx, cnt, n_docs, cnt * 10000 // n_docs)
    return out


def test_boilerplate_prefix_fuzz_matches_python(spark, tmp_path):
    docs = []
    for si in range(5):
        src = f"s{si}"
        template = [RNG.choice(VOCAB) for _ in range(RNG.randrange(2, 9))]
        templated_p = RNG.choice([0.0, 0.4, 0.9])
        for di in range(RNG.randrange(5, 40)):
            n = RNG.randrange(0, 13)
            body = [RNG.choice(VOCAB) for _ in range(n)]
            if RNG.random() < templated_p:
                body = template + body
            text = RNG.choice(WS).join(body) + RNG.choice(["", " ", "\t"])
            docs.append((src, text))
    spark.createDataFrame(docs, "source string, text string") \
        .write.parquet(str(tmp_path / "documents.parquet"))

    got = {(r["source"], r["k"]): (r["prefix"], r["cnt"], r["n_docs"],
                                   r["share_bp"])
           for r in source_boilerplate_prefix(spark, str(tmp_path))
           .collect()}
    assert got == _py_modal(docs)
