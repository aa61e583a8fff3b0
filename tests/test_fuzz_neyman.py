"""Randomized pure-Python oracle for the Neyman allocation sampler.

The directional test (bigger/more-variable strata get more slots) and
the DuckDB twin cover the fixture; this fuzz pass recomputes the ENTIRE
query — exact moment sums, the floor-quantized N_h*sigma_h weight, the
budget split, the md5-rank pick, and the order-canonical sample
fingerprint — in pure Python over random synthetic corpora written as a
temp fixture directory, including the degenerate strata (constant
length -> sigma 0 -> allocation 0 -> dropped from the output).
"""
from __future__ import annotations

import hashlib
import math
import random

from gcp_serverless_mapreduce_spark.suite.curation_q import (
    NEYMAN_BUDGET,
    NEYMAN_Q,
    neyman_allocation_sample,
)

RNG = random.Random(0x4E59)


def _py_neyman(rows: list[tuple[str, int, int]]) -> dict[str, tuple]:
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for lang, doc_id, n_chars in rows:
        by_lang.setdefault(lang, []).append((doc_id, n_chars))
    w_q = {}
    for lang, docs in by_lang.items():
        nd = float(len(docs))
        s1 = float(sum(c for _, c in docs))
        s2 = float(sum(c * c for _, c in docs))
        sigma = math.sqrt((s2 - s1 * s1 / nd) / (nd - 1.0))
        w_q[lang] = math.floor((nd * sigma) * NEYMAN_Q)
    tot = sum(w_q.values())
    out = {}
    for lang, docs in by_lang.items():
        alloc = min(math.floor(NEYMAN_BUDGET * w_q[lang] / tot), len(docs))
        if alloc < 1:
            continue  # inner join with the non-empty selection drops it
        ranked = sorted(docs, key=lambda d: (
            hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
        picked = sorted(f"{d[0]:08d}" for d in ranked[:alloc])
        fp = hashlib.md5(",".join(picked).encode()).hexdigest()
        out[lang] = (len(docs), w_q[lang], alloc, alloc, fp)
    return out


def test_neyman_fuzz_matches_python_recompute(spark, tmp_path):
    for trial in range(6):
        rows = []
        for li in range(RNG.randrange(2, 6)):
            lang = f"l{trial}_{li}"
            n = RNG.randrange(2, 31)
            const = RNG.random() < 0.2  # degenerate stratum: sigma = 0
            base = RNG.randrange(10, 5000)
            for _ in range(n):
                doc_id = RNG.randrange(1, 10**7)
                rows.append((lang, doc_id,
                             base if const else RNG.randrange(1, 9000)))
        path = tmp_path / f"t{trial}"
        spark.createDataFrame(
            rows, "lang string, doc_id long, n_chars long"
        ).write.parquet(str(path / "documents.parquet"))

        got = {r["lang"]: (r["n_docs"], r["w_q"], r["alloc_n"],
                           r["n_sampled"], r["sample_fp"])
               for r in neyman_allocation_sample(spark, str(path))
               .collect()}
        assert got == _py_neyman(rows), trial
