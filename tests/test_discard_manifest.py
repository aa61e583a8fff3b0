"""exact_substring_discard_manifest: applying the manifest must do what
it claims — after dropping each doc's ranges, no discovered pair still
shares a surviving >= MIN_LEN-token verbatim run, while the lowest
doc_id keeps its occurrence (keep-first).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import dedup
from gcp_serverless_mapreduce_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
MIN_LEN, NS, DF_MAX = 8, (8, 13), 128


def _surviving_windows(toks, dropped, n):
    """n-grams over contiguous ORIGINAL positions fully outside the
    dropped set (concatenation-boundary grams are out of scope, as in
    Lee et al. 2022)."""
    out = set()
    for i in range(len(toks) - n + 1):
        if all(j not in dropped for j in range(i, i + n)):
            out.add(" ".join(toks[i:i + n]))
    return out


def test_manifest_ranges_are_sane_and_effective(spark):
    docs = load_table(spark, SF_DIR, "documents")
    toks = {r["doc_id"]: (r["text"] or "").strip().lower().split()
            for r in docs.select("doc_id", "text").collect()}
    manifest = {}
    for r in dedup.substring_discard_manifest(
            docs, min_len=MIN_LEN, ns=NS, df_max=DF_MAX).collect():
        manifest.setdefault(r["doc_id"], []).append(
            (r["range_start"], r["range_end"], r["n_tokens"]))
    assert manifest, "fixture produced no discard ranges"

    dropped: dict[int, set] = {}
    for doc_id, ranges in manifest.items():
        ranges.sort()
        prev_end = -1
        for s, e, n in ranges:
            # in-bounds, consistent, merged (disjoint, non-touching)
            assert 0 <= s < e <= len(toks[doc_id]), (doc_id, s, e)
            assert n == e - s >= MIN_LEN
            assert s > prev_end, (doc_id, ranges)
            prev_end = e
            dropped.setdefault(doc_id, set()).update(range(s, e))

    # Keep-first: every discovered pair loses its shared runs on the
    # HIGHER doc only; after the drop, the pair shares no surviving
    # MIN_LEN-window (the df cap can only remove pairs from discovery,
    # so discovered pairs are exactly the operator's contract).
    cand = dedup.max_shared_span(docs, NS, DF_MAX).collect()
    assert any(r["max_span"] >= MIN_LEN for r in cand)
    for r in cand:
        a, b = r["doc_a"], r["doc_b"]
        wa = _surviving_windows(toks[a], dropped.get(a, set()), MIN_LEN)
        wb = _surviving_windows(toks[b], dropped.get(b, set()), MIN_LEN)
        assert not (wa & wb), (a, b, sorted(wa & wb)[:2])

    # Keep-first really keeps: the lowest doc_id of each discovered
    # pair never dropped tokens BECAUSE of that pair — i.e. a doc with
    # no higher-partner obligations appears in no manifest row.
    lower_only = ({r["doc_a"] for r in cand}
                  - {r["doc_b"] for r in cand})
    assert lower_only and not (lower_only & set(manifest))
