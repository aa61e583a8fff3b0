"""Golden test for the dedup resolution step: identical documents form
one LSH cluster, the smallest doc_id among equal lengths is kept, and
singletons survive untouched."""

from __future__ import annotations

from gcp_serverless_mapreduce_spark.suite.dedup_q import (
    dedup_resolution_by_source)

SAME = "alpha beta gamma delta epsilon zeta eta theta"


def test_dedup_resolution_keeps_one_per_cluster(spark, tmp_path):
    d = str(tmp_path / "fixtures")
    rows = [
        # docs 0-2: byte-identical -> one cluster spanning two sources
        (0, SAME, "en", "s0", len(SAME)),
        (1, SAME, "en", "s0", len(SAME)),
        (2, SAME, "en", "s1", len(SAME)),
        # unique docs: singletons, always kept
        (3, "one completely different document body", "en", "s1", 38),
        (4, "another unrelated text entirely here", "en", "s1", 36),
    ]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet"))
    out = {r["source"]: r for r in
           dedup_resolution_by_source(spark, d).collect()}
    # equal lengths tie-break to the smallest doc_id: doc 0 (source s0)
    # represents the cluster, so s0 keeps 1 of 2 and s1 keeps only its
    # two singletons
    assert (out["s0"]["n_docs"], out["s0"]["n_kept"]) == (2, 1)
    assert out["s0"]["kept_chars"] == len(SAME)
    assert (out["s1"]["n_docs"], out["s1"]["n_kept"]) == (3, 2)
    assert out["s1"]["kept_chars"] == 38 + 36
