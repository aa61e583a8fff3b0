"""End-to-end pipeline goldens (FIXTURES.md §A2-A4; map_test.go:21-44,
combine_test.go:21-49, reduce_test.go:38-42) plus a corpus round-trip with
Latin-1 bytes and per-file distinct scope."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators.anagram import (
    anagram_pipeline,
    group_anagrams,
    map_words,
    tokenize_documents,
)
from gcp_serverless_mapreduce_spark.sources.text import (
    format_anagram_lines,
    read_gutenberg_corpus,
)


def test_mapper_golden(spark):
    # ["the","quick","brown","fox","quick"] => {cikqu:[quick], bnorw:[brown],
    # fox:[fox]} — stop word dropped, dup collapsed (map_test.go:21-44).
    words = spark.createDataFrame(
        [(1, w) for w in ["the", "quick", "brown", "fox", "quick"]],
        ["doc_id", "word"],
    ).distinct()
    mapped = map_words(words)
    got = {r["sorted_word"]: r["word"] for r in mapped.collect()}
    assert got == {"cikqu": "quick", "bnorw": "brown", "fox": "fox"}


def test_combiner_reducer_golden(spark):
    # [(acer,care),(artp,part),(acer,race),(acer,care),(artp,trap)]
    # => acer:[care,race], artp:[part,trap] (combine_test.go:21-49), and the
    # HAVING>1 + sort + format of reduce_test.go:38-42.
    mapped = spark.createDataFrame(
        [("acer", "care"), ("artp", "part"), ("acer", "race"),
         ("acer", "care"), ("artp", "trap"), ("fox", "fox")],
        ["sorted_word", "word"],
    )
    grouped = group_anagrams(mapped)
    got = {r["sorted_word"]: r["anagrams"] for r in grouped.collect()}
    # "fox" group has a single member -> dropped by HAVING (reduce.go:86)
    assert got == {"acer": ["care", "race"], "artp": ["part", "trap"]}
    lines = sorted(r["value"] for r in format_anagram_lines(grouped).collect())
    assert lines == ["acer: care race", "artp: part trap"]


def test_corpus_pipeline(spark, tmp_path):
    # Two files sharing words (per-file distinct scope), one with a Gutenberg
    # header and a Latin-1 byte (0xE7 = ç) to pin the ISO-8859-1 decode.
    f1 = tmp_path / "book1.txt"
    f1.write_bytes(
        b"junk *** START OF THIS PROJECT GUTENBERG EBOOK ***\n"
        b"race care the race acted \xe7a\n"
        b"End of the Project Gutenberg EBook trailing junk"
    )
    f2 = tmp_path / "book2.txt"
    f2.write_bytes(b"care race cedar raced traced")
    (tmp_path / "ignored.dat").write_bytes(b"race care")  # suffix-filtered (S1)

    corpus = read_gutenberg_corpus(spark, str(tmp_path))
    assert corpus.count() == 2  # .dat excluded
    # Latin-1 decode survived: ça present in book1's raw content
    c1 = corpus.filter(F.col("path").endswith("book1.txt")).first()["content"]
    assert "ça" in c1

    result = anagram_pipeline(corpus, doc_col="path", text_col="content",
                              gutenberg=True)
    got = {r["sorted_word"]: r["anagrams"] for r in result.collect()}
    assert got["acer"] == ["care", "race"]  # union across both files, deduped
    assert got["acder"] == ["cedar", "raced"]
    assert "acdert" not in got or got["acdert"] == ["traced"]  # singleton dropped
    assert "acdert" not in got


def test_documents_flagship(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # The synthetic vocabulary (31 distinct words) contains no anagram pairs,
    # so the reference-faithful HAVING>1 variant is legitimately empty...
    assert anagram_pipeline(docs).count() == 0
    # ...and the flagship entry() variant keeps all signature groups.
    tokens = tokenize_documents(docs)
    out = group_anagrams(map_words(tokens), min_group_size=1)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["anagrams"] == sorted(set(r["anagrams"]))
        assert r["n_anagrams"] >= 1
