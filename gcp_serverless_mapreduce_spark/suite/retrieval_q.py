"""Retrieval / corpus-release queries with DuckDB oracle twins: BM25
lexical scoring, RAG-style overlapping chunking, and deterministic
train/val/test split accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import curation, retrieval
from ..registry import register
from ..tables import load_table

QUERY_TERMS = ["vector", "join", "scan"]
CHUNK_WORDS = 40
CHUNK_STRIDE = 30

_QL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_BM25_SQL = f"""
WITH toks AS (
    SELECT doc_id AS doc,
           string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents),
lens AS (SELECT doc, len(t) AS dl FROM toks),
stats AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM lens),
postings AS (
    SELECT doc, unnest(list_filter(t, x -> x IN ({_QL}))) AS term
    FROM toks),
tf AS (SELECT doc, term, COUNT(*) AS tf FROM postings GROUP BY doc, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
    SELECT tf.doc, lens.dl,
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * CAST(tf.tf AS DOUBLE) * ({retrieval.K1} + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + {retrieval.K1} * (1.0 - {retrieval.B}
                                  + {retrieval.B} * lens.dl / stats.avgdl))
               AS c
    FROM tf JOIN df USING (term)
            JOIN lens ON lens.doc = tf.doc
            CROSS JOIN stats)
SELECT doc AS doc_id, MAX(dl) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       round(SUM(c), 6) AS score
FROM scored GROUP BY doc
"""


@register("bm25_doc_scores", _BM25_SQL)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of every document against the fixed query {QUERY_TERMS}
    (Lucene IDF form, k1={retrieval.K1}, b={retrieval.B}).  Postings are
    filtered to query terms BEFORE the explode reaches any exchange; df
    and the N/avgdl scalar broadcast; scores rounded to 6 decimals so the
    ln() last-ulp gap between libm and the JVM can't reach the hash.  See
    operators/retrieval.py."""
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_scores(docs, QUERY_TERMS)


@register("doc_overlapping_chunks", f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS t
    FROM documents),
starts AS (
    SELECT doc_id, t,
           unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE})) AS start
    FROM toks WHERE len(t) > 0)
SELECT doc_id, CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(len(t[start + 1:start + {CHUNK_WORDS}]) AS BIGINT)
           AS n_chunk_tokens,
       md5(array_to_string(t[start + 1:start + {CHUNK_WORDS}], ' '))
           AS chunk_hash
FROM starts
""")
def doc_overlapping_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: {CHUNK_WORDS}-token windows every {CHUNK_STRIDE}
    tokens ({CHUNK_WORDS - CHUNK_STRIDE}-token overlap), emitted as
    md5(chunk) + token count — map-only, no shuffle; see
    operators/curation.py:overlapping_chunks."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.overlapping_chunks(docs, CHUNK_WORDS, CHUNK_STRIDE)


@register("dataset_split_counts", """
WITH s AS (
    SELECT source, doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                ELSE 'test' END AS split
    FROM documents)
SELECT source, split, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM s GROUP BY source, split
""")
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test assignment (~90/5/5 via
    md5 hex ranges) with per-source accounting — split membership is a
    pure function of doc_id, immune to repartitioning and appends; see
    operators/curation.py:split_assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.split_assignment(docs)
