"""Query suite: the registry behind ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
ANSI-SQL twin DuckDB runs over the same parquet fixtures — the driver's
correctness gate (row-count + schema + order-insensitive value-hash).

Conventions that keep the two engines hash-identical:
- every computed column aliased identically on both sides;
- set-valued results emitted as sorted, space-joined STRINGs;
- counts cast to BIGINT on both sides;
- money aggregates computed in DECIMAL (exact, order-independent) and cast
  to DOUBLE at the end — never raw double summation, whose value depends on
  partition order;
- temporal outputs formatted to strings (engine-native rendering differs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import STOPWORDS
from .operators import anagram
from .tables import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# --------------------------------------------------------------------------
# Anagram pipeline (the reference's one real query) over `documents`
# --------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_STOPWORDS_SQL = ", ".join(_sql_quote(w) for w in STOPWORDS)

# Shared CTE prefix: tokenize -> per-doc distinct (P2-P4) -> normalize
# (P5-P7) -> anagram signature (P9); mirrors operators/anagram.py stage for
# stage.  DuckDB regexes are RE2, Spark's are java.util.regex; the patterns
# used are in the common dialect subset (\p{L}, anchors, alternation).
_ANAGRAM_CTE = f"""
WITH toks AS (
    SELECT DISTINCT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS word
    FROM documents
),
cleaned AS (
    SELECT regexp_replace(word, '^[^\\p{{L}}]+|[^\\p{{L}}]+$', '', 'g') AS word
    FROM toks
),
kept AS (
    SELECT word FROM cleaned
    WHERE regexp_matches(word, '^\\p{{L}}+$')
      AND word NOT IN ({_STOPWORDS_SQL})
),
sigs AS (
    SELECT array_to_string(list_sort(string_split(word, '')), '') AS sorted_word, word
    FROM kept
)
"""


def _anagram_groups_df(spark: SparkSession, sf_dir: str,
                       min_group_size: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = anagram.tokenize_documents(docs)
    grouped = anagram.group_anagrams(anagram.map_words(tokens),
                                     min_group_size=min_group_size)
    return grouped.select(
        "sorted_word",
        F.array_join("anagrams", " ").alias("anagrams"),
        F.col("n_anagrams").cast("long").alias("n_anagrams"),
    )


@register("anagram_groups", _ANAGRAM_CTE + """
SELECT sorted_word,
       array_to_string(list_sort(list(DISTINCT word)), ' ') AS anagrams,
       count(DISTINCT word) AS n_anagrams
FROM sigs
GROUP BY sorted_word
""")
def anagram_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full pipeline, all signature groups (min size 1)."""
    return _anagram_groups_df(spark, sf_dir, min_group_size=1)


@register("anagram_pairs", _ANAGRAM_CTE + """
SELECT sorted_word,
       array_to_string(list_sort(list(DISTINCT word)), ' ') AS anagrams,
       count(DISTINCT word) AS n_anagrams
FROM sigs
GROUP BY sorted_word
HAVING count(DISTINCT word) >= 2
""")
def anagram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-faithful variant incl. HAVING size>1 (reduce.go:86)."""
    return _anagram_groups_df(spark, sf_dir, min_group_size=2)
