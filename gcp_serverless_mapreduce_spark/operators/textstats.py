"""Text-analysis operators over ``documents`` — language-ID, quality
scoring, token counting, document fingerprinting.

Generalizes the reference's per-word string pipeline (tokenize/normalize/
filter, mapphase/split.go:68-133 + map.go:82-151) from one hard-coded
anagram query to the scoring passes an LLM-corpus pipeline runs before
training: every operator is a pure column expression (codegen'd, single
scan, no Python), so at 100 TB each is one map-side pass + one hash-agg.

Cross-engine determinism: counts are exact integers; every ratio is an
IEEE-double division of two exact integers; the fingerprint fold is
integer arithmetic mod 1e9+7 (bigint-safe: max acc*31+code < 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker-word profiles for the n-gram/stopword language heuristic.  Tiny on
# purpose: the operator's shape (per-lang hit counts -> argmax) is what
# scales; real deployments swap in full frequency profiles.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"),
    "en": ("the", "a", "and", "of", "to", "is", "in", "it", "that", "you"),
    "es": ("el", "los", "y", "es", "no", "un", "por", "que", "para", "una"),
    "fr": ("le", "la", "les", "et", "est", "je", "ne", "pas", "un", "pour"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single other non-space.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FP_MOD = 1_000_000_007
FP_SEED = 7
FP_MULT = 31


def tokens(text: Column) -> Column:
    """Lowered whitespace tokens, no empties (P2+P3 generalized)."""
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda w: w != "")


def lang_hits(toks: Column, lang: str) -> Column:
    """How many tokens are marker words of ``lang`` (multiset count)."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def language_scores(docs: DataFrame, doc_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (doc_id, cand_lang, n_hits) — one row per (doc, candidate
    language).  Single scan: the per-lang counts are computed in one
    projection and exploded, not one pass per language."""
    toks = tokens(F.col(text_col))
    cands = F.array(*[
        F.struct(F.lit(lang).alias("cand_lang"),
                 lang_hits(toks, lang).cast("long").alias("n_hits"))
        for lang in sorted(LANG_MARKERS)
    ])
    return docs.select(
        F.col(doc_col), F.explode(cands).alias("c")
    ).select(doc_col, "c.cand_lang", "c.n_hits")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), F.lit(0)))


def poly_fingerprint(s: Column) -> Column:
    """Rolling polynomial hash of a string's codepoints:
    fold(h -> (h*31 + code) % 1e9+7, seed 7).  Exact integer arithmetic —
    identical in any engine; at 100 TB this is the cheap per-doc identity
    a shuffle can key on (vs md5: no binary/hex handling needed).

    fingerprint('') is pinned to the seed: split('','') yields [''] on
    both engines but the empty char's code DIFFERS (Spark ascii('')=0,
    DuckDB unicode('')=-1) — found by the fuzz oracle, never by fixtures.
    """
    codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
    fold = F.aggregate(
        codes, F.lit(FP_SEED).cast("long"),
        lambda acc, c: (acc * FP_MULT + c) % FP_MOD)
    return F.when(F.length(s) > 0, fold).otherwise(F.lit(FP_SEED).cast("long"))
