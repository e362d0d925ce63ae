"""Text-analysis column expressions: language-ID, quality scoring,
token counting, document fingerprinting.

All pure JVM-side expressions (whole-stage codegen) over the documents
table; every function has a DuckDB oracle mirror in oracles.py.  These
are the corpus-curation operators a 100 TB training-data pipeline runs
before dedup/tagging.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_col

# deterministic per-language marker lists (n-gram-heuristic stand-in:
# a real corpus would learn these profiles; the operator shape —
# score-per-language then argmax — is identical)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "table", "row"),
    "de": ("der", "die", "das", "batch"),
    "es": ("el", "la", "los", "data"),
    "fr": ("le", "la", "les", "stream"),
    "zh": ("spark", "join", "merge", "key"),
}

STOPWORDS = ("the", "a", "of", "and")
FP_MOD = (1 << 31) - 1
FP_MULT = 31


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish subword count: alnum runs + punctuation marks, counted
    with a regex — the cheap stand-in for a real tokenizer's length."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit ratio."""
    toks = tokens(text)
    n = F.size(toks)
    return {
        lang: F.round(
            F.size(F.filter(toks, lambda t: t.isin(*marks))) / n, 6
        )
        for lang, marks in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language with lexicographic tiebreak — deterministic."""
    scores = lang_scores(text)
    pairs = F.array(*[
        F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_MARKERS)
    ])
    # max by (score, reversed-lang) so ties pick the lexicographically
    # smallest language: sort desc by score then asc by lang
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["s"] > b["s"], -1)
        .when(a["s"] < b["s"], 1)
        .when(a["l"] < b["l"], -1)
        .when(a["l"] > b["l"], 1)
        .otherwise(0),
    )[0]
    return best["l"]


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]:
    0.4 * length_norm(min(n_tokens/64, 1))
    + 0.3 * distinct_token_ratio
    + 0.3 * (1 - stopword_ratio)."""
    toks = tokens(text)
    n = F.size(toks)
    length_norm = F.least(n / F.lit(64.0), F.lit(1.0))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    return F.round(0.4 * length_norm + 0.3 * distinct_ratio + 0.3 * (1 - stop_ratio), 6)


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial hash over tokens:
    fp = fold(tokens, 0, (acc, t) -> (acc * 31 + H(t)) mod p) with the
    cross-engine md5 hash H — a deterministic document identity that is
    robust to re-partitioning (unlike monotonically_increasing_id)."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_MULT + md5_int_col(t)) % FP_MOD,
    )
