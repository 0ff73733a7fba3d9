"""Text-analysis functions for LLM-data-pipeline workloads.

These cover the north-star text ops (language-ID, quality scoring, token
counting, document fingerprinting) as pure Catalyst column expressions —
no Python in the hot path, so they run JVM-side over billions of
documents. Regexes are kept to the portable subset (explicit character
classes) so the DuckDB oracle (RE2) and Spark (java.util.regex) agree.

The reference has no text functions at all; its `text` type
(andb/catalog/type.py:203-234) is storage only. This module is the
declared north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list used by the language-ID and
# quality heuristics. Kept short and stable: the oracle SQL embeds the
# same list literally.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>, empties removed."""
    t = _to_col(text)
    return F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are in STOPWORDS (double)."""
    toks = tokens(F.lower(_to_col(text)))
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks).cast("double")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ] (double)."""
    t = _to_col(text)
    stripped = F.regexp_replace(t, "[a-zA-Z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(t).cast("double")


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(_to_col(text))
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    )
    return total / F.size(toks).cast("double")


def quality_from_measures(sw: Column, pr: Column, awl: Column) -> Column:
    """Quality closed form over precomputed measures. Keeping this as a
    function of *columns* lets callers stage the expensive tokenizing
    measures in one projection and reuse them — Catalyst's
    CollapseProject will not re-inline a non-trivial alias referenced
    more than once, so each document is tokenized once, not once per
    derived output column."""
    return (
        F.least(sw * F.lit(4.0), F.lit(1.0)) * F.lit(0.5)
        + (F.lit(1.0) - F.least(pr * F.lit(10.0), F.lit(1.0))) * F.lit(0.3)
        + F.when((awl >= 3.0) & (awl <= 8.0), F.lit(0.2)).otherwise(F.lit(0.0))
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword presence
    (natural language), penalizes punctuation soup and degenerate token
    lengths. Same closed form in the oracle SQL. Prefer staging the
    three measures and calling quality_from_measures when also emitting
    the measures themselves."""
    t = _to_col(text)
    return quality_from_measures(stopword_ratio(t), punct_ratio(t), avg_token_length(t))


def lang_id(text: Column | str) -> Column:
    """N-gram-free heuristic language ID: 'en' when the English stopword
    ratio clears a threshold, else 'other'. (A real model would be a
    pandas UDF; the heuristic keeps the op oracle-checkable.)"""
    return F.when(stopword_ratio(text) >= 0.03, F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted set of
    lowercased tokens. Two documents that are word-permutations of each
    other collide — the classic "fingerprint" dedup key."""
    toks = F.array_distinct(F.array_sort(tokens(F.lower(_to_col(text)))))
    return F.md5(F.array_join(toks, " "))
