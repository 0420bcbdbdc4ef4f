"""Text-analysis operators for large-scale corpus pipelines.

All pure ``pyspark.sql.functions`` column expressions — JVM-side, inside
whole-stage codegen, no Python in the hot path. Each has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` so DuckDB can verify results.

Operators: tokenization + token counting, punctuation/stopword ratios,
quality scoring, n-gram-free language guessing (stopword hits), and document
fingerprinting (normalized-text digest for exact dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language function-word lists for the heuristic language guess.
# Deliberately tiny + deterministic: the operator contract is "same text ->
# same label", not linguistic accuracy (the oracle replicates it verbatim).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": [],  # CJK detected by codepoint range instead
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of already-space-separated text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def char_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_token_len(col: str | Column) -> Column:
    # non-whitespace char count == length(regexp_replace(c, '\s+', '')) —
    # counting is cheaper than building the stripped string (r07: guide §1.2
    # per-task work), and exactly equal: every \s char is one removed char
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.regexp_count(c, F.lit(r"\s"))) / token_count(c)


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    # NOT regexp_count('[^A-Za-z0-9\s]'): measured 5x slower than the strip
    # (regexp_count = size(regexp_extract_all(...)), r07 micro-bench 1.57 s
    # vs 0.29 s at 32-way over sf1.0 documents) — keep the replace form
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_hits(col: str | Column, words: list[str]) -> Column:
    """Number of tokens that are one of ``words`` (with repetition).

    Implemented as one ``regexp_count`` per word list instead of
    ``size(filter(split(...)))``: a token of ``split(trim(c), '\\s+')``
    equals ``w`` exactly when the text contains ``w`` as a maximal
    non-whitespace run, i.e. one non-overlapping match of
    ``(^|\\s)w(?=$|\\s)`` (the trailing boundary is a lookahead so adjacent
    tokens keep their own leading separator). Counts are identical for any
    input — split's empty-string artifact tokens can never equal a non-empty
    word — but the regexp form is whole-stage-codegen-friendly (the
    higher-order ``filter`` is CodegenFallback and was re-evaluated per
    reference: 108 interpreted evaluations/row in the r06
    ``stratified_sample`` plan; see OPTIMIZATION_r07.md)."""
    import re as _re

    words = [w for w in words if w]
    if not words:
        return F.lit(0)
    pat = r"(^|\s)(" + "|".join(_re.escape(w) for w in words) + r")(?=$|\s)"
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(pat))


def stopword_ratio(col: str | Column, words: list[str] | None = None) -> Column:
    words = words if words is not None else LANG_MARKERS["en"]
    return stopword_hits(col, words) / F.greatest(token_count(col), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Heuristic [0,1] quality score: length band + low punctuation + some
    stopwords — the standard cheap pre-filter for LLM training corpora."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (char_count(c) >= 64) & (char_count(c) <= 100_000)
    punct_ok = punct_ratio(c) <= 0.2
    stop_ok = stopword_ratio(c) >= 0.01
    return (
        len_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.3
        + stop_ok.cast("double") * 0.3
    )


def lang_guess(col: str | Column) -> Column:
    """Deterministic language guess: CJK codepoints win, else the language
    with the most function-word hits (ties broken by fixed order en>de>es>fr,
    'und' for unknown)."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: stopword_hits(c, ws) for lang, ws in LANG_MARKERS.items() if ws}
    best = F.greatest(*hits.values())
    expr = F.when(c.rlike("[一-鿿]"), F.lit("zh"))
    for lang in ["en", "de", "es", "fr"]:  # fixed tie-break order
        expr = expr.when((best > 0) & (hits[lang] == best), F.lit(lang))
    return expr.otherwise(F.lit("und"))


def normalized_text(col: str | Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim — the
    canonical form used for fingerprinting and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def fingerprint(col: str | Column) -> Column:
    """Deterministic content fingerprint: md5 hex of the normalized text
    (md5 exists verbatim in DuckDB, so oracles can reproduce it)."""
    return F.md5(normalized_text(col))
