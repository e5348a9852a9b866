"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language-ID,
quality scoring, token counting, document fingerprinting — each as a
pure-Column builder (JVM-side, whole-stage-codegen'd; no Python UDFs in
the hot path, so the same expressions run unchanged over 100 TB).

Determinism: every expression has an exact DuckDB twin (see
plans/oracle extensions) — ASCII character classes only, since Java and
RE2 regex dialects agree on those.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace-delimited tokens (the "word count" every corpus tool reports)
TOKEN_PATTERN = r"\S+"
# BPE-ish subword estimate: letter runs capped at 4 chars, digits, and
# single punctuation marks — a cheap, deterministic stand-in for a real
# tokenizer's piece count.
SUBWORD_PATTERN = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

# marker stopwords per language for the n-gram/stopword lang-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "est", "une"),
    "es": ("el", "los", "y", "es", "una"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(F.expr(f"regexp_extract_all({_name(col)}, '{_esc(TOKEN_PATTERN)}', 0)")).cast("bigint")


def _name(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise ValueError("expression-based text ops need a named column")


def _esc(pattern: str) -> str:
    # Spark SQL string literals eat one level of backslash
    return pattern.replace("\\", "\\\\")


def subword_count(col: str) -> Column:
    """BPE-ish subword-piece estimate."""
    return F.size(
        F.expr(f"regexp_extract_all({col}, '{_esc(SUBWORD_PATTERN)}', 0)")
    ).cast("bigint")


def words(col: str) -> Column:
    """Lowercased alphanumeric word array (normalization for shingles,
    stopword ratios, lang-ID)."""
    return F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")


def _marker_pattern(markers: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(markers) + r")\b"


def marker_count(col: str, markers: tuple[str, ...]) -> Column:
    """Occurrences of any marker word, via regexp_count — codegen'd
    (higher-order array filters are interpreted and ~10x slower; Java
    and RE2 agree on \\b over ASCII, so the oracle twin is exact)."""
    return F.regexp_count(F.lower(F.col(col)), F.lit(_marker_pattern(markers)))


def stopword_ratio(col: str) -> Column:
    w = words(col)
    return F.round(
        marker_count(col, STOPWORDS).cast("double")
        / F.nullif(F.size(w), F.lit(0)).cast("double"),
        6,
    )


def punct_ratio(col: str) -> Column:
    n_punct = F.size(F.expr(f"regexp_extract_all({col}, '[^A-Za-z0-9\\\\s]', 0)"))
    return F.round(
        n_punct.cast("double") / F.nullif(F.length(col), F.lit(0)).cast("double"), 6
    )


def mean_word_length(col: str) -> Column:
    return mean_word_length_from(words(col))


def mean_word_length_from(w: Column) -> Column:
    # sum of word lengths == length of the separator-less join; array_join
    # is codegen'd while aggregate/transform are interpreted
    return F.round(
        F.length(F.array_join(w, "")).cast("double")
        / F.nullif(F.size(w), F.lit(0)).cast("double"),
        4,
    )


def quality_from_features(
    n_tok: Column, mwl: Column, sw: Column, pr: Column
) -> Column:
    """Quality formula over precomputed features — lets a pipeline
    evaluate each regex/word extraction once per row and reuse it
    (higher-order functions are interpreted, so repeated evaluation is
    the dominant cost at scale)."""
    score = (
        F.when(n_tok >= 20, F.lit(0.25)).otherwise(n_tok.cast("double") / 80.0)
        + F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sw >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(pr <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return F.round(score, 4)


def quality_score(col: str) -> Column:
    """Composite [0,1] quality heuristic: long enough, words not too
    short/long, not punctuation-soup, some stopwords (prose-likeness).
    Weights are arbitrary but fixed — the point is a deterministic,
    cheap, fully-JVM-side scoring pass."""
    return quality_from_features(
        token_count(col), mean_word_length(col), stopword_ratio(col), punct_ratio(col)
    )


def lang_id(col: str) -> Column:
    """Stopword-marker language ID. Scores each candidate language by
    marker-word hits in the normalized word array; argmax with a fixed
    tie-break order (en, de, fr, es, unknown)."""
    scores = {
        lang: marker_count(col, markers) for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: str) -> Column:
    """Document fingerprint: md5 over the aggressively-normalized text
    (lowercase, strip all non-alphanumerics). Robust to whitespace /
    punctuation / case jitter — the exact-dedup key for near-identical
    crawl copies."""
    return F.md5(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", ""))


# PII patterns for the scan/redact pass a training pipeline runs before
# release. RE2-compatible (no backreferences, no lookaround) so the
# Java (Spark) and RE2 (DuckDB oracle) engines agree; ASCII classes
# only, same policy as the rest of this module. Ordered dict: redaction
# applies in this order, so an SSN inside a longer digit run is counted
# once by the earlier class that consumed it.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+?[0-9][0-9()./ -]{6,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}

PII_TOKEN = "[PII]"


def pii_count(col: str, kind: str) -> Column:
    """Occurrences of one PII class (regexp_count — codegen'd)."""
    return F.regexp_count(F.col(col), F.lit(PII_PATTERNS[kind]))


def pii_redact(col: str) -> Column:
    """Text with every PII match replaced by ``[PII]``, classes applied
    in PII_PATTERNS order (email before phone, so the digits of a
    phone-looking substring inside an email aren't re-matched)."""
    out = F.col(col)
    for pattern in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, PII_TOKEN)
    return out
