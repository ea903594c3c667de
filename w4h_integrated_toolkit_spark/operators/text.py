"""Text-analysis operators for training-data pipelines (north-star ops).

All pure built-in expressions (regexp/split/aggregate) — no Python in the hot
path, so the whole stage codegens and scales linearly with input bytes.
Designed for a ``documents(doc_id, text, ...)`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import rolling_hash, portable_hash32

__all__ = [
    "token_count",
    "subword_count",
    "text_stats",
    "quality_score",
    "language_id",
    "fingerprint",
]

_WORD_RE = r"\s+"

# BPE-ish pre-tokenizer (GPT-2-style, simplified to constructs both Java
# regex and RE2 support — no lookarounds): contractions, space-prefixed
# letter runs, digit runs, punctuation runs. Counting these matches is the
# standard fast token-count estimate for LLM budgets.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), _WORD_RE))


def subword_count(text: Column) -> Column:
    """BPE-ish token-count estimate: number of pre-tokenizer matches
    (``regexp_count`` — one codegen'd pass, no array materialization)."""
    return F.regexp_count(text, F.lit(_BPE_RE))


def text_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document surface statistics: chars, tokens, mean token length,
    punctuation ratio, digit ratio."""
    t = F.col(text)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        ((n_chars - n_space).cast("double") / n_tokens).alias("mean_token_len"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
    )


# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# Deliberately simple + deterministic so the DuckDB oracle can replicate the
# exact arithmetic; real deployments would swap in fastText et al.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Count of marker-word occurrences, via the length-difference trick
    (portable to ANSI SQL: (len(s) - len(replace(s, w, ''))) / len(w))."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in words:
        pat = f" {w} "
        hits = (F.length(padded) - F.length(F.replace(padded, F.lit(pat)))) / len(pat)
        total = total + hits.cast("long")
    return total


def language_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword-marker hits,
    'und' (undetermined) when no marker occurs. Ties break by language code
    order (deterministic)."""
    t = F.col(text)
    scored = df.select(
        id_col,
        *[
            _marker_hits(t, ws).alias(f"score_{lang}")
            for lang, ws in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # reversed: earlier languages win ties via later (outer) when-overwrite
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(id_col, pred.alias("lang_pred"), best.alias("best_score"))


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite document-quality score in [0,1]: length factor, stopword
    presence, token-length sanity, punctuation penalty. Deterministic
    arithmetic over the surface stats (oracle-replicable)."""
    s = text_stats(df, text, id_col)
    en_hits = _marker_hits(F.col(text), _LANG_MARKERS["en"])
    hits = df.select(id_col, en_hits.alias("en_hits"), token_count(F.col(text)).alias("nt"))
    j = s.join(hits, id_col)
    len_factor = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    stop_factor = F.least(
        F.col("en_hits").cast("double") / F.greatest(F.col("nt") * 0.02, F.lit(1.0)),
        F.lit(1.0),
    )
    tok_factor = F.when(
        F.col("mean_token_len").between(2.0, 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_penalty = F.least(F.col("punct_ratio") * 2.0, F.lit(0.5))
    score = 0.4 * len_factor + 0.3 * stop_factor + 0.3 * tok_factor - punct_penalty
    return j.select(
        id_col, F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)).alias("quality")
    )


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: MD5 (exact-dup key) + 32-bit polynomial rolling
    hash (cheap order-sensitive fingerprint)."""
    return df.select(
        id_col,
        F.md5(F.col(text)).alias("md5_fp"),
        rolling_hash(F.col(text)).alias("rolling_fp"),
        portable_hash32(F.col(text)).alias("fp32"),
    )
