"""Training-data text analysis: language-ID, quality scoring, token
counting, document fingerprinting.

These extend the reference's text rules (SURVEY §2.2) with the
operations a large-scale training-data pipeline needs. Everything is
native Column expressions (codegen; no Python in the hot path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacheck_spark.rules.text import LANG_RANGES, detected_language

# --- token counting -------------------------------------------------------

#: BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs —
#: a GPT-2-style pre-split pattern reduced to Java/RE2-portable syntax.
BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+|\s+"


def whitespace_token_count(col: Column) -> Column:
    """Whitespace tokens; empty/null → 0."""
    t = F.trim(col)
    return F.when(
        col.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpeish_token_count(col: Column) -> Column:
    """Approximate BPE token count: word pieces count ~1.3 tokens each,
    digits and punctuation runs 1 each — a deterministic, regex-only
    estimator of tokenizer load (for data-budget planning, not exact
    tokenization)."""
    words = F.size(
        F.filter(
            F.split(col, r"[^A-Za-z]+"), lambda s: F.length(s) > 0
        )
    )
    digits = F.length(F.regexp_replace(col, "[^0-9]", ""))
    punct_runs = F.size(
        F.filter(
            F.split(col, r"[A-Za-z0-9\s]+"), lambda s: F.length(s) > 0
        )
    )
    est = (words.cast("double") * 1.3 + digits + punct_runs)
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.ceil(est)
    ).cast("long")


# --- language ID ----------------------------------------------------------


def lang_id(col: Column) -> Column:
    """Dominant script language code (reference ``detect_language``
    semantics, ``text_rules.py:42-74``): one of
    zh/ja/ko/ar/ru/th/latin/unknown."""
    return detected_language(col)["lang"]


def lang_confidence(col: Column) -> Column:
    return detected_language(col)["confidence"]


# --- quality scoring ------------------------------------------------------

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "this",
]


def quality_features(col: Column) -> Column:
    """Struct of quality-signal features: n_chars, n_tokens,
    avg_token_len, punct_ratio, space_ratio, digit_ratio, upper_ratio,
    stopword_ratio — the raw material for corpus filtering."""
    ln = F.length(col)
    n_tok = whitespace_token_count(col)
    punct = F.length(F.regexp_replace(col, r"[^.,!?;:]", ""))
    spaces = F.length(F.regexp_replace(col, "[^ ]", ""))
    digits = F.length(F.regexp_replace(col, "[^0-9]", ""))
    uppers = F.length(F.regexp_replace(col, "[^A-Z]", ""))
    toks = F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: F.length(t) > 0
    )
    stop = F.size(
        F.filter(toks, lambda t: t.isin(_STOPWORDS))
    )
    safe = lambda num: F.when(ln > 0, num.cast("double") / ln).otherwise(0.0)  # noqa: E731
    return F.struct(
        ln.cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, ln.cast("double") / n_tok).otherwise(0.0).alias(
            "avg_token_len"
        ),
        F.round(safe(punct), 6).alias("punct_ratio"),
        F.round(safe(spaces), 6).alias("space_ratio"),
        F.round(safe(digits), 6).alias("digit_ratio"),
        F.round(safe(uppers), 6).alias("upper_ratio"),
        F.round(
            F.when(n_tok > 0, stop.cast("double") / n_tok).otherwise(0.0), 6
        ).alias("stopword_ratio"),
    )


def quality_score(col: Column) -> Column:
    """Scalar [0,1] quality score: penalizes too-short/too-long docs,
    extreme punctuation/digit density, and zero stopwords in latin text.
    Deterministic heuristic for corpus filtering (C4/Gopher-rule
    style)."""
    f = quality_features(col)
    len_score = (
        F.when(f["n_chars"] < 50, f["n_chars"].cast("double") / 50)
        .when(f["n_chars"] > 20000, F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    punct_score = F.when(f["punct_ratio"] > 0.2, 0.3).otherwise(1.0)
    digit_score = F.when(f["digit_ratio"] > 0.3, 0.3).otherwise(1.0)
    word_score = (
        F.when(f["avg_token_len"] > 15, 0.4)
        .when(f["avg_token_len"] < 2, 0.6)
        .otherwise(1.0)
    )
    return F.when(col.isNull(), 0.0).otherwise(
        F.round(len_score * punct_score * digit_score * word_score, 4)
    )


# --- fingerprinting -------------------------------------------------------


def fingerprint_md5(col: Column) -> Column:
    """Whitespace-normalized lowercase MD5 — exact-dedup fingerprint,
    engine-portable (matches DuckDB md5)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def fingerprint_xx64(col: Column) -> Column:
    """64-bit xxhash fingerprint of the normalized text — cheaper than
    MD5 for shuffle keys at 10^12 scale."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def rolling_fingerprints(
    col: Column, window: int = 64, stride: int = 32
) -> Column:
    """Array of xxhash64 fingerprints over sliding character windows —
    the shingle-level fingerprint used for partial-overlap detection
    (rolling-hash style; stride-spaced windows bound the array size)."""
    t = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    ln = F.length(t)
    starts = F.when(
        ln >= window,
        F.sequence(F.lit(1), ln - window + 1, F.lit(stride)),
    ).otherwise(F.when(ln > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>")))
    return F.transform(
        starts, lambda i: F.xxhash64(F.substring(t, i, window))
    )


def document_profile(
    df: DataFrame, text_col: str = "text", id_col: Optional[str] = None
) -> DataFrame:
    """One projection adding lang, token counts, quality features,
    quality score, and fingerprint to every document — the standard
    per-document enrichment pass of a training-data pipeline."""
    c = F.col(text_col)
    cols = list(df.columns)
    return df.select(
        *cols,
        lang_id(c).alias("lang_id"),
        lang_confidence(c).alias("lang_conf"),
        whitespace_token_count(c).alias("n_tokens_ws"),
        bpeish_token_count(c).alias("n_tokens_bpe"),
        quality_features(c).alias("quality"),
        quality_score(c).alias("quality_score"),
        fingerprint_md5(c).alias("fingerprint"),
    )
