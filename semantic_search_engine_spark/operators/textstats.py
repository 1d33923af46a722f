"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM codegen, zero Python in the hot path)
so each has an exact ANSI-SQL oracle twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens_col

# Pinned per-language marker sets for the heuristic language-ID.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "de"],
}


def token_count_col(text_col) -> "F.Column":
    return F.size(tokens_col(text_col)).cast("long")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), token_count_col(F.col(text_col)).alias("n_tokens"))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pinned quality heuristic (v1):
      q = 0.4·min(n_tokens/100, 1) + 0.3·distinct_ratio + 0.3·alnum_ratio
    where distinct_ratio = distinct tokens / tokens and alnum_ratio =
    alnum chars / chars. Returns (id, n_tokens, quality)."""
    ts = tokens_col(F.col(text_col))
    n_tok = F.size(ts).cast("double")
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(ts)).cast("double") / n_tok).otherwise(0.0)
    n_chars = F.length(text_col).cast("double")
    alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")).cast("double")
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(0.0)
    q = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * alnum_ratio
    )
    return docs.select(
        F.col(id_col), n_tok.cast("long").alias("n_tokens"), F.round(q, 6).alias("quality")
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language-ID (v1, pinned): count marker-token hits per
    language; predict argmax with hits>0, deterministic tie-break by
    language code; else 'und'. Returns (id, lang_pred)."""
    ts = tokens_col(F.col(text_col))
    hit_cols = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols[lang] = F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))
    # argmax with (score desc, lang asc) tie-break, hits must be > 0
    pred = F.lit("und")
    best = F.lit(0)
    for lang in sorted(LANG_MARKERS, reverse=True):
        s = hit_cols[lang]
        pred = F.when(s >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — md5 of whitespace-normalized lowercase text; the
    rolling-hash-style content fingerprint for lineage/dedup."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm.cast("binary")).alias("fp"))
