"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting.

All pure column expressions (whole-stage codegen, pushdown-friendly);
shared constants are exported so the DuckDB oracle is generated from
the same lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword table per language — the n-gram-heuristic
# language identifier votes by stopword hits. (A real deployment swaps
# in fastText/cld3 behind the same operator signature.)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
    "zh": ("shi", "bu", "wo", "de", "le"),
}

ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

PUNCT_REGEX = r"[^0-9A-Za-z\s]"
TOKEN_SPLIT_REGEX = r"\s+"


def token_count_expr(text_col: str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, TOKEN_SPLIT_REGEX))
    ).cast("long")


def punct_ratio_expr(text_col: str, round_to: int = 4) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    n = F.length(F.col(text_col))
    n_punct = n - F.length(F.regexp_replace(F.col(text_col), PUNCT_REGEX, ""))
    return F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(n_punct.cast("double") / n), round_to
    )


def stopword_hits_expr(text_col: str, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are in the given stopword list."""
    toks = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_REGEX)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))).cast(
        "long"
    )


def quality_score_expr(text_col: str, round_to: int = 4) -> Column:
    """Composite quality in [0,1]: length band + low punctuation +
    healthy stopword ratio (the reference's validation gates —
    min-size / dimension checks, validator/validation.py:151-174 —
    re-expressed for text)."""
    n_tokens = token_count_expr(text_col)
    length_ok = F.when((n_tokens >= 10) & (n_tokens <= 100000), 1.0).otherwise(0.0)
    punct = punct_ratio_expr(text_col, 10)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(0.0)
    sw_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        stopword_hits_expr(text_col, ENGLISH_STOPWORDS).cast("double") / n_tokens
    )
    sw_ok = F.when((sw_ratio >= 0.01) & (sw_ratio <= 0.6), 1.0).otherwise(0.0)
    return F.round((length_ok + punct_ok + sw_ok) / 3.0, round_to)


def lang_id_expr(text_col: str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits,
    deterministic tie-break by language code; 'und' when no hits."""
    langs = sorted(LANG_STOPWORDS)
    hit_cols = {
        lang: stopword_hits_expr(text_col, LANG_STOPWORDS[lang]) for lang in langs
    }
    best = F.greatest(*[hit_cols[lang] for lang in langs])
    pred = F.lit("und")
    # build when-chain in reverse so earlier (alphabetical) langs win ties
    for lang in reversed(langs):
        pred = F.when((best > 0) & (hit_cols[lang] == best), lang).otherwise(pred)
    return pred


def fingerprint_expr(text_col: str) -> Column:
    """Normalized document fingerprint: md5 of lowercased,
    whitespace-collapsed text (exact-dedup key robust to spacing)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return F.md5(norm)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass projection of all text metrics."""
    return df.select(
        F.col(id_col),
        token_count_expr(text_col).alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        punct_ratio_expr(text_col).alias("punct_ratio"),
        quality_score_expr(text_col).alias("quality_score"),
        lang_id_expr(text_col).alias("lang_pred"),
        fingerprint_expr(text_col).alias("fingerprint"),
    )
