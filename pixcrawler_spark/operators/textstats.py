"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting.

All pure column expressions (whole-stage codegen, pushdown-friendly).
The heavy metrics are computed via STAGED projections — tokenize once,
count stopword hits once per language, then derive scores from those
columns. Building everything as one nested Column expression looks the
same logically but re-expands the tokenizer into every consumer
(Catalyst only collapses projections whose aliases are cheap or used
once), which blew per-row cost up ~50x in practice. Shared constants
are exported so the DuckDB oracle is generated from the same lists.
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

_LANGS = sorted(LANG_STOPWORDS)


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))).cast(
        "long"
    )


# -- standalone Column helpers (single-use contexts) ------------------------
def token_count_expr(text_col: str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(F.col(text_col))
    return (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, TOKEN_SPLIT_REGEX)))
        .cast("long")
    )


def punct_ratio_expr(text_col: str, round_to: int = 4) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    n = F.length(F.col(text_col))
    n_punct = n - F.length(F.regexp_replace(F.col(text_col), PUNCT_REGEX, ""))
    return F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(n_punct.cast("double") / n), round_to
    )


def fingerprint_expr(text_col: str) -> Column:
    """Normalized document fingerprint: md5 of lowercased,
    whitespace-collapsed text (exact-dedup key robust to spacing)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return F.md5(norm)


# -- staged feature pipeline -------------------------------------------------
def with_text_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append staged text-feature columns: _toks, n_tokens, n_chars,
    punct_ratio (unrounded as _punct_raw), sw_hits, h_<lang> per lang,
    lang_pred. Each expensive expression is computed exactly once."""
    t = F.trim(F.col(text_col))
    s1 = df.withColumns(
        {
            "_toks": F.split(t, TOKEN_SPLIT_REGEX),
            "n_chars": F.length(F.col(text_col)).cast("long"),
            "_n_punct": (
                F.length(F.col(text_col))
                - F.length(F.regexp_replace(F.col(text_col), PUNCT_REGEX, ""))
            ).cast("long"),
            "_blank": F.length(t) == 0,
        }
    )
    s2 = s1.withColumns(
        {
            "n_tokens": F.when(F.col("_blank"), F.lit(0))
            .otherwise(F.size("_toks"))
            .cast("long"),
            "sw_hits": _hits(F.col("_toks"), ENGLISH_STOPWORDS),
            **{
                f"h_{lang}": _hits(F.col("_toks"), LANG_STOPWORDS[lang])
                for lang in _LANGS
            },
        }
    )
    s3 = s2.withColumns(
        {
            "punct_ratio": F.round(
                F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
                    F.col("_n_punct").cast("double") / F.col("n_chars")
                ),
                4,
            ),
            "_punct_raw": F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
                F.col("_n_punct").cast("double") / F.col("n_chars")
            ),
            "_best": F.greatest(*[F.col(f"h_{lang}") for lang in _LANGS]),
        }
    )
    pred = F.lit("und")
    # reversed so earlier (alphabetical) languages win ties
    for lang in reversed(_LANGS):
        pred = F.when(
            (F.col("_best") > 0) & (F.col(f"h_{lang}") == F.col("_best")), lang
        ).otherwise(pred)
    return s3.withColumn("lang_pred", pred)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass projection of all text metrics (staged; reference
    analog: the validator's per-file check battery,
    validator/validation.py:151-174, re-expressed for text)."""
    feats = with_text_features(df, text_col)
    sw_ratio = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("sw_hits").cast("double") / F.col("n_tokens")
    )
    length_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.0)
    punct_ok = F.when(F.col("_punct_raw") <= 0.2, 1.0).otherwise(0.0)
    sw_ok = F.when((sw_ratio >= 0.01) & (sw_ratio <= 0.6), 1.0).otherwise(0.0)
    return feats.select(
        F.col(id_col),
        "n_tokens",
        "n_chars",
        "punct_ratio",
        F.round((length_ok + punct_ok + sw_ok) / 3.0, 4).alias("quality_score"),
        "lang_pred",
        fingerprint_expr(text_col).alias("fingerprint"),
    )
