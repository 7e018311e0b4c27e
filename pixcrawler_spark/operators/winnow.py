"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): the rolling-hash local-sampling
fingerprint the SURVEY's text-analysis family lists next to SimHash
and MinHash. Where MinHash samples a *fixed count* of shingles per doc
and SimHash collapses a doc to *one* vector, winnowing samples a
*guaranteed-coverage* subset of k-gram hashes: from every window of
``w`` consecutive k-gram hashes, keep the rightmost minimum. The
guarantee (paper §3): any substring match of length ≥ w + k - 1
between two documents shares at least one selected fingerprint, and
expected density is 2 / (w + 1) — so the inverted index is a fixed
fraction of the corpus with a hard worst-case recall floor, which
neither MinHash (probabilistic) nor SimHash (global) offers.

Reference parity: the reference's duplicate detection hashes whole
files (duplicates.py md5/sha256 content hashes); winnowing is the
partial-overlap extension of the same content-hash idea, selected
per the round-1 brief's "document fingerprinting (rolling hash)"
requirement.

Scale design:
- Fingerprint extraction is **shuffle-free**: the k-gram hash array,
  the per-window rightmost-min fold, and the cross-window dedup are
  all Catalyst array expressions (``transform`` + ``aggregate`` +
  ``array_distinct``) evaluated per input row — whole-stage codegen,
  no explode before selection, so the 100 TB scan emits only the
  ~2/(w+1)-density fingerprint stream.
- The only shuffles are keyed by fingerprint hash (uniform by
  construction — md5 output), and the document-frequency cap drops
  boilerplate fingerprints from join-key duty before the self-join,
  the same hot-key guard as the n-gram Jaccard and LSH band joins
  (operators/dedup.py), so no reducer sees a mega-bucket.
- Ties and the "rightmost" rule are deterministic functions of the
  hash values, so output is engine-order independent — required for
  the DuckDB oracle hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(text: Column) -> Column:
    """MOSS-style normalization: keep Unicode letters and digits
    (``\\p{L}\\p{N}`` — supported identically by Java regex and
    DuckDB's RE2), then lowercase ASCII letters ONLY via
    ``translate``. Non-Latin scripts (CJK, Cyrillic, Arabic) keep
    their codepoints and so fingerprint normally; full-Unicode case
    folding is deliberately avoided because Spark (ICU/Java) and
    DuckDB (utf8proc) do not guarantee identical results, and the
    oracle hash-match requires byte-identical normalized text.
    Combining marks are ``\\p{M}`` and thus stripped, so the result
    has no multi-codepoint grapheme clusters and character-indexed
    ``substring`` agrees across engines."""
    return F.translate(
        F.regexp_replace(text, r"[^\p{L}\p{N}]", ""),
        _ASCII_UPPER,
        _ASCII_LOWER,
    )


def _gram_hashes(norm: Column, k: int) -> Column:
    """Array of ``struct(h, pos)`` — md5 of each k-gram, 1-based
    position — computed per row with no explode."""
    n_grams = F.length(norm) - k + 1
    return F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda p: F.struct(
            F.md5(F.substring(norm, p, F.lit(k))).alias("h"),
            p.alias("pos"),
        ),
    )


def select_fingerprints(hs_col: str, w: int) -> Column:
    """Winnowing selection over a gram-hash array column named
    ``hs_col``: for each of the ``size(hs) - w + 1`` full windows,
    fold left-to-right keeping the element with ``h <= acc.h`` (later
    position wins ties → the paper's rightmost-minimum rule), then
    dedup across overlapping windows. Caller must guarantee
    ``size(hs) >= w`` so every window is full and ``slice``/
    ``sequence`` bounds are valid — ``stage_gram_hashes`` does both.

    The signature takes a column NAME, not a Column, on purpose: the
    array must be a materialized attribute from a prior projection
    (``stage_gram_hashes``), never the ``_gram_hashes`` expression
    inlined. Catalyst performs no common-subexpression elimination
    inside higher-order-function lambdas, so an inlined hash array is
    re-evaluated on every window reference — O(n_grams²) md5 calls
    per document (measured ~100× slower at 300-char docs). A name-only
    parameter makes that regression unrepresentable at the call site;
    staged as an attribute, the optimizer keeps the producing
    projection (md5 is non-cheap, so CollapseProject won't re-inline
    it) and the fold is linear."""
    if w < 2:
        raise ValueError(f"winnow window w must be >= 2, got {w}")
    if not isinstance(hs_col, str):
        raise TypeError(
            "select_fingerprints takes the NAME of a staged gram-hash "
            "column (see stage_gram_hashes); passing an expression "
            "would re-evaluate it per window — O(n_grams^2) md5 calls"
        )
    hs = F.col(hs_col)
    n_windows = F.size(hs) - w + 1
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda s0: F.aggregate(
                F.slice(hs, s0 + 1, F.lit(w - 1)),
                F.element_at(hs, s0),
                lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
            ),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    max_chars: int | None = None,
) -> DataFrame:
    """Per-document winnowing fingerprints: ``(id, fp_pos, fp_hash)``
    rows, one per selected k-gram (1-based position in the normalized
    text). Documents shorter than ``k + w - 1`` normalized characters
    have no full window and emit no rows (the paper's semantics —
    nothing shorter than the guarantee threshold ``t = w + k - 1``
    can be matched anyway)."""
    if k < 1:
        raise ValueError(f"k-gram size must be >= 1, got {k}")
    staged = stage_gram_hashes(df, id_col, text_col, k, w, max_chars)
    return (
        staged.select(
            id_col,
            F.explode(
                select_fingerprints("_hs", w)
            ).alias("_fp"),
        )
        .select(
            id_col,
            F.col("_fp.pos").alias("fp_pos"),
            F.col("_fp.h").alias("fp_hash"),
        )
    )


def stage_gram_hashes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    w: int,
    max_chars: int | None = None,
) -> DataFrame:
    """``(id, _hs)`` with the k-gram hash array materialized as a
    column attribute — the required staging before
    ``select_fingerprints`` (see its docstring for why). Rows below
    the full-window threshold are dropped here.

    Per-row memory amplifies ~40-50× over the normalized text: ``_hs``
    holds a 32-hex-char md5 struct per k-gram, and the selection fold's
    pre-``array_distinct`` window array is another O(n_grams) structs —
    a multi-MB document inflates to tens of MB inside one row before
    the ~2/(w+1)-density output materializes. ``max_chars`` bounds
    that: normalized text is truncated to the first ``max_chars``
    characters (fingerprints past the cap are dropped, matches within
    the prefix keep the winnowing guarantee). Set it for corpora with
    unbounded text fields; None scans everything."""
    norm = normalize_text(F.col(text_col))
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    return (
        df.select(F.col(id_col), norm.alias("_norm"))
        .where(F.length("_norm") >= k + w - 1)
        .select(id_col, _gram_hashes(F.col("_norm"), k).alias("_hs"))
    )


def winnow_similarity_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    max_df: int = 64,
    threshold: float = 0.5,
    max_chars: int | None = None,
) -> DataFrame:
    """MOSS-style similarity report: documents ranked by shared
    fingerprints. Fingerprint sets (positions dropped — membership is
    what matches) are df-capped for JOIN-KEY duty only (a fingerprint
    in > ``max_df`` docs is boilerplate and would build a mega-bucket,
    exactly like the stop-shingle cap in
    ``dedup.ngram_jaccard_pairs``), inverted-index self-joined on the
    hash, and scored with the overlap coefficient
    ``|A ∩ B| / min(|A|, |B|)`` — MOSS's containment-style score, so a
    small doc pasted into a big one still scores ~1.0 where Jaccard
    would dilute it. The denominator ``n_fp`` counts each document's
    FULL fingerprint set (uncapped): capping the denominator too would
    let two boilerplate-heavy docs whose few surviving rare
    fingerprints coincide score overlap 1.0 from a tiny denominator —
    the cap may only lose shared counts (score under, never over).
    Output: ``(id_a, id_b, n_shared, overlap)`` with ``id_a < id_b``
    and ``overlap >= threshold``."""
    fset = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w, max_chars=max_chars)
        .select(id_col, "fp_hash")
        .distinct()
    )
    joinable = (
        fset.groupBy("fp_hash")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp_hash")
        .join(fset, "fp_hash")
    )
    sizes = fset.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    a = joinable.select(
        F.col(id_col).alias("id_a"), F.col("fp_hash")
    )
    b = joinable.select(
        F.col(id_col).alias("id_b"), F.col("fp_hash")
    )
    shared = (
        a.join(b, "fp_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    overlap = F.round(
        F.col("n_shared")
        / F.least(F.col("na.n_fp"), F.col("nb.n_fp")),
        4,
    )
    return (
        shared.join(
            sizes.alias("na"),
            F.col("id_a") == F.col(f"na.{id_col}"),
        )
        .join(
            sizes.alias("nb"),
            F.col("id_b") == F.col(f"nb.{id_col}"),
        )
        .where(overlap >= threshold)
        .select(
            "id_a", "id_b", "n_shared", overlap.alias("overlap")
        )
    )
