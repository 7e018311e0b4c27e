"""Winnowing fingerprint queries (Schleimer et al., SIGMOD 2003):
the rolling-hash document-fingerprinting entry of the text-analysis
family (operators/winnow.py). Two queries over ``documents``:

- ``text_winnow_fingerprints``: per-doc fingerprint census — k-gram
  count, selected-fingerprint count, selection density (expected
  ~2/(w+1)). Entirely shuffle-free on the Spark side: the winnowing
  fold is a per-row array expression, so this is a map-only scan.
- ``text_winnow_fingerprint_pairs``: MOSS-style similarity report —
  df-capped fingerprint sets, inverted-index self-join, overlap
  coefficient ``|A∩B| / min(|A|,|B|)`` ≥ threshold.

The DuckDB oracle recomputes the same selection from the paper's
definition (per-window min + rightmost tie-break) using window
functions and a rightmost-position join — a deliberately DIFFERENT
formulation from the engine's left-to-right fold, so agreement
checks the algorithm, not a shared implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import winnow
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

WINNOW_K = 8  # k-gram size over normalized (letter/digit, ascii-lowered) text
WINNOW_W = 4  # window of consecutive k-gram hashes per selection
WINNOW_MAX_DF = 64  # fingerprints in > this many docs are boilerplate
WINNOW_THRESHOLD = 0.5  # overlap-coefficient floor for reported pairs
WINNOW_MAX_CHARS = 20000  # normalized-text cap: bounds the ~40-50x
# per-row memory amplification of the staged gram-hash array (see
# operators/winnow.stage_gram_hashes) on unbounded text fields

# Shared oracle CTE: winnowing selection from the paper definition.
# norm mirrors operators/winnow.normalize_text — keep \\p{L}\\p{N}
# codepoints (RE2 and Java regex agree), lowercase ASCII only via
# translate (full-Unicode case folding differs between utf8proc and
# ICU), truncate to the max_chars memory cap. grams = every k-gram's
# md5 + 1-based position; wins = per-window minimum hash (full windows
# enforced after the window function, since SQL WHERE runs before
# OVER); fps = the rightmost position achieving each window's minimum,
# deduped across overlapping windows.
_FPS_CTE = f"""
    norm AS (
      SELECT doc_id,
             substr(
               translate(
                 regexp_replace(text, '[^\\p{{L}}\\p{{N}}]', '', 'g'),
                 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                 'abcdefghijklmnopqrstuvwxyz'),
               1, {WINNOW_MAX_CHARS}) AS s
      FROM documents
    ),
    docs AS (
      SELECT doc_id, s, length(s) - {WINNOW_K} + 1 AS ng
      FROM norm WHERE length(s) - {WINNOW_K} + 1 >= {WINNOW_W}
    ),
    grams AS (
      SELECT doc_id, pos, md5(substr(s, pos::INT, {WINNOW_K})) AS h
      FROM (
        SELECT doc_id, s, unnest(generate_series(1, ng)) AS pos
        FROM docs
      )
    ),
    wins AS (
      SELECT doc_id, pos AS s0,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {WINNOW_W - 1} FOLLOWING) AS mh
      FROM grams
    ),
    fwins AS (
      SELECT w.doc_id, w.s0, w.mh
      FROM wins w JOIN docs d ON d.doc_id = w.doc_id
      WHERE w.s0 <= d.ng - {WINNOW_W} + 1
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp_pos, h FROM (
        SELECT f.doc_id, f.s0, f.mh AS h, max(g.pos) AS fp_pos
        FROM fwins f
        JOIN grams g ON g.doc_id = f.doc_id AND g.h = f.mh
             AND g.pos BETWEEN f.s0 AND f.s0 + {WINNOW_W} - 1
        GROUP BY f.doc_id, f.s0, f.mh
      )
    )
"""


@register(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH {_FPS_CTE}
    SELECT f.doc_id,
           CAST(d.ng AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_fp,
           round(CAST(count(*) AS DOUBLE) / d.ng, 4) AS density
    FROM fps f JOIN docs d ON d.doc_id = f.doc_id
    GROUP BY f.doc_id, d.ng
    """,
    doc="Per-doc winnowing census: k-grams, selected fingerprints, "
    "density (expected ~2/(w+1)). Map-only on the engine side — the "
    "selection fold is a Catalyst array expression per row, so the "
    "100 TB case is a pure scan with no shuffle at all.",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    k, w = WINNOW_K, WINNOW_W
    # gram hashes staged as a column attribute — inlining them into
    # the selection fold re-hashes per window (see select_fingerprints)
    staged = winnow.stage_gram_hashes(
        d, "doc_id", "text", k, w, max_chars=WINNOW_MAX_CHARS
    )
    n_grams = F.size("_hs").cast("bigint")
    n_fp = F.size(
        winnow.select_fingerprints("_hs", w)
    ).cast("bigint")
    return staged.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_fp.alias("n_fp"),
        F.round(n_fp.cast("double") / n_grams, 4).alias("density"),
    )


@register(
    "text_winnow_fingerprint_pairs",
    oracle=f"""
    WITH {_FPS_CTE},
    fset AS (SELECT DISTINCT doc_id, h FROM fps),
    keep AS (
      SELECT h FROM fset GROUP BY h
      HAVING count(*) <= {WINNOW_MAX_DF}
    ),
    joinable AS (
      SELECT f.doc_id, f.h FROM fset f JOIN keep k ON k.h = f.h
    ),
    sizes AS (
      -- denominator from the UNCAPPED set: the df cap guards join
      -- keys only, so boilerplate-heavy docs can't score overlap 1.0
      -- off a tiny capped denominator
      SELECT doc_id, count(*) AS n_fp FROM fset GROUP BY doc_id
    ),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM joinable a
      JOIN joinable b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.id_a, s.id_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           round(CAST(s.n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp), 4)
             AS overlap
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.id_a
    JOIN sizes sb ON sb.doc_id = s.id_b
    WHERE round(CAST(s.n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp), 4)
          >= {WINNOW_THRESHOLD}
    """,
    doc="MOSS similarity pairs over winnowing fingerprints: df-capped "
    "for join-key duty only (boilerplate fingerprints excluded from "
    "the inverted index like the stop-shingle cap in "
    "dedup_ngram_jaccard_pairs; the overlap denominator stays the "
    "full per-doc fingerprint count so the cap can only score "
    "under, never over), inverted-index self-join on the "
    "hash, overlap coefficient >= threshold. The winnowing guarantee "
    "makes recall structural: any shared substring of length >= "
    f"w+k-1 = {WINNOW_W + WINNOW_K - 1} normalized chars shares a "
    "fingerprint.",
)
def text_winnow_fingerprint_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return winnow.winnow_similarity_pairs(
        d, "doc_id", "text", k=WINNOW_K, w=WINNOW_W,
        max_df=WINNOW_MAX_DF, threshold=WINNOW_THRESHOLD,
        max_chars=WINNOW_MAX_CHARS,
    )
