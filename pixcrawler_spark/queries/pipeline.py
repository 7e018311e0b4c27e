"""Training-data pipeline queries: dedup, similarity, text analysis.

Spark side uses operators/*; the DuckDB oracle SQL is generated from
the SAME constants (seed counts, band sizes, stopword lists) so the two
sides cannot drift. Hash family is md5-hex in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup, similarity, textstats
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

NUM_HASHES = 8
BAND_SIZE = 2
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5
JACCARD_MAX_DF = 64  # shingles in > this many docs never become join keys
SIMHASH_DIMS = 16
SIMHASH64_DIMS = 64  # the at-scale fingerprint width
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = 4  # > max_hamming → banding is exact by pigeonhole
COSINE_THRESHOLD = 0.2  # blocked near-dup threshold (synthetic embeddings)

# ---------------------------------------------------------------------------
# Shared oracle-SQL fragments (DuckDB dialect, mirroring operators/dedup.py)
# ---------------------------------------------------------------------------
_SHINGLES_CTE = f"""
  sh AS (
    SELECT doc_id,
           unnest(list_transform(range(len(toks) - {SHINGLE_N - 1}),
                  i -> {" || ' ' || ".join(f"toks[i + {j + 1}]" for j in range(SHINGLE_N))})) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
    WHERE len(toks) >= {SHINGLE_N}
  )
"""

_SIG_COLS = ",\n           ".join(
    f"min(md5('{i}:' || shingle)) AS sig_{i}" for i in range(NUM_HASHES)
)
_N_BANDS = NUM_HASHES // BAND_SIZE
_BAND_SELECTS = "\n    UNION ALL\n".join(
    "    SELECT doc_id, {b} AS band_idx, {expr} AS band_val FROM sigs".format(
        b=b,
        expr=" || '|' || ".join(
            f"sig_{b * BAND_SIZE + j}" for j in range(BAND_SIZE)
        ),
    )
    for b in range(_N_BANDS)
)

_HIGH = "('8','9','a','b','c','d','e','f')"
_VOTE_COLS = ",\n           ".join(
    f"sum(CASE WHEN substr(h, {d + 1}, 1) IN {_HIGH} THEN 1 ELSE -1 END) AS v_{d}"
    for d in range(SIMHASH_DIMS)
)
_BIT_CONCAT = " || ".join(
    f"(CASE WHEN v_{d} > 0 THEN '1' ELSE '0' END)" for d in range(SIMHASH_DIMS)
)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) AS is_original,
           min(doc_id) OVER (PARTITION BY md5(text)) AS original_id
    FROM documents
    """,
    doc="Exact keep-first dedup by content hash "
    "(validator/integrity.py:150-170,348-370).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicates(d, "doc_id", "text")


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_id,
           {_SIG_COLS}
    FROM sh GROUP BY doc_id
    """,
    doc=f"MinHash signatures ({NUM_HASHES} hashes over word-{SHINGLE_N}-gram "
    "shingles); lexicographic min of a portable hash family.",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(
        d, "doc_id", "text", n=SHINGLE_N, num_hashes=NUM_HASHES
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
      SELECT doc_id,
             {_SIG_COLS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
{_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
    WHERE a.doc_id < b.doc_id
    """,
    doc=f"MinHash-LSH candidate pairs ({_N_BANDS} bands x {BAND_SIZE} rows): "
    "the scale path for near-dedup — only band-colliding pairs shuffle.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        d, "doc_id", "text", n=SHINGLE_N, num_hashes=NUM_HASHES
    )
    return dedup.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )


_SIG_MATCH = " + ".join(
    f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
    for i in range(NUM_HASHES)
)


@register(
    "dedup_minhash_verified_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
      SELECT doc_id,
             {_SIG_COLS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(({_SIG_MATCH}) / {NUM_HASHES}.0, 4) AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b
    WHERE round(({_SIG_MATCH}) / {NUM_HASHES}.0, 4) >= {JACCARD_THRESHOLD}
    """,
    doc="The full MinHash pipeline end-to-end: signatures → LSH band "
    "candidates → resemblance estimated from signature agreement "
    "(matching components / k). Verification never re-reads the "
    "shingle sets — fixed-width signature rows are the only verify "
    "traffic at corpus scale.",
)
def dedup_minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_estimated_pairs(
        d, "doc_id", "text", n=SHINGLE_N, num_hashes=NUM_HASHES,
        band_size=BAND_SIZE, min_est=JACCARD_THRESHOLD,
    )


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    hot AS (
      SELECT shingle FROM (
        SELECT shingle, count(*) AS df FROM dsh GROUP BY shingle
      ) WHERE df > {JACCARD_MAX_DF}
    ),
    joinable AS (
      SELECT doc_id, shingle FROM dsh
      WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    pre AS (
      SELECT doc_id, shingle, rk, nj FROM (
        SELECT doc_id, shingle,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY md5(shingle), shingle) AS rk,
               count(*) OVER (PARTITION BY doc_id) AS nj
        FROM joinable
      ) WHERE rk <= nj - ceil({JACCARD_THRESHOLD} * nj) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pre a JOIN pre b ON a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id
        AND b.nj >= {JACCARD_THRESHOLD} * a.nj
        AND a.nj >= {JACCARD_THRESHOLD} * b.nj
        AND least(a.nj - a.rk, b.nj - b.rk) + 1 >=
            ceil({JACCARD_THRESHOLD} / (1.0 + {JACCARD_THRESHOLD})
                 * (a.nj + b.nj))
    ),
    jsizes AS (
      SELECT doc_id, count(*) AS n_sh FROM joinable GROUP BY doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN joinable da ON da.doc_id = c.id_a
      JOIN joinable db ON db.doc_id = c.id_b AND db.shingle = da.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM inter i
    JOIN jsizes sa ON sa.doc_id = i.id_a
    JOIN jsizes sb ON sb.doc_id = i.id_b
    WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= {JACCARD_THRESHOLD}
    """,
    doc="n-gram Jaccard near-dup pairs, PPJoin-style: df-capped "
    f"(> {JACCARD_MAX_DF} docs → boilerplate, excluded from join-key "
    "duty AND from the declared similarity measure, like stop-phrase "
    "removal) + prefix/length/positional-filtered candidates, exact "
    "verify over the same joinable universe the filters bound — the "
    "agreement is what makes the pruning lossless "
    "(operators/dedup.py ngram_jaccard_pairs).",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM tok),
    votes AS (
      SELECT doc_id,
           {_VOTE_COLS}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {_BIT_CONCAT} AS simhash FROM votes
    """,
    doc=f"SimHash {SIMHASH_DIMS}-bit fingerprints (perceptual-hash analog, "
    "validator/integrity.py:108-127).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_fingerprints(d, "doc_id", "text", dims=SIMHASH_DIMS)


def _sql_vote64(d: int) -> str:
    pos, bit = dedup.simhash_dim_nibble(d)
    nibs = ", ".join(f"'{c}'" for c in dedup._BIT_NIBBLES[bit])
    return (
        f"sum(CASE WHEN substr(h, {pos + 1}, 1) IN ({nibs}) "
        f"THEN 1 ELSE -1 END) AS v_{d}"
    )


_VOTE64_COLS = ",\n           ".join(_sql_vote64(d) for d in range(SIMHASH64_DIMS))
_BIT64_CONCAT = " || ".join(
    f"(CASE WHEN v_{d} > 0 THEN '1' ELSE '0' END)" for d in range(SIMHASH64_DIMS)
)


@register(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM tok),
    votes AS (
      SELECT doc_id,
           {_VOTE64_COLS}
      FROM hashed GROUP BY doc_id
    ),
    fps AS (SELECT doc_id, {_BIT64_CONCAT} AS simhash FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(hamming(a.simhash, b.simhash) AS BIGINT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE hamming(a.simhash, b.simhash) <= {SIMHASH_MAX_HAMMING}
    """,
    doc=f"SimHash near-dup pairs at hamming <= {SIMHASH_MAX_HAMMING} over "
    f"{SIMHASH64_DIMS}-bit fingerprints via Manku-style "
    f"{SIMHASH_BANDS}-band candidates (exact by pigeonhole; the oracle "
    "verifies with a brute-force hamming cross-join, so the banding "
    "must lose nothing).",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fps = dedup.simhash_fingerprints(d, "doc_id", "text", dims=SIMHASH64_DIMS)
    return dedup.simhash_hamming_pairs(
        fps, "doc_id", dims=SIMHASH64_DIMS,
        max_hamming=SIMHASH_MAX_HAMMING, n_bands=SIMHASH_BANDS,
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
_DOT = (
    "list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE)))"
)


def _sql_cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"sqrt({_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_DOT.format(a=b, b=b)})"
    return f"round({dot} / ({na} * {nb}), 6)"


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS vq FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {_sql_cos('embedding', 'vq')} AS cosine
    FROM embeddings, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k against the vec_id=0 query vector — "
    "the exact-ANN baseline (scan + TakeOrderedAndProject).",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("vq"))
    cos = F.round(
        similarity.cosine_expr(F.col("embedding"), F.col("vq")), 6
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "dedup_embedding_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cos('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b ON a.label = b.label
    WHERE a.vec_id < b.vec_id
      AND {_sql_cos('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
    """,
    doc="Blocked embedding near-dup pairs: label-blocked cosine join "
    "(O(sum block^2), not O(n^2)).",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.blocked_cosine_pairs(
        e, "vec_id", "embedding", "label", threshold=COSINE_THRESHOLD
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
_SW_LIST = ", ".join(f"'{s}'" for s in textstats.ENGLISH_STOPWORDS)
_LANGS = sorted(textstats.LANG_STOPWORDS)


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textstats.LANG_STOPWORDS[lang])
    return (
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"t -> list_contains([{words}], lower(t))))"
    )


_SQL_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)
_SQL_PUNCT_N = (
    "(length(text) - length(regexp_replace(text, '[^0-9A-Za-z\\s]', '', 'g')))"
)
_SQL_SW_HITS = (
    "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
    f"t -> list_contains([{_SW_LIST}], lower(t))))"
)

_SQL_LANG_CASE = "CASE " + " ".join(
    f"WHEN best > 0 AND h_{lang} = best THEN '{lang}'" for lang in _LANGS
) + " ELSE 'und' END"


@register(
    "text_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             round(CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST({_SQL_PUNCT_N} AS DOUBLE) / length(text) END, 4) AS punct_ratio,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST({_SQL_PUNCT_N} AS DOUBLE) / length(text) END AS punct_raw,
             CAST({_SQL_SW_HITS} AS BIGINT) AS sw_hits,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
             {", ".join(f"CAST({_sql_hits(lang)} AS BIGINT) AS h_{lang}" for lang in _LANGS)}
      FROM documents
    ),
    s AS (
      SELECT *,
             greatest({", ".join("h_" + lang for lang in _LANGS)}) AS best,
             CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE CAST(sw_hits AS DOUBLE) / n_tokens END AS sw_ratio
      FROM m
    )
    SELECT doc_id, n_tokens, n_chars, punct_ratio,
           round(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN punct_raw <= 0.2 THEN 1.0 ELSE 0.0 END)
                + (CASE WHEN sw_ratio >= 0.01 AND sw_ratio <= 0.6 THEN 1.0 ELSE 0.0 END)) / 3.0,
                 4) AS quality_score,
           {_SQL_LANG_CASE} AS lang_pred,
           fingerprint
    FROM s
    """,
    doc="One-pass text metrics: token count, punct ratio, quality score, "
    "heuristic lang-id (stopword votes), normalized md5 fingerprint.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return textstats.text_stats(d, "doc_id", "text")


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH m AS (
      SELECT lang,
             {", ".join(f"CAST({_sql_hits(l)} AS BIGINT) AS h_{l}" for l in _LANGS)}
      FROM documents
    ),
    s AS (SELECT lang, greatest({", ".join("h_" + l for l in _LANGS)}) AS best, *
          FROM m)
    SELECT lang AS lang_true, {_SQL_LANG_CASE} AS lang_pred, count(*) AS n
    FROM s GROUP BY 1, 2
    """,
    doc="Language-ID confusion matrix: heuristic prediction vs labeled "
    "lang column.",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = textstats.with_text_features(d, "text")
    return (
        feats.select(F.col("lang").alias("lang_true"), "lang_pred")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
