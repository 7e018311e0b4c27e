"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Maps the reference's two-tier duplicate detection (MD5 content hash +
perceptual aHash over images, validator/integrity.py:108-249,348-426)
onto text-scale dedup, Spark-first:

- exact dedup      → groupBy(md5(content)) keep-first (hash aggregate)
- minhash + LSH    → shingle explode → min(md5(seed:shingle)) per seed
                     (lexicographic MinHash) → band join → candidate
                     pairs; at 100 TB the band join is the only shuffle
                     and keys are uniformly-distributed hashes (no skew)
- simhash          → per-token md5 nibble bits → ±1 sums per dimension
                     → up-to-128-bit fingerprint; near-dup pairs via
                     Manku-style hamming bands (exact by pigeonhole)
- n-gram jaccard   → PPJoin-style: df-capped + prefix-filtered
                     candidates, exact full-set verify

All operators are pure DataFrame expressions (whole-stage codegen; no
Python UDFs). Hash choice is md5-hex because the DuckDB oracle computes
the identical value — MinHash over lexicographic string order is
order-isomorphic to MinHash over any injective map of it, so this is a
real MinHash, just with a portable hash family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

# Hex chars with bit k set (k=3 is the high bit) — simhash bit
# extraction stays a pure IN-list test, portable to the DuckDB oracle.
_BIT_NIBBLES = {
    3: ("8", "9", "a", "b", "c", "d", "e", "f"),
    2: ("4", "5", "6", "7", "c", "d", "e", "f"),
    1: ("2", "3", "6", "7", "a", "b", "e", "f"),
    0: ("1", "3", "5", "7", "9", "b", "d", "f"),
}
_HIGH_NIBBLES = _BIT_NIBBLES[3]


def simhash_dim_nibble(d: int) -> tuple[int, int]:
    """Dimension → (hex position, bit index) of md5(token). The first
    32 dimensions read the high bit of hex digit d (the original
    16/32-dim scheme, unchanged); dimensions 32.. take the next bit of
    the same digits, up to 128 total from one md5."""
    return d % 32, 3 - d // 32


def tokens_expr(text_col: str):
    """Whitespace tokenization of trimmed text (portable to DuckDB's
    regexp_split_to_array)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Explode word n-gram shingles: one row per (id, shingle).

    Documents with fewer than ``n`` tokens produce no shingles (same
    as the oracle's range() producing an empty list).
    """
    toks = tokens_expr(text_col)
    parts = " || ' ' || ".join(f"_toks[i + {j}]" for j in range(n))
    shingles = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), i -> {parts})"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
    )


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep-first exact dedup (validator/integrity.py:348-370 semantics):
    group rows by content hash, keep the lowest id as the original.

    Returns (id, content_hash, is_original, original_id).
    """
    hashed = df.select(
        F.col(id_col), F.md5(F.col(content_col)).alias("content_hash")
    )
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return hashed.select(
        F.col(id_col),
        "content_hash",
        (F.row_number().over(w) == 1).alias("is_original"),
        F.min(id_col).over(Window.partitionBy("content_hash")).alias("original_id"),
    )


def shingle_array(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-row word n-gram shingle array: (id, _shingles: array<string>).

    A document's shingles derive from its own text alone, so there is
    nothing to explode and re-group: the array is built row-local
    inside codegen — ZERO shuffles. Documents with fewer than ``n``
    tokens are dropped (same as the oracle's range() producing an
    empty list). May contain duplicate shingles; callers that need the
    set apply ``array_distinct`` (still row-local).
    """
    toks = tokens_expr(text_col)
    parts = " || ' ' || ".join(f"_toks[i + {j}]" for j in range(n))
    arr = F.expr(f"transform(sequence(0, size(_toks) - {n}), i -> {parts})")
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.col(id_col), arr.alias("_shingles"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per document: sig_i = min(md5(i || ':' || shingle)).

    ZERO shuffles: each signature component is an ``array_min`` over
    the row-local shingle array (min is idempotent under duplicate
    shingles, so no distinct pass is needed). The whole operator is a
    scan + project inside whole-stage codegen — at corpus scale the
    only shuffle in a MinHash dedup pipeline is the LSH band join.
    Returns (id, sig_0..sig_{k-1}).
    """
    sh = shingle_array(df, id_col, text_col, n)

    def _sig(i: int):
        # one-arg lambda on purpose: a two-arg lambda would be read by
        # F.transform as (element, index)
        return F.array_min(
            F.transform(
                "_shingles", lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))
            )
        ).alias(f"sig_{i}")

    return sh.select(F.col(id_col), *[_sig(i) for i in range(num_hashes)])


def band_long(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Unpivot signatures into the banded long form: one row per
    (id, band_idx, band_val), band_val = concat of ``band_size``
    consecutive signature components. This is the join-key layout LSH
    banding shuffles on; a persisted / stored copy of it (bucketed on
    the band columns) is what incremental dedup reuses round to round.
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    bands = [
        F.concat_ws(
            "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(F.col(id_col), *bands)
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    return banded.select(
        F.col(id_col),
        F.expr(f"stack({n_bands}, {stack_expr}) as (band_idx, band_val)"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: concat ``band_size`` consecutive sigs per band, join
    docs sharing any band value. Returns distinct (id_a, id_b), a < b.

    The band join shuffles on uniformly-distributed hash keys — no skew
    by construction; duplicate-heavy corpora produce hot bands which AQE
    skew-join splits.
    """
    long = band_long(sigs, id_col, num_hashes, band_size).persist()
    # ^ both self-join sides derive from long; without the persist the
    # md5-per-shingle signature computation upstream is planned twice
    a = long.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_val"
    )
    b = long.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def incremental_minhash_pairs(
    delta_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est: float = 0.5,
) -> DataFrame:
    """Delta-vs-(corpus ∪ delta) MinHash near-dup discovery — the
    round-loop form of :func:`minhash_estimated_pairs`.

    A 100 TB pipeline never rescans the accumulated corpus to dedup a
    new round's delta: corpus *signatures* are computed exactly once
    (when their round was the delta), appended to a store, and each
    round joins only ``delta_bands × all_bands``. Returns every pair
    with at least one side in the delta — over rounds, the union of
    these is exactly the batch recompute's pairs (each pair surfaces
    in the round its later member arrives; test_dedup_incremental
    asserts this equivalence through a TableStore round loop).

    Caller contract: delta ids are disjoint from corpus ids (the
    seen-set anti-join guarantees this in the crawl plan).

    Scale shape: the only data-sized shuffle is the band equi-join,
    and only the delta side moves if the stored corpus long form is
    bucketed on (band_idx, band_val) — the same static-side/bucketed
    pattern as the seen-set anti-join (plans/crawl.py). Signature
    agreement verifies candidates on fixed-width rows; document text
    is never touched after signature time.

    Returns (id_a, id_b, est_jaccard), a < b, est >= min_est.
    """
    delta_sigs = delta_sigs.persist()
    all_sigs = corpus_sigs.unionByName(delta_sigs).persist()
    d_long = band_long(delta_sigs, id_col, num_hashes, band_size)
    a_long = band_long(all_sigs, id_col, num_hashes, band_size)
    cand = (
        d_long.select(F.col(id_col).alias("_d"), "band_idx", "band_val")
        .join(
            a_long.select(F.col(id_col).alias("_o"), "band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        .where(F.col("_d") != F.col("_o"))
        .select(
            F.least("_d", "_o").alias("id_a"),
            F.greatest("_d", "_o").alias("id_b"),
        )
        .distinct()
    )
    sa = all_sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    sb = all_sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int")
        for i in range(num_hashes)
    )
    est = F.round(matches / F.lit(float(num_hashes)), 4)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= min_est)
    )


def minhash_estimated_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est: float = 0.5,
) -> DataFrame:
    """The full MinHash dedup pipeline end-to-end: signatures → LSH
    band candidates → resemblance ESTIMATED from signature agreement
    (matching components / num_hashes — the classic MinHash estimator,
    never touching the raw shingle sets again). At corpus scale this
    is the cheap near-dup path: candidate generation and verification
    both run on the k-value signatures (fixed-width rows), so the
    verify join moves k hashes per doc instead of the document text.

    Returns (id_a, id_b, est_jaccard) with est >= min_est.
    """
    # signatures feed candidate generation AND both verify sides;
    # persist so the shingle explode+aggregate runs once (see
    # ngram_jaccard_pairs for the same materialize-the-sketch note)
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int")
        for i in range(num_hashes)
    )
    est = F.round(matches / F.lit(float(num_hashes)), 4)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= min_est)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard similarity >= threshold,
    PPJoin-style (candidate generation bounded, then exact verify).

    Candidate generation never joins on a hot key:

    1. **Document-frequency cap** (``max_df``): shingles occurring in
       more than ``max_df`` documents — stop-phrases, boilerplate —
       are excluded from JOIN-KEY duty (a shingle shared by d docs
       fans out d² pair rows; one million-doc boilerplate shingle
       would materialize ~10^12 rows). The hot set is tiny by
       construction (few keys can exceed the cap), so it broadcasts
       into a left_anti join.
    2. **Prefix filter** (always on): within the joinable shingles,
       each document contributes only its first
       ``L = |S| - ceil(t·|S|) + 1`` shingles in a global hash order
       as join keys. Classic prefix-filter theorem: two sets with
       Jaccard ≥ t over the joinable universe must share a prefix
       element, so no qualifying candidate is lost, while join fanout
       drops by ~(1-t)² per key.
    3. **PPJoin length + positional filters** (always on): candidate
       pairs must satisfy t·|a| <= |b| <= |a|/t, and some shared
       prefix element must leave enough suffix on BOTH sides to reach
       the overlap bound alpha = ceil(t/(1+t)·(|a|+|b|)). Lossless
       because both documents rank shingles in the SAME global md5
       order (proof in the inline comment).

    **Declared measure**: Jaccard over the JOINABLE shingle universe —
    boilerplate (df > max_df) is excluded from candidate generation
    AND from the similarity measure itself, exactly like stop-phrase
    removal before dedup; a pair similar only through boilerplate is
    not a near-dup by this measure. With ``max_df=None`` the joinable
    universe is the full shingle set. Filters 1-3 and the exact verify
    bound/compute the SAME measure, which is what makes the pruning
    provably lossless (filters derived from one universe with a verify
    over a different one would silently drop qualifying pairs whose
    similarity is carried by hot shingles).

    Verification is exact: candidate pairs join the per-doc joinable
    shingle arrays and intersect JVM-side — a candidate-sized
    shuffle, never a corpus² one. The prefix ranks and the verify
    sets come from ONE window over the exploded joinable shingles
    (persisted; the set aggregation reuses the window's hash(id)
    partitioning), mirroring the oracle SQL verbatim. md5 ordering is
    kept (not a cheaper hash) because the DuckDB oracle prefixes by
    md5 and hot-boundary pairs are order-sensitive.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    # the per-doc shingle SET, materialized once: feeds the df-counter,
    # the prefix branch, and both verify sides
    sh = (
        shingle_array(df, id_col, text_col, n)
        .select(F.col(id_col), F.array_distinct("_shingles").alias("_ss"))
        .persist()
    )

    ex = sh.select(F.col(id_col), F.explode("_ss").alias("shingle"))

    if max_df is not None:
        # shingle document frequency: the one remaining shuffle before
        # candidate generation (map-side combine ⇒ per-partition
        # distinct shingles with partial counts on the wire)
        hot = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("shingle")
        )
        # the hot set is tiny by construction (few shingles can exceed
        # the cap) → broadcast anti hash-join, O(1) per row
        jnr = ex.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        jnr = ex

    # joinable shingles ranked in global md5 order — ONE window shuffle
    # on doc id, mirroring the oracle SQL verbatim; the ranked rows
    # feed the prefix branch (below) AND the per-doc joinable sets the
    # verify measures, so they are persisted un-prefix-filtered and the
    # set aggregation reuses the window's hash(id) partitioning
    # (exchange-free groupBy)
    wo = Window.partitionBy(id_col).orderBy(F.md5("shingle"), "shingle")
    wn = Window.partitionBy(id_col)
    nj = F.count(F.lit(1)).over(wn)
    ranked = jnr.select(
        F.col(id_col),
        "shingle",
        F.row_number().over(wo).alias("rk"),
        nj.alias("nj"),
    ).persist()
    pre = ranked.where(
        F.col("rk")
        <= F.col("nj") - F.ceil(F.lit(threshold) * F.col("nj")) + 1
    )
    # PPJoin pruning, both lossless under the shared global md5 order:
    # - length filter: Jaccard >= t forces t·|a| <= |b| <= |a|/t
    # - positional filter: the FIRST shared element e1 is the same
    #   element on both sides (same total order), and a qualifying
    #   pair has >= alpha shared elements at ranks >= rank(e1), so
    #   min(remaining_a, remaining_b) >= alpha for e1; pairs where no
    #   shared prefix element passes cannot reach overlap alpha.
    #   alpha = ceil(t/(1+t)·(|a|+|b|)) is the overlap equivalent of
    #   Jaccard >= t. remaining = nj - rk + 1 (1-based rank rk).
    # At sf0.1 this cuts candidates ~3x before the exact verify join.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("na") + F.col("nb"))
    )
    cand = (
        pre.select(
            F.col(id_col).alias("id_a"),
            "shingle",
            F.col("rk").alias("ra"),
            F.col("nj").alias("na"),
        )
        .join(
            pre.select(
                F.col(id_col).alias("id_b"),
                "shingle",
                F.col("rk").alias("rb"),
                F.col("nj").alias("nb"),
            ),
            "shingle",
        )
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("nb") >= F.lit(threshold) * F.col("na"))
            & (F.col("na") >= F.lit(threshold) * F.col("nb"))
            & (
                F.least(
                    F.col("na") - F.col("ra"), F.col("nb") - F.col("rb")
                )
                + 1
                >= alpha
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )

    # verify over the SAME joinable universe the filters bound — this
    # is what makes the prefix/length/positional pruning provably
    # lossless: filters and measure agree. With max_df=None the
    # joinable universe IS the full shingle set. (Verifying full sets
    # against joinable-bounded filters would silently drop pairs whose
    # full-set similarity is carried by hot shingles.)
    sj = ranked.groupBy(id_col).agg(
        F.collect_list("shingle").alias("_js"),
        F.max("nj").alias("n_j"),
    )
    sa = sj.select(
        F.col(id_col).alias("id_a"),
        F.col("_js").alias("set_a"),
        F.col("n_j").alias("n_a"),
    )
    sb = sj.select(
        F.col(id_col).alias("id_b"),
        F.col("_js").alias("set_b"),
        F.col("n_j").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = n_inter / (F.col("n_a") + F.col("n_b") - n_inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, dims: int = 16
) -> DataFrame:
    """SimHash fingerprint per document over whitespace tokens.

    Dimension d's bit is the sign of sum over tokens of ±1, where the
    vote is bit ``simhash_dim_nibble(d)`` of md5(token) — up to 128
    dimensions from one md5 (dims >= 64 is what makes SimHash usable
    at 10^9+ docs: 16 bits = 65k buckets floods with unrelated
    collisions above ~10^6). Pure expressions: explode → groupBy(id)
    with ``dims`` conditional sums → bit-string concat.

    Returns (id, simhash) where simhash is a ``dims``-char bit string.
    """
    assert 1 <= dims <= 128
    # The md5 hex is parsed into at most four 32-bit ints (one conv per
    # 8 hex chars), and every dimension's vote is a pure shift/mask on
    # those ints — vs one conv+substring per NIBBLE, this is 8x fewer
    # string ops per token (measured ~3x end-to-end on the 64-dim
    # fingerprint at sf0.1). Bit values are identical to the oracle's
    # nibble-IN-list formulation: hex char pos sits at bits
    # [31-4*(pos%8) .. 28-4*(pos%8)] of chunk pos//8.
    max_pos = max(simhash_dim_nibble(d)[0] for d in range(dims))
    n_chunks = max_pos // 8 + 1
    toks = (
        df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
        .select(F.col(id_col), F.md5(F.col("tok")).alias("h"))
        .select(
            F.col(id_col),
            *[
                F.conv(F.substring("h", 8 * k + 1, 8), 16, 10)
                .cast("bigint")
                .alias(f"q_{k}")
                for k in range(n_chunks)
            ],
        )
    )
    votes = []
    for d in range(dims):
        pos, bit = simhash_dim_nibble(d)
        chunk, j = pos // 8, pos % 8
        shift = (7 - j) * 4 + bit
        bit_set = F.shiftright(F.col(f"q_{chunk}"), shift).bitwiseAND(1) == 1
        votes.append(
            F.sum(F.when(bit_set, 1).otherwise(-1)).alias(f"v_{d}")
        )
    agg = toks.groupBy(id_col).agg(*votes)
    bits = [
        F.when(F.col(f"v_{d}") > 0, "1").otherwise("0") for d in range(dims)
    ]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def simhash_hamming_pairs(
    fps: DataFrame,
    id_col: str,
    sim_col: str = "simhash",
    dims: int = 64,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
    salt_threshold: int | None = None,
) -> DataFrame:
    """Near-dup pairs within hamming distance ``max_hamming`` of a
    ``dims``-bit SimHash — the Manku-style band trick that makes
    SimHash usable at corpus scale.

    Candidates: the fingerprint splits into ``n_bands`` equal
    substrings; by pigeonhole, any pair with hamming <= n_bands - 1
    shares at least one identical band, so the equi-join on
    (band_idx, band_val) is EXACT for ``max_hamming < n_bands`` —
    never all-pairs. Band keys are hash-uniform; duplicate-heavy
    corpora make hot bands, which AQE skew-join splits.

    Verify: exact hamming via 32-bit chunks — conv(binary) → xor →
    bit_count, all JVM codegen.

    Two planted-skew guards, both off by default:

    ``salt_threshold`` — SEMANTICS-PRESERVING two-sided salt split. A
    bucket of m rows puts ~m²/2 candidate rows in one shuffle task; any
    bucket over the threshold splits into g = ceil(m / threshold) salt
    groups per side, the join key grows to (band, salt_a, salt_b), and
    each side replicates g× so every pair still meets EXACTLY once —
    but inside one of g² sub-keys, bounding any task's output for that
    bucket by threshold². Replication cost is confined to the
    over-threshold buckets (the broadcast list of them is tiny,
    ≤ rows/threshold entries).

    ``max_bucket`` — LOSSY boilerplate cut (same shape as ngram's
    df-cap): buckets beyond it are excluded from join-key duty
    entirely. The pigeonhole guarantee then degrades DECLAREDLY: a pair
    survives if ANY of its n_bands shared bands is under the cap, so
    recall loss is confined to mega-clusters hot in every band — which
    representative collapse (:func:`simhash_dup_decision`) removes for
    exact dups, the mass of a duplicate-heavy crawl.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    assert dims % n_bands == 0 and dims % 32 == 0
    assert max_hamming < n_bands, "pigeonhole guarantee needs bands > distance"
    band_len = dims // n_bands
    # both self-join sides derive from fps; without this the upstream
    # fingerprint aggregation (explode + dims conditional sums) is
    # planned twice — once per side (measured ~2x on the 64-dim
    # fingerprint at sf0.1). One row per doc, so the cache is tiny.
    fps = fps.persist()
    stack_expr = ", ".join(
        f"{b}, substring({sim_col}, {b * band_len + 1}, {band_len})"
        for b in range(n_bands)
    )
    long = fps.select(
        F.col(id_col),
        F.col(sim_col),
        F.expr(f"stack({n_bands}, {stack_expr}) as (band_idx, band_val)"),
    )
    if max_bucket is not None:
        hot = (
            long.groupBy("band_idx", "band_val")
            .count()
            .where(F.col("count") > max_bucket)
            .select("band_idx", "band_val")
        )
        long = long.join(
            F.broadcast(hot), ["band_idx", "band_val"], "left_anti"
        )
    join_keys = ["band_idx", "band_val"]
    if salt_threshold is not None:
        big = (
            long.groupBy("band_idx", "band_val")
            .count()
            .where(F.col("count") > salt_threshold)
            .select(
                "band_idx",
                "band_val",
                F.ceil(F.col("count") / salt_threshold)
                .cast("int")
                .alias("_g"),
            )
        )
        long = long.join(F.broadcast(big), ["band_idx", "band_val"], "left")
        long = long.withColumn("_g", F.coalesce(F.col("_g"), F.lit(1)))
        own = F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
        rep = F.explode(F.sequence(F.lit(0), F.col("_g") - 1))
        a = long.select(
            F.col(id_col).alias("id_a"), F.col(sim_col).alias("sim_a"),
            "band_idx", "band_val",
            own.alias("salt_a"), rep.alias("salt_b"),
        )
        b = long.select(
            F.col(id_col).alias("id_b"), F.col(sim_col).alias("sim_b"),
            "band_idx", "band_val",
            rep.alias("salt_a"), own.alias("salt_b"),
        )
        join_keys = join_keys + ["salt_a", "salt_b"]
    else:
        a = long.select(
            F.col(id_col).alias("id_a"), F.col(sim_col).alias("sim_a"),
            "band_idx", "band_val",
        )
        b = long.select(
            F.col(id_col).alias("id_b"), F.col(sim_col).alias("sim_b"),
            "band_idx", "band_val",
        )
    chunks = [
        F.bit_count(
            F.conv(F.substring("sim_a", i * 32 + 1, 32), 2, 10)
            .cast("bigint")
            .bitwiseXOR(
                F.conv(F.substring("sim_b", i * 32 + 1, 32), 2, 10).cast(
                    "bigint"
                )
            )
        )
        for i in range(dims // 32)
    ]
    ham = chunks[0]
    for c in chunks[1:]:
        ham = ham + c
    return (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_dup_decision(
    fps: DataFrame,
    id_col: str,
    sim_col: str = "simhash",
    dims: int = 64,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int = 64,
    salt_threshold: int | None = 8,
) -> DataFrame:
    """Keep-first duplicate DECISION per document — the linear-output
    form a duplicate-heavy (30-50% dup, realistic for CC crawls) corpus
    needs. Emitting all dup PAIRS of a cluster of m copies is O(m²) by
    definition; the pipeline-relevant answer is one row per doc.

    Planted-skew survival, in order:
    1. REPRESENTATIVE COLLAPSE: identical fingerprints group to one
       representative (min id) first. An exact-dup cluster of any size
       becomes ONE row in the band join — the quadratic hot bucket for
       exact dups (the mass of a dup-heavy corpus) never exists.
    2. BAND-BUCKET CAP: near-dup mega-clusters (distinct fingerprints,
       shared bands) are bounded by ``max_bucket``
       (:func:`simhash_hamming_pairs`); tests assert no task sees more
       than 2x the mean candidate rows at a 40% planted dup rate.
    3. The rep→docs fan-back is a linear 1:1 join on the fingerprint
       value plus a min-aggregate — no quadratic anywhere.

    Declared semantics (single pass, not transitive closure): a
    representative is a dup if some candidate representative with a
    smaller id sits within ``max_hamming``; every doc inherits its
    representative's decision, and non-representative group members are
    dups of the group head. Returns
    (id, canonical_id, is_dup) — is_dup ⇔ id != canonical_id.
    """
    fps = fps.persist()
    groups = fps.groupBy(sim_col).agg(F.min(id_col).alias("rep_id"))
    rep_fps = groups.select(F.col("rep_id").alias(id_col), sim_col)
    rep_pairs = simhash_hamming_pairs(
        rep_fps, id_col, sim_col, dims, max_hamming, n_bands,
        max_bucket, salt_threshold,
    )
    # keep-first: each dup representative points at its smallest
    # sufficiently-near representative
    rep_dup = rep_pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    decided = (
        fps.join(groups, sim_col)  # linear: one group row per fp value
        .join(rep_dup, F.col("rep_id") == F.col("id_b"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("dup_of"), F.col("rep_id")).alias("canonical_id"),
        )
    )
    return decided.select(
        id_col,
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment (Broder): bottom-k probe into df-capped sets
# ---------------------------------------------------------------------------
def containment_bottomk_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    max_df: int = 64,
    threshold: float = 0.5,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Asymmetric containment C(A->B) = |S(A) ∩ S(B)| / |S(A)|
    estimated by probing A's bottom-``k`` shingle-hash sketch against
    B's full (df-capped) shingle set — Broder's containment, the
    estimator that catches subset/quote duplicates symmetric Jaccard
    misses (a doc wholly contained in a 10x-longer one has Jaccard
    ~0.1 but containment ~1.0).

    Scale shape (the three guards that keep this corpus-safe):

    1. **Bottom-k probe cut** is a WindowGroupLimit (map-side partial
       top-K by uniform md5 order): <= k probe rows per doc
       regardless of document size — plan-audited in
       tests/test_plan_audits.py.
    2. **df-cap**: shingle-hashes in > ``max_df`` docs (boilerplate)
       never become join keys; the hot set is tiny by construction so
       it broadcasts into a left_anti join. Candidate mass is bounded
       by k * max_df per document — never all-pairs
       (tests/test_containment_skew.py plants a 30%-shared
       boilerplate block and pins this).
    3. The containment denominator is the capped-universe probe count
       (min(k, |S_capped(A)|)) — probes and denominator come from ONE
       universe, so the estimate is the containment OF that universe
       (boilerplate excluded from the measure, same contract as
       :func:`ngram_jaccard_pairs`).

    Returns (a_id, b_id, n_probe, n_hit, containment) for pairs with
    containment >= ``threshold``; containment is round(.,6) for
    cross-engine hash parity, the threshold compares the exact
    rational.
    """
    if max_df_frac is not None:
        # corpus-relative cap: an ABSOLUTE max_df silently tightens as
        # the corpus (or its replication) grows — every common shingle's
        # df scales with |docs|, so the boilerplate FRACTION is the
        # scale-stable knob (measured: the factor-30 bench probe lost
        # half its true pairs to the absolute default). One bounded
        # count() job resolves the cap before the plan is built.
        max_df = max(max_df, int(math.ceil(max_df_frac * df.count())))
    dsh = (
        with_shingles(df, id_col, text_col, n)
        .select(F.col(id_col), F.md5("shingle").alias("h"))
        .distinct()
    )
    hot = (
        dsh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("h")
    )
    capped = dsh.join(F.broadcast(hot), "h", "left_anti").persist()
    w = Window.partitionBy(id_col).orderBy("h")
    probes = (
        capped.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(F.col(id_col), "h")
    )
    np_ = probes.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe")
    )
    hits = (
        probes.alias("p")
        .join(
            capped.alias("t"),
            (F.col("p.h") == F.col("t.h"))
            & (F.col(f"p.{id_col}") != F.col(f"t.{id_col}")),
        )
        .groupBy(
            F.col(f"p.{id_col}").alias("a_id"),
            F.col(f"t.{id_col}").alias("b_id"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    cont = F.col("n_hit") * 1.0 / F.col("n_probe")
    return (
        hits.join(np_.withColumnRenamed(id_col, "a_id"), "a_id")
        .where(cont >= threshold)
        .select(
            "a_id",
            "b_id",
            "n_probe",
            "n_hit",
            F.round(cont, 6).alias("containment"),
        )
    )


def containment_dup_decision(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    max_df: int = 64,
    threshold: float = 0.5,
) -> DataFrame:
    """Linear-output subset-dup DECISION form of
    :func:`containment_bottomk_pairs` (same pattern as
    ``simhash_dup_decision``): per document, is it contained in some
    other document, and in which canonical one?

    A dup-heavy corpus makes PAIR listing O(m²) per exact clique by
    definition (every replica contains every sibling), so the decision
    form first collapses exact-duplicate cliques to one representative
    (md5(text) groups, min-id rep), runs the bottom-k probe join over
    REPRESENTATIVES only, picks each representative's best target
    (containment desc, b_id asc — one max_by aggregate, no pair
    materialization beyond the capped candidate join), and broadcasts
    the decision back to clique members through the linear membership
    join. Clique mass never reaches the probe join; output is exactly
    one row per input document.

    Requires a NUMERIC ``id_col``: the best-target tiebreak negates
    b_id inside the max_by ordering struct (containment desc, b_id
    asc). String ids need a keyed surrogate first (hash ids are the
    frontier's normal form anyway).

    Returns (id_col, contained_in, is_subset_dup): ``contained_in`` is
    the canonical containing doc id (null if none); members of a
    collapsed clique inherit their representative's decision.
    """
    sigs = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_sig")
    ).persist()
    reps = sigs.groupBy("_sig").agg(F.min(id_col).alias("_rep_id"))
    rep_docs = df.join(
        reps.select(F.col("_rep_id").alias(id_col)), id_col, "left_semi"
    )
    pairs = containment_bottomk_pairs(
        rep_docs, id_col, text_col, n=n, k=k, max_df=max_df,
        threshold=threshold,
    )
    best = pairs.groupBy("a_id").agg(
        F.max_by(
            "b_id", F.struct(F.col("containment"), -F.col("b_id"))
        ).alias("contained_in")
    )
    # membership + decision joins key on uniform hashes (_sig / rep
    # id) — plain shuffle joins; reps is corpus-sized (one row per
    # distinct text) so no broadcast hint here
    return (
        sigs.join(reps, "_sig")
        .join(
            best.withColumnRenamed("a_id", "_rep_id"), "_rep_id", "left"
        )
        .select(
            F.col(id_col),
            "contained_in",
            F.col("contained_in").isNotNull().alias("is_subset_dup"),
        )
    )
