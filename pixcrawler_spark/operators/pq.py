"""Product quantization (PQ) for the embedding ANN family.

The missing compression tier of the 100 TB scale path. The existing
families shrink the CANDIDATE SET (SRP buckets, IVF inverted lists)
but still store and scan full float vectors inside the candidates. PQ
shrinks the VECTORS: a d-dim float vector (d=64 → 256 B at float32)
becomes ``n_sub`` small integer codes (8 codes → 8 B at 256 codewords
per subspace), a 32× compression, so a 100 TB float corpus becomes a
~3 TB code table that is memory-resident on a modest cluster and is
scanned map-only — the design of FAISS ``IndexPQ`` / ``IndexIVFPQ``
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; public method).

Layout
------
- The vector is split into ``n_sub`` contiguous subspaces of
  ``sub_dim`` dims each (``n_sub * sub_dim == d``).
- Per subspace, a codebook of ``n_codewords`` centroids. Production
  PQ uses 256 (codes are single bytes) trained by k-means on a
  driver-side sample; this module keeps the codebook DETERMINISTIC
  and oracle-expressible with the same trick as ``similarity.
  ivf_topk``: codeword ``c`` of subspace ``m`` is the ``m``-th slice
  of the corpus vector with id ``c`` (the first ``n_codewords`` rows).
  The codebook is therefore ~``n_codewords`` rows — broadcast, never
  shuffled.
- Encoding is a SINGLE map-only scan: the codebook is folded into ONE
  broadcast row (a nested array literal-from-data), and the per-row
  argmin over codewords is a pure expression tree
  (``transform``/``aggregate``/``array_position``) — unlike the IVF
  assignment there is NO window and NO shuffle anywhere in the encode
  plan (asserted by tests/test_similarity_pq.py's plan audit).
- Query time = asymmetric distance computation (ADC): the query vector
  is NOT quantized; a distance table dt[m][c] = ||q_m - cb[m][c]||²
  (n_sub × n_codewords doubles, one broadcast row) turns each stored
  code vector into ``n_sub`` table lookups + adds. Top-k is a single
  TakeOrderedAndProject — at 10^10 vectors the whole query is one
  map-only pass over the 8-byte codes plus a k-row reduction.

Reference analog: the reference has no vector search at all; this
extends its two-tier hash dedup (validator/integrity.py:108-249) the
same way operators/similarity.py does, one tier deeper in the memory
hierarchy.

Determinism/oracle notes: every squared distance is computed
element-wise in double precision ((x-y)*(x-y), sequential left fold
from 0.0) and rounded to ``round_to`` decimals BEFORE the argmin /
the ADC sum, and ties pick the smallest codeword id (``array_position``
returns the FIRST minimum) — the DuckDB oracle in queries/roundfour.py
mirrors each step exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def codewords_for(expected_n: int) -> int:
    """Codebook size per subspace, derived from the corpus like
    ``similarity.centroids_for``: production is 256 (byte codes), but
    a deterministic first-K codebook needs every codeword to quantize
    ≥ a handful of corpus rows to be meaningful, so cap at the power
    of two nearest √n. n=512 → 16; n ≥ 262144 → 256."""
    return int(min(256, 1 << max(2, round(math.log2(max(4, expected_n)) / 2))))


def _sub_slice(vec: Column, m: int, sub_dim: int) -> Column:
    """Subspace ``m``'s contiguous slice, cast to double element-wise
    (float32 storage → exact double widening, matching the oracle's
    CAST AS DOUBLE)."""
    return F.transform(
        F.slice(vec, m * sub_dim + 1, sub_dim), lambda x: x.cast("double")
    )


def _d2(a: Column, b: Column) -> Column:
    """||a-b||² as a sequential double left fold — identical
    evaluation order to DuckDB's list_sum over list_transform."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook_row(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_codewords: int,
    n_sub: int,
    sub_dim: int,
) -> DataFrame:
    """ONE-row DataFrame ``(cb)`` with
    ``cb[m][c] = slice(vector_c, m)`` — the deterministic first-K
    codebook folded to a broadcastable nested array. The aggregation
    touches ``n_codewords`` rows (a pushed-down id filter), so the
    "training" cost is O(K), independent of corpus size."""
    vecs = (
        df.where(F.col(id_col) < n_codewords)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v")))
            ).alias("s")
        )
        .select(F.transform("s", lambda r: r["v"]).alias("vecs"))
    )
    def _slicer(m: int):
        # factory, NOT a default-arg lambda: pyspark reads a 2-arg
        # lambda as (element, index) and would bind m to the index
        return lambda v: _sub_slice(v, m, sub_dim)

    cb = F.array(
        *[F.transform("vecs", _slicer(m)) for m in range(n_sub)]
    )
    return vecs.select(cb.alias("cb"))


def pq_encode(
    df: DataFrame,
    codebook_row: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int,
    sub_dim: int,
    round_to: int = 6,
) -> DataFrame:
    """``(id, codes array<int>)`` — each vector quantized to its
    nearest codeword per subspace (0-based codeword ids, first-min
    tie-break). Map-only: broadcast crossJoin of the single codebook
    row, argmin as ``array_position(d2s, array_min(d2s))`` — no
    window, no shuffle (the 8-byte-per-vector output of the 100 TB
    compression claim)."""
    def _d2_to(sl: Column):
        return lambda c: F.round(_d2(sl, c), round_to)

    code_cols = []
    for m in range(n_sub):
        sl = _sub_slice(F.col(vec_col), m, sub_dim)
        d2s = F.transform(F.col("cb")[m], _d2_to(sl))
        code_cols.append(
            (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")
        )
    return (
        df.crossJoin(F.broadcast(codebook_row))
        .select(F.col(id_col), F.array(*code_cols).alias("codes"))
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_codewords: int = 16,
    n_sub: int = 8,
    sub_dim: int = 8,
    round_to: int = 6,
    candidates: DataFrame | None = None,
    rerank: int = 0,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Flat-PQ asymmetric-distance top-k: ``(id, approx_d2)``
    ascending (smaller = nearer), id tiebreak. ``candidates`` (an
    ``(id)``-schema DataFrame) restricts the scanned codes — pass the
    probed IVF lists to get IVF-PQ, the canonical web-scale ANN
    configuration (coarse probe shrinks candidates ~nprobe/K, PQ
    shrinks bytes-per-candidate ~32×).

    ``rerank > k`` enables the production two-stage read: ADC selects
    a ``rerank``-sized shortlist from the compressed codes, then ONLY
    those rows' full float vectors are fetched (a broadcast semi-join
    of ``rerank`` ids against the corpus — the random-read tier of a
    FAISS-style deployment) and re-scored with exact ``(id, d2)``.
    Measured on the uniform-random fixture (no cluster structure, the
    adversarial case for a 16-codeword codebook): pure ADC recall@10
    = 0.3, rerank=100 (20%% shortlist) = 0.8 — the knob trades one
    bounded exact-read batch for recall, while the 32× compressed
    scan still prices the bulk of the corpus.

    ``codes`` (an ``(id, codes)`` frame from :func:`pq_encode`, e.g.
    read back from a TableStore like the incremental-dedup corpus
    signatures) skips the encode entirely: the deployment shape is
    encode ONCE when a round's delta arrives, append the codes, and
    answer every later query from the stored 8-byte codes — the float
    vectors are then touched only by the ``rerank`` stage."""
    cb_row = pq_codebook_row(df, id_col, vec_col, n_codewords, n_sub, sub_dim)
    if codes is None:
        scanned = df if candidates is None else df.join(
            candidates.select(id_col), id_col
        )
        encoded = pq_encode(
            scanned, cb_row, id_col, vec_col, n_sub, sub_dim, round_to
        )
    else:
        encoded = codes.select(id_col, "codes")
        if candidates is not None:
            encoded = encoded.join(candidates.select(id_col), id_col)

    # distance table from the ONE query row: dt[m][c] (rounded like the
    # encode distances so the oracle's join on rounded values matches)
    qrow = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_vq")
    )
    def _qd2(m: int):
        sl = _sub_slice(F.col("_vq"), m, sub_dim)
        return lambda c: F.round(_d2(sl, c), round_to)

    dt = F.array(
        *[F.transform(F.col("cb")[m], _qd2(m)) for m in range(n_sub)]
    )
    dt_row = qrow.crossJoin(F.broadcast(cb_row)).select(dt.alias("dt"))

    approx = F.round(
        sum(
            (F.col("dt")[m][F.col("codes")[m]] for m in range(n_sub)),
            F.lit(0.0),
        ),
        round_to,
    )
    adc = (
        encoded.crossJoin(F.broadcast(dt_row))
        .select(F.col(id_col), approx.alias("approx_d2"))
        .orderBy(F.asc("approx_d2"), F.asc(id_col))
    )
    if rerank <= k:
        return adc.limit(k)
    shortlist = adc.limit(rerank).select(id_col)
    qvec = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_vq")
    )
    exact = F.round(
        _d2(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.transform(F.col("_vq"), lambda x: x.cast("double")),
        ),
        round_to,
    )
    return (
        df.join(F.broadcast(shortlist), id_col)
        .crossJoin(F.broadcast(qvec))
        .select(F.col(id_col), exact.alias("d2"))
        .orderBy(F.asc("d2"), F.asc(id_col))
        .limit(k)
    )
