"""Shared ANN parameters + SQL-oracle helpers (NO query registrations).

Split out of queries/scalepath.py so the round-4 recall/cost-frontier
query (queries/roundfour.py, registered FIRST for the driver window)
can share the exact SRP hyperplanes / IVF codebook constants without
importing scalepath — importing a query module registers its queries,
which would scramble the rotation schedule in queries/__init__.py.
"""

from __future__ import annotations

from pixcrawler_spark.operators import similarity

EMB_DIM = 64
# Plane count DERIVED from the expected corpus, not a fixed literal
# (similarity.planes_for): bucket population ~ n / 2^planes. The
# registered-query constants document the derivation — the oracle SQL
# is static text, so the expectation is a declared constant, not a
# runtime count; re-derive when pointing the query at a new corpus
# scale. EXPECTED_N=512 ≈ the embeddings table at the driver's sf0.01.
EXPECTED_N = 512
N_PLANES = similarity.planes_for(EXPECTED_N, target_bucket=32)  # = 4
N_PLANES_FINE = similarity.planes_for(EXPECTED_N, target_bucket=8)  # = 6


def _plane(p: int) -> list[float]:
    """Deterministic hyperplane p: component j =
    (((p*EMB_DIM + j) * 2654435761 + 42) mod 2001 - 1000) / 1000 —
    a documented integer-hash literal shared with the SQL oracle."""
    return [
        ((((p * EMB_DIM + j) * 2654435761 + 42) % 2001) - 1000) / 1000.0
        for j in range(EMB_DIM)
    ]


PLANES = [_plane(p) for p in range(max(N_PLANES, N_PLANES_FINE))]


def _sql_plane_bit(p: int) -> str:
    lit = "[" + ", ".join(f"{x!r}" for x in PLANES[p]) + "]"
    dot = (
        f"list_sum(list_transform(range(len(embedding)), "
        f"i -> CAST(embedding[i + 1] AS DOUBLE) * ({lit})[i + 1]))"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


def _sql_bucket(n_planes: int) -> str:
    return " || ".join(_sql_plane_bit(p) for p in range(n_planes))


_SQL_BUCKET = _sql_bucket(N_PLANES)

# IVF parameters DERIVED from the expected corpus (similarity.
# centroids_for / nprobe_for — same pattern as planes_for above): the
# oracle SQL is static text, so the expectation is the declared
# EXPECTED_N constant; re-derive when pointing at a new corpus scale.
K_CENTROIDS = similarity.centroids_for(EXPECTED_N)  # = 23 at n=512
NPROBE = similarity.nprobe_for(K_CENTROIDS)  # = 3 (recall knob)

RECALL_K = 10

# Product-quantization parameters (operators/pq.py): the vector's 64
# dims split into PQ_M contiguous subspaces of PQ_SUB_DIM dims; each
# subspace quantized against PQ_KS codewords (production: 256 = byte
# codes; here derived from the corpus like K_CENTROIDS so every
# codeword quantizes a meaningful share of the 512-row fixture).
PQ_M = 8
PQ_SUB_DIM = EMB_DIM // PQ_M  # = 8
from pixcrawler_spark.operators import pq as _pq

PQ_KS = _pq.codewords_for(EXPECTED_N)  # = 16 at n=512
