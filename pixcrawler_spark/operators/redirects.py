"""Redirect-chain resolution by pointer doubling.

A real crawl frontier is full of redirects: 3xx chains, canonical-link
rewrites, URL-shortener hops. The frontier must resolve every candidate
to its FINAL url before the seen-set join, or the crawler fetches the
same terminal page once per alias and the politeness budget is charged
to the wrong host. The reference resolves redirects implicitly (its
HTTP client follows them one request at a time, downloader.py's
requests session); at 10^10 urls resolution has to happen in bulk,
set-at-a-time, before any fetch.

The redirect map is a FUNCTIONAL graph (each url has at most one
target), so chain-following is function iteration — and function
iteration over a distributed table is the classic pointer-doubling /
path-halving problem: composing the map with itself squares the hop
distance covered per join, so a chain of length L resolves in
ceil(log2(L)) self-joins instead of L. At crawl scale (chains are
short, the TABLE is huge) this means ~4-6 shuffles total, each a
same-keyed equi-join that AQE plans as one exchange per side, instead
of one shuffle per hop with the full table recirculating every time.

Cycles (a→b→a redirect loops — they exist in the wild and are a
classic crawler trap) never reach a terminal node; after the doubling
budget they are reported as ``is_cycle`` instead of looping forever.
Spark-side semantics are verified against a DuckDB recursive-CTE
oracle (queries/frontiersched.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects"]


def resolve_redirects(
    nodes: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    src_col: str = "src",
    dst_col: str = "dst",
    max_doublings: int = 6,
) -> DataFrame:
    """Resolve every url in ``nodes`` to its redirect-chain terminal.

    ``edges`` is the functional redirect map (one row per redirecting
    url: src → dst). Urls absent from ``edges``' src side are terminal.

    Returns (url, final_url, hops, is_cycle):
      - terminal url: final_url = itself, hops = 0
      - chain of length L <= 2**max_doublings: final_url = terminal,
        hops = L
      - cycle member (no terminal within 2**max_doublings hops):
        is_cycle = true, final_url = '' and hops = -1 (concrete
        sentinels, not NULL, so cross-engine value hashes are stable).

    Each doubling composes the partial map with itself:
    ``J_{k+1}(n) = J_k(J_k(n))`` where defined, else ``J_k(n)``, with
    hop counts summed — ceil(log2(max_chain)) equi-joins total, vs one
    join PER HOP for naive iteration. 2**6 = 64 hops of reach is far
    beyond any real redirect policy (browsers cap at ~20).
    """
    # J(n) = (reach after <= 2^k hops, hops walked). Start: one hop.
    jump = edges.select(
        F.col(src_col).alias("n"),
        F.col(dst_col).alias("reach"),
        F.lit(1).cast("int").alias("steps"),
    )
    prev = None
    for _ in range(max_doublings):
        b = jump.select(
            F.col("n").alias("b_n"),
            F.col("reach").alias("b_reach"),
            F.col("steps").alias("b_steps"),
        )
        jump = (
            jump.join(b, jump["reach"] == b["b_n"], "left")
            .select(
                "n",
                F.coalesce("b_reach", "reach").alias("reach"),
                (
                    F.col("steps") + F.coalesce("b_steps", F.lit(0))
                ).alias("steps"),
            )
            # each doubling references the previous J TWICE (probe and
            # build side of the self-join); without a persist per
            # round the lineage re-evaluates 2^max_doublings times —
            # the same exponential-lineage trap the CC loop hit
            # (operators/trainprep.connected_components). Measured on
            # the sf0.01 oracle fixture: 558-node physical plan (64
            # re-scans of edges) unpersisted vs ~3 joins per doubling
            # persisted.
            .persist()
        )
        # materialize BEFORE releasing the previous level — an
        # unpersisted-but-unmaterialized J would recompute through its
        # (also released) parent and the blowup returns. One count per
        # doubling; each is the join work the algorithm does anyway.
        jump.count()
        if prev is not None:
            prev.unpersist()
        prev = jump
    # the final J stays cached until the caller's action completes;
    # it is exposed on the result as ``_doubling_cached`` so callers
    # that persist+materialize the RESULT (e.g. the crawl engine's
    # once-per-crawl alias map) can release it; the registry query
    # wrapper's clearCache covers the oracle path.

    # terminal test: reach still redirects somewhere => chain did not
    # terminate inside the budget => cycle (or pathologically long
    # chain, reported the same way — the crawler abandons both).
    still_redirects = edges.select(
        F.col(src_col).alias("reach"), F.lit(True).alias("_open")
    ).dropDuplicates(["reach"])
    resolved = (
        jump.join(still_redirects, "reach", "left")
        .select(
            F.col("n").alias(url_col),
            F.when(F.col("_open").isNotNull(), F.lit(""))
            .otherwise(F.col("reach"))
            .alias("final_url"),
            F.when(F.col("_open").isNotNull(), F.lit(-1))
            .otherwise(F.col("steps"))
            .cast("int")
            .alias("hops"),
            F.col("_open").isNotNull().alias("is_cycle"),
        )
    )
    out = (
        nodes.select(F.col(url_col))
        .join(resolved, url_col, "left")
        .select(
            url_col,
            F.coalesce("final_url", F.col(url_col)).alias("final_url"),
            F.coalesce("hops", F.lit(0)).cast("int").alias("hops"),
            F.coalesce("is_cycle", F.lit(False)).alias("is_cycle"),
        )
    )
    out._doubling_cached = jump  # see loop comment above
    return out
