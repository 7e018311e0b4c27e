"""Generate the committed golden outputs (FIXTURES.md §5) from the
straight-line pandas oracle — NOT from the Spark engine, so the engine
is checked against an independent implementation.

    python tests/make_goldens.py

Writes tests/goldens/expected_seen_sf_tiny.parquet and
expected_order_sf_tiny.parquet for the sf_tiny fixture (rows=5000,
seed=42) with the standard 3-round config below. Deterministic:
re-running reproduces byte-identical tables.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixcrawler_spark.fixtures import FixtureSpec, generate_pages, seed_urls, write_fixtures
from tests.oracle import CrawlOracle

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
ROWS, SEED, K_SEEDS = 5000, 42, 8
MAX_DEPTH, MAX_ROUNDS, ROUND_LEN_S = 3, 3, 10.0


def build() -> tuple[pa.Table, pa.Table, list[str]]:
    with tempfile.TemporaryDirectory() as d:
        write_fixtures(d, rows=ROWS, seed=SEED)
        seeds = seed_urls(generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=K_SEEDS)
        oracle = CrawlOracle(
            pages_path=f"{d}/pages.parquet",
            robots_path=f"{d}/robots.parquet",
            seeds=seeds,
            max_depth=MAX_DEPTH,
            max_rounds=MAX_ROUNDS,
            round_len_s=ROUND_LEN_S,
        )
        oracle.run()
    seen_items = sorted(oracle.seen.items())
    seen = pa.table(
        {
            "url": pa.array([u for u, _ in seen_items], pa.string()),
            "completed_round": pa.array([r for _, r in seen_items], pa.int32()),
        }
    )
    order_rows = sorted(oracle.ordering())
    order = pa.table(
        {
            "round": pa.array([r for r, _, _, _ in order_rows], pa.int32()),
            "domain": pa.array([d_ for _, d_, _, _ in order_rows], pa.string()),
            "rank_in_round": pa.array([k for _, _, k, _ in order_rows], pa.int32()),
            "url": pa.array([u for _, _, _, u in order_rows], pa.string()),
        }
    )
    return seen, order, seeds


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    seen, order, seeds = build()
    pq.write_table(seen, os.path.join(GOLDEN_DIR, "expected_seen_sf_tiny.parquet"))
    pq.write_table(order, os.path.join(GOLDEN_DIR, "expected_order_sf_tiny.parquet"))
    print(f"seen rows: {seen.num_rows}, order rows: {order.num_rows}")
    print("seeds:", seeds)
