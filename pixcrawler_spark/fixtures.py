"""Deterministic synthetic crawl fixtures: pages, robots, crawl config.

Implements FIXTURES.md exactly: identical (seed, rows) ⇒ byte-identical
tables. No network, no external data. Generation is plain numpy +
pyarrow (no Spark needed), so pytest can build sf_tiny in seconds.

Planted invariants (asserted by tests):
- pages.text == extract_text_py(pages.html) for every url (the
  byte-identical extraction invariant);
- ~2% null html (fetch-failure case), ~2% corrupted (truncated) html,
  ~1% exact-duplicate bodies, ~1% whitespace near-duplicates;
- link graph closed over the url pool (frontier rounds terminate);
- Zipf-skewed domain distribution (s=1.2) so a few hosts dominate —
  exercises salted-repartition / AQE skew handling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pixcrawler_spark.functions.text import extract_text_py

EPOCH_2025 = np.datetime64("2025-01-01T00:00:00")
LANGS = ["en", "de", "fr", "zh", "es"]
CRAWL_DELAYS = [0.0, 0.2, 0.5, 1.0]  # reference's real delays
VOCAB = (
    "spark frontier crawl fetch page link domain robot polite queue "
    "depth score batch round seen bloom hash shard merge scan filter "
    "join window rank quota retry engine google bing baidu offset"
).split()


@dataclass(frozen=True)
class FixtureSpec:
    rows: int
    seed: int = 42

    @property
    def n_domains(self) -> int:
        return max(10, self.rows // 50)


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def generate_pages(spec: FixtureSpec) -> pa.Table:
    rng = np.random.default_rng(spec.seed)
    n = spec.rows
    nd = spec.n_domains

    domains_pool = np.array([f"d{i:04d}.example" for i in range(nd)])
    dom_idx = rng.choice(nd, size=n, p=_zipf_weights(nd))
    # stable per-row path ids: documented portable hash (splitmix-ish)
    row_ids = np.arange(n, dtype=np.uint64)
    z = (row_ids + np.uint64(spec.seed)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    path_ids = z % np.uint64(10**12)

    domains = domains_pool[dom_idx]
    urls = np.array(
        [f"https://{d}/p/{p:012d}" for d, p in zip(domains, path_ids)]
    )
    warc_ts = EPOCH_2025 + ((np.arange(n) * 137) % (180 * 86400)).astype(
        "timedelta64[s]"
    )
    # deterministic per-domain lang: splitmix over domain index
    zd = (np.arange(nd, dtype=np.uint64) + np.uint64(spec.seed)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    zd ^= zd >> np.uint64(31)
    domain_lang = np.array(LANGS)[ (zd % np.uint64(5)).astype(int) ]
    langs = domain_lang[dom_idx]

    # body text: 5-40 words from VOCAB
    n_words = rng.integers(5, 41, size=n)
    # out-degree: power-law-ish, capped at 20
    out_deg = np.minimum((rng.pareto(1.5, size=n) * 3).astype(int), 20)
    # fate rolls: order matters — a row gets exactly one special fate
    fate = rng.random(n)

    vocab = np.array(VOCAB)
    html_list: list[bytes | None] = []
    for i in range(n):
        words = " ".join(vocab[rng.integers(0, len(vocab), size=n_words[i])])
        anchors = "".join(
            f'<a href="{urls[t]}">x</a>'
            for t in rng.integers(0, n, size=out_deg[i])
        )
        html = (
            f"<html><head><title>T{i}</title></head>"
            f"<body><p>{words}</p>{anchors}</body></html>"
        ).encode("utf-8")
        html_list.append(html)

    # plant fates (after base generation so copies reference final bodies)
    for i in range(n):
        if fate[i] < 0.02:  # null html — fetch failure
            html_list[i] = None
        elif fate[i] < 0.04:  # corrupted: truncate at half
            h = html_list[i]
            html_list[i] = h[: len(h) // 2]
        elif fate[i] < 0.05 and i > 0:  # exact duplicate of previous row
            if html_list[i - 1] is not None:
                html_list[i] = html_list[i - 1]
        elif fate[i] < 0.06 and i > 0:  # whitespace near-duplicate
            if html_list[i - 1] is not None:
                html_list[i] = html_list[i - 1].replace(b"<p>", b"<p> ")

    texts = [extract_text_py(h) for h in html_list]

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts.astype("datetime64[us]")),
            "html": pa.array(html_list, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_robots(spec: FixtureSpec) -> pa.Table:
    rng = np.random.default_rng(spec.seed + 1)
    nd = spec.n_domains
    domains = [f"d{i:04d}.example" for i in range(nd)]
    deny_all = rng.random(nd) < 0.10  # ~10% disallow p/ entirely
    n_extra = rng.integers(0, 4, size=nd)
    prefixes: list[list[str]] = []
    for i in range(nd):
        px = ["p/"] if deny_all[i] else []
        px += [f"x{j}/" for j in range(n_extra[i])]
        prefixes.append(px)
    # deterministic per-domain delay (same splitmix as lang pick)
    zd = (np.arange(nd, dtype=np.uint64) + np.uint64(spec.seed)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    zd ^= zd >> np.uint64(29)
    delays = np.array(CRAWL_DELAYS)[(zd % np.uint64(4)).astype(int)]
    return pa.table(
        {
            "domain": pa.array(domains, pa.string()),
            "disallow_prefixes": pa.array(prefixes, pa.list_(pa.string())),
            "crawl_delay_s": pa.array(delays, pa.float64()),
            "max_per_round": pa.array([10] * nd, pa.int32()),
        }
    )


def seed_urls(pages: pa.Table, k: int = 8) -> list[str]:
    """First k urls in row order whose html is present (deterministic)."""
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    out = [u for u, h in zip(urls, htmls) if h is not None][:k]
    return out


def write_fixtures(out_dir: str, rows: int, seed: int = 42) -> dict[str, str]:
    """Write pages.parquet + robots.parquet; returns path map."""
    spec = FixtureSpec(rows=rows, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    pages = generate_pages(spec)
    robots = generate_robots(spec)
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
    }
    # small row groups: Spark parallelizes a parquet scan at row-group
    # granularity — the pyarrow default (~1M rows/group) would make a
    # 1M-page fixture a single-task scan and serialize every round
    pq.write_table(pages, paths["pages"], row_group_size=65536)
    pq.write_table(robots, paths["robots"])
    return paths
