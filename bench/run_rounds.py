"""Frontier-throughput bench: repeated identical micro-rounds of the
crawl engine over the sf_bench pages fixture at a given core count.

    python bench/run_rounds.py --cores 8  --rows 500000
    python bench/run_rounds.py --cores 32 --rows 500000

Protocol: seed the whole corpus as the frontier (seen pre-loaded with
1/3 of urls so the anti-join does real work), run ONE untimed pass
(spawns Python workers, compiles the AQE-chosen codegen for this data
size), then ``--passes`` timed passes over identical state; report
min/mean. One JSON line out — consumed by bench/scaling.py, which runs
both core counts and writes BENCH/BASELINE.md with the north-rule
scaling efficiency (throughput(4N) / (4 x throughput(N))).

Modes:
- ``open`` (default, headline): politeness wide open — raw
  fetch-decision pipeline throughput (dedup window → seen anti-join →
  robots join → priority window → fetch join → Arrow extraction →
  parquet commit).
- ``real``: fixture politeness (10/domain/round) — stall accounting,
  not the headline (admitted work per round is politeness-bound).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Shuffle to tmpfs: this sandbox has ONE shared virtio disk, which no
# core count can scale — real cluster nodes shuffle to node-local NVMe
# that scales with executor count. tmpfs is the honest stand-in (the
# 128 GiB RAM budget covers bench shuffle volumes comfortably).
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

from pyspark.sql import functions as F

FIXTURE_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_fixtures"
)


def ensure_fixtures(rows: int, seed: int) -> str:
    d = os.path.join(FIXTURE_CACHE, f"rows{rows}_seed{seed}")
    if not (
        os.path.exists(os.path.join(d, "pages.parquet"))
        and os.path.exists(os.path.join(d, "robots.parquet"))
    ):
        from pixcrawler_spark.fixtures import write_fixtures

        write_fixtures(d, rows=rows, seed=seed)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mode", choices=["open", "real"], default="open")
    ap.add_argument("--use-bloom", action="store_true")
    ap.add_argument("--salt-buckets", type=int, default=1)
    ap.add_argument(
        "--compute-only",
        action="store_true",
        help="evaluate the round plan to a noop sink (no parquet commit): "
        "isolates the scalable compute path from the sandbox's single "
        "shared disk, which real clusters don't contend on",
    )
    args = ap.parse_args()

    fixture_dir = ensure_fixtures(args.rows, args.seed)

    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.session import get_spark
    from pixcrawler_spark.sources.tables import TableStore

    spark = get_spark(
        app_name=f"crawl_bench_c{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
    if args.mode == "open":
        robots = robots.withColumn("crawl_delay_s", F.lit(0.0)).withColumn(
            "max_per_round", F.lit(2_000_000_000).cast("int")
        )

    # store on tmpfs: frontier/seen scans + commits are in the timed
    # path; a real executor's table I/O scales with node count, the
    # sandbox's one virtio disk does not
    store_dir = os.path.join(
        "/dev/shm/pixcrawler_bench",
        f"rows{args.rows}_c{args.cores}_{args.mode}",
    )
    shutil.rmtree(store_dir, ignore_errors=True)
    store = TableStore(spark, store_dir)

    cfg = CrawlConfig(
        seeds=["placeholder"],  # frontier seeded directly below
        max_depth=0,  # no expansion: identical work per pass
        max_rounds=1,
        use_bloom=args.use_bloom,
        salt_buckets=args.salt_buckets,
    )
    eng = CrawlEngine(spark, pages, robots, store, cfg)
    all_urls = pages.select("url")

    def reset_state() -> None:
        for t in ("frontier", "seen", "results", "metrics"):
            store.drop(t)
        store.overwrite("frontier", eng.frontier_from(all_urls))
        store.overwrite(
            "seen",
            all_urls.where(F.xxhash64("url") % 3 == 0).select(
                "url", F.lit(0).cast("int").alias("completed_round")
            ),
        )

    def one_pass():
        if args.compute_only:
            eng.plan_round(1)["results"].write.format("noop").mode(
                "overwrite"
            ).save()
            return None
        return eng.run_round(1)

    # one-time extraction materialization (the WARC→columnar prep),
    # timed separately — rounds reuse the pages_ext table
    t0 = time.monotonic()
    eng.ensure_pages_ext()
    extract_sec = time.monotonic() - t0

    # untimed pass: python-worker spawn + size-specific AQE codegen
    reset_state()
    one_pass()

    passes = []
    last_summary = None
    for _ in range(args.passes):
        reset_state()
        t0 = time.monotonic()
        last_summary = one_pass()
        passes.append(time.monotonic() - t0)

    shutil.rmtree(store_dir, ignore_errors=True)
    n = args.rows  # every pass decides the full frontier (incl. seen skips)
    best = min(passes)
    mean = sum(passes) / len(passes)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "mode": args.mode,
                "rows": args.rows,
                "urls": n,
                "passes_sec": [round(p, 3) for p in passes],
                "best_sec": round(best, 3),
                "mean_sec": round(mean, 3),
                "urls_per_sec_best": round(n / best, 1),
                "urls_per_sec_mean": round(n / mean, 1),
                "extract_sec": round(extract_sec, 3),
                "extract_urls_per_sec": round(n / extract_sec, 1),
                "round_summary": last_summary,
            }
        )
    )


if __name__ == "__main__":
    main()
