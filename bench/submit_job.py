"""spark-submit entrypoint for the crawl engine (north-rule deploy
surface: ``spark-submit --py-files pixcrawler_spark.zip`` on a
multi-executor cluster).

Local smoke:

    cd /root/repo && python -m zipfile -c /tmp/pixcrawler_spark.zip pixcrawler_spark
    spark-submit --master 'local[8]' --py-files /tmp/pixcrawler_spark.zip \\
        bench/submit_job.py --pages <dir>/pages.parquet \\
        --robots <dir>/robots.parquet --store /tmp/crawl_store \\
        --seeds-from-pages 8 --max-rounds 3

Cluster: swap ``--master`` for the cluster manager; the TableStore
root should point at shared storage (or the Iceberg catalog in
production). Everything engine-side arrives via --py-files — no
cluster-side install.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--seeds", nargs="*", default=None)
    ap.add_argument("--seeds-from-pages", type=int, default=0,
                    help="seed with the first K crawlable fixture urls")
    ap.add_argument("--config", default=None,
                    help="crawl-config JSON path (reference CONFIG_SCHEMA): "
                    "categories/keywords drive deterministic SERP seeding")
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--max-rounds", type=int, default=3)
    ap.add_argument("--round-len-s", type=float, default=10.0)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    # Import AFTER spark-submit has put --py-files on sys.path.
    from pyspark.sql import SparkSession

    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.sources.tables import TableStore

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    seeds = list(args.seeds or [])
    if args.config:
        from pixcrawler_spark.config import load_config
        from pixcrawler_spark.plans.seeding import seeds_from_config

        dcfg = load_config(args.config)
        rows = seeds_from_config(
            spark, dcfg, spark.read.parquet(args.pages)
        ).collect()
        seeds += [r["url"] for r in rows]
    if args.seeds_from_pages:
        rows = (
            spark.read.parquet(args.pages)
            .where("html IS NOT NULL")
            .select("url")
            .limit(args.seeds_from_pages)
            .collect()
        )
        seeds += [r["url"] for r in rows]

    cfg = CrawlConfig(
        seeds=seeds,
        max_depth=args.max_depth,
        max_rounds=args.max_rounds,
        round_len_s=args.round_len_s,
        n_buckets=args.n_buckets,
    )
    store = TableStore(spark, args.store)
    eng = CrawlEngine(spark, args.pages, args.robots, store, cfg)
    summaries = eng.run(resume=args.resume)
    for s in summaries:
        print(json.dumps(s), flush=True)
    print(json.dumps({
        "done": True,
        "rounds": len(summaries),
        "results_rows": store.count("results"),
        "seen_rows": store.count("seen"),
    }))


if __name__ == "__main__":
    main()
