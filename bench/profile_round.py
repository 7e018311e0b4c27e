"""Piecewise profile of one compute-only round: time successively
larger prefixes of the round plan to locate non-scaling stages.

    python bench/profile_round.py --cores 32 --rows 4000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-aqe", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_rounds import ensure_fixtures

    fixture_dir = ensure_fixtures(args.rows, 42)

    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.session import get_spark
    from pixcrawler_spark.sources.tables import TableStore

    spark = get_spark(
        app_name=f"profile_c{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
    )
    if args.no_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    robots = (
        spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
        .withColumn("crawl_delay_s", F.lit(0.0))
        .withColumn("max_per_round", F.lit(2_000_000_000).cast("int"))
    )
    store_dir = f"/dev/shm/pixcrawler_prof_c{args.cores}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = TableStore(spark, store_dir)
    cfg = CrawlConfig(seeds=["x"], max_depth=0, max_rounds=1)
    eng = CrawlEngine(spark, pages, robots, store, cfg)
    eng.ensure_pages_ext()
    all_urls = pages.select("url")
    store.overwrite("frontier", eng.frontier_from(all_urls))
    store.overwrite(
        "seen",
        all_urls.where(F.xxhash64("url") % 3 == 0).select(
            "url", F.lit(0).cast("int").alias("completed_round")
        ),
    )

    from pixcrawler_spark.operators import politeness as pol
    from pixcrawler_spark.operators.seen import anti_join_seen
    from pixcrawler_spark.schemas import FRONTIER_SCHEMA, SEEN_SCHEMA
    from pyspark.sql import Window

    def build(stage: str):
        frontier = store.read("frontier", FRONTIER_SCHEMA)
        if stage == "scan":
            return frontier
        wdup = Window.partitionBy("url").orderBy(
            F.asc("depth"), F.desc("score"), F.asc("engine"),
            F.asc("discovered_round"), F.desc("retry_count"),
        )
        cand = (
            frontier.withColumn("_rn", F.row_number().over(wdup))
            .where(F.col("_rn") == 1).drop("_rn")
        )
        if stage == "dedup":
            return cand
        seen = store.read("seen", SEEN_SCHEMA)
        unseen = anti_join_seen(cand, seen)
        if stage == "anti":
            return unseen
        ruled = pol.with_robots_decision(unseen, robots)
        if stage == "robots":
            return ruled
        allowed = ruled.where(~F.col("robots_denied"))
        ranked = pol.admit(allowed, cfg.round_len_s)
        if stage == "admit":
            return ranked
        admitted = ranked.where(F.col("admitted"))
        pext = store.read("pages_ext").select(
            "url", "warc_ts", "html_absent", F.lit(True).alias("_pe")
        )
        j = admitted.join(pext, "url", "left")
        return j.withColumn(
            "fetch_decision",
            F.when(F.col("_pe").isNull(), "not_found")
            .when(F.col("html_absent"), "fetch_failed")
            .otherwise("fetched"),
        )

    stages = ["scan", "dedup", "anti", "robots", "admit", "full"]
    out = {"cores": args.cores, "rows": args.rows, "aqe": not args.no_aqe}
    for st in stages:
        build(st).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(args.passes):
            t0 = time.monotonic()
            build(st).write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        out[st] = round(min(ts), 3)
    print(json.dumps(out))
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
