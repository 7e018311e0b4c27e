"""Stage-level scaling diagnosis: run one full round at a given core
count with the Spark event log on, then print per-stage wall time,
total executor task time, and parallelism achieved. Comparing two core
counts shows exactly which stages don't scale.

    python bench/stage_profile.py --cores 32 --rows 16000000
"""

from __future__ import annotations

import argparse
import glob
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
    ap.add_argument("--rows", type=int, default=16_000_000)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_rounds import ensure_fixtures, N_BUCKETS

    fixture_dir = ensure_fixtures(args.rows, 42)
    evdir = f"/dev/shm/spark-events-c{args.cores}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.session import get_spark
    from pixcrawler_spark.sources.tables import TableStore

    spark = get_spark(
        app_name=f"stageprof_c{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
    store_dir = f"/dev/shm/pix_stageprof_c{args.cores}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = TableStore(spark, store_dir)
    static_store = TableStore(
        spark, os.path.join("/dev/shm/pixcrawler_bench", f"static_rows{args.rows}")
    )
    cfg = CrawlConfig(seeds=["x"], max_depth=1, max_rounds=1, n_buckets=N_BUCKETS)
    eng = CrawlEngine(spark, pages, robots, store, cfg, static_store=static_store)
    eng.ensure_pages_ext()
    all_urls = pages.select("url")
    frontier_df = eng.frontier_from(all_urls.where(F.xxhash64("url") % 3 != 0))
    seen_df = all_urls.where(F.xxhash64("url") % 3 == 0).select(
        "url", F.lit(0).cast("int").alias("completed_round")
    )

    def reset():
        for t in ("frontier", "seen", "results", "metrics", "round_log"):
            store.drop(t)
        store.overwrite("frontier", frontier_df, bucket=(("url",), N_BUCKETS))
        store.overwrite("seen", seen_df, bucket=(("url",), N_BUCKETS))

    reset()
    eng.run_round(1)  # warm
    reset()
    t_mark = time.time() * 1000  # epoch ms; job group is thread-local,
    t0 = time.monotonic()        # so filter stages by submission time
    eng.run_round(1)
    wall = time.monotonic() - t0
    spark.sparkContext.stop()

    # parse the event log
    stages = {}
    stage_to_job = {}
    paths = []
    for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True):
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p):
            paths.append(p)
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    for si in ev.get("Stage Infos", []):
                        stage_to_job[si["Stage ID"]] = ev["Job ID"]
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if not sub or sub < t_mark:
                        continue
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "wall_ms": (comp - sub) if sub and comp else None,
                        "job": stage_to_job.get(sid, -1),
                    }
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid in stages:
                        m = ev.get("Task Metrics") or {}
                        stages[sid].setdefault("exec_ms", 0)
                        stages[sid]["exec_ms"] += m.get("Executor Run Time", 0)

    total_stage_wall = sum(s["wall_ms"] or 0 for s in stages.values())
    print(json.dumps({"cores": args.cores, "round_wall_s": round(wall, 2),
                      "sum_stage_wall_s": round(total_stage_wall / 1000, 2),
                      "n_stages": len(stages)}))
    for sid in sorted(stages, key=lambda s: -(stages[s]["wall_ms"] or 0)):
        s = stages[sid]
        par = (s.get("exec_ms", 0) / s["wall_ms"]) if s["wall_ms"] else 0
        print(f"  stage {sid:3d} job {s['job']:3d} wall {s['wall_ms'] or 0:6d}ms "
              f"exec {s.get('exec_ms', 0):7d}ms par {par:5.1f} "
              f"tasks {s['tasks']:3d}  {s['name']}")
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
