"""North-rule scaling evidence: the same frontier job at N and 4N
parallelism (local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors), reporting throughput at both plus scaling efficiency
(target >= 0.8). Writes BENCH/BASELINE.md.

    python bench/scaling.py --rows 500000 --passes 3
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, rows: int, passes: int, mode: str, compute_only: bool = False) -> dict:
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
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--mode", default="open")
    args = ap.parse_args()

    small = run_at(args.small, args.rows, args.passes, args.mode)
    large = run_at(args.large, args.rows, args.passes, args.mode)

    ratio = args.large / args.small
    t_small = small["urls_per_sec_best"]
    t_large = large["urls_per_sec_best"]
    eff = t_large / (ratio * t_small)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    now = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — frontier fetch-decision throughput & scaling

Measured {now} on this sandbox (single JVM, local[N] as the N-executor
stand-in per the driver's round-1 instructions; no real cluster
available). Job: one full micro-round of the crawl engine over a
{args.rows:,}-page synthetic fixture (FIXTURES.md, seed=42): per-url
dedup window -> URL-seen anti-join (1/3 pre-seen) -> robots broadcast
join -> per-domain priority window -> fetch join -> Arrow text/outlink
extraction -> lineage-stamped parquet commit. Protocol: 1 untimed
warm pass (Python-worker spawn + size-specific AQE codegen), then
{args.passes} timed identical passes; best-of reported (machine is
multi-tenant noisy; per-pass numbers below).

| cores | passes (s) | best (s) | URLs/sec (best) | URLs/sec (mean) |
|---|---|---|---|---|
| local[{args.small}] | {small['passes_sec']} | {small['best_sec']} | {t_small:,.0f} | {small['urls_per_sec_mean']:,.0f} |
| local[{args.large}] | {large['passes_sec']} | {large['best_sec']} | {t_large:,.0f} | {large['urls_per_sec_mean']:,.0f} |

**Scaling efficiency (north rule): throughput({args.large}) / ({ratio:.0f} x throughput({args.small})) =
{eff:.3f}** (target >= 0.8: {"MET" if eff >= 0.8 else "NOT MET"}).

Round decisions at {args.rows:,} rows (mode={args.mode}):
```json
{json.dumps(large['round_summary'], indent=2)}
```

Reference comparison (BASELINE.md §B): the reference's end-to-end item
throughput is bounded at order 10-10^2 items/sec (35 workers x
0.2-0.5 s serialized per-item delays). This engine's vectorized
fetch-decision path measures {t_large:,.0f} URLs/sec on one node —
3-4 orders of magnitude above the reference ceiling, with politeness
expressed as deferral (no wall-clock sleeps) rather than throughput
loss.
""")
    print(json.dumps({
        "small": small, "large": large,
        "efficiency": round(eff, 3), "report": md,
    }))


if __name__ == "__main__":
    main()
