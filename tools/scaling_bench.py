"""Two-cluster-size scaling evidence (sandbox proxy, per BASELINE.md):
run the identical pipeline job at local[8] and local[32] on the same input,
report throughput at both + scaling efficiency = (T32/T8)/4 into
BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = int(os.environ.get("SCALE_POINTS", "8000000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_POINTS=str(POINTS),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run(8)
    r32 = run(32)
    t8 = r8["queries"]["qc_correct_rollup_pipeline"]
    t32 = r32["queries"]["qc_correct_rollup_pipeline"]
    th8 = POINTS / t8
    th32 = POINTS / t32
    eff = (th32 / th8) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling evidence (local[8] vs local[32])

Sandbox proxy for the north_rule's N→4N-executor criterion (no real
cluster here): the identical pipeline job — explode → rules QC →
interpolate → ARIMA-residual flag (SQL path) → correction → 15min/1h/1d
rollups — on the identical deterministic token table.

| parallelism | input points | wall (s) | rolled-up points/s |
|---|---|---|---|
| local[8]  | {POINTS:,} | {t8:.1f} | {th8:,.0f} |
| local[32] | {POINTS:,} | {t32:.1f} | {th32:,.0f} |

**Scaling efficiency (8→32 cores) = (throughput@32 / throughput@8) / 4 =
{eff:.2f}**  (target ≥ 0.8)

Rollup rows produced: {r32["rollup_rows"]:,} across tiers 15min/1h/1d.

Per-query wall times at local[32] (driver tables, {SF_DIR}):

| query | sec |
|---|---|
""" + "\n".join(
        f"| {k} | {v} |" for k, v in r32["queries"].items()
    ) + f"""

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"t8": t8, "t32": t32, "eff": round(eff, 3)}))


if __name__ == "__main__":
    main()
