"""Two-cluster-size scaling evidence (sandbox proxy, per BASELINE.md).

Runs the identical pipeline job at two parallelism levels on the same
input, interleaved and repeated (the sandbox VM shows 2-4x run-to-run
variance from host contention — min-of-N per level is the honest
estimator), plus a pure-CPU spin probe that measures the HARDWARE's own
N→4N scaling ceiling for context. Writes BENCH/BASELINE.md.

Env: SCALE_POINTS (default 4M), SCALE_REPS (default 3),
     SCALE_PAIRS (default "1:4,2:8").
Writes BENCH/SCALING.md (BENCH/BASELINE.md is the curated summary).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = int(os.environ.get("SCALE_POINTS", "16000000"))
REPS = int(os.environ.get("SCALE_REPS", "3"))
PAIRS = [
    tuple(int(x) for x in p.split(":"))
    for p in os.environ.get("SCALE_PAIRS", "1:4,2:8").split(",")
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spin(_):
    x = 0
    for i in range(30_000_000):
        x += i
    return x


def hardware_probe(n: int) -> float:
    t0 = time.time()
    with mp.Pool(n) as p:
        p.map(_spin, range(n))
    return n / (time.time() - t0)  # work units per second


def run_pipeline_once(cpus: int) -> float:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        BENCH_POINTS=str(POINTS),
        BENCH_PIPELINE_ONLY="1",
        BENCH_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]["qc_correct_rollup_pipeline"]


def main():
    import statistics

    levels = sorted({c for p in PAIRS for c in p})
    walls: dict[int, list[float]] = {c: [] for c in levels}
    probes: dict[int, list[float]] = {c: [] for c in levels}
    for rep in range(REPS):
        for c in levels:
            w = run_pipeline_once(c)
            walls[c].append(w)
            # probe the hardware in the SAME contention window as the rep so
            # host noise hits both the job and its denominator together
            probes[c].append(hardware_probe(c))
            print(
                f"rep{rep} cpus={c}: {w:.1f}s (hw {probes[c][-1]:.2f})",
                file=sys.stderr, flush=True,
            )
    best = {c: min(ws) for c, ws in walls.items()}
    med = {c: statistics.median(ws) for c, ws in walls.items()}
    hw = {c: statistics.median(ps) for c, ps in probes.items()}

    lines = [
        "# BENCH/SCALING — scaling evidence (two parallelism levels)",
        "",
        "Sandbox proxy for the north_rule's N→4N-executor criterion (no real",
        "cluster): the identical pipeline job — explode → rules QC → interpolate",
        "→ ARIMA-residual flag (SQL path) → correction → 15min/1h/1d rollups —",
        f"on the identical deterministic token table ({POINTS:,} points),",
        f"min of {REPS} interleaved repetitions per level (the sandbox VM shows",
        "2-4× run-to-run variance from host contention).",
        "",
        "A pure-CPU multiprocess spin probe measures what the *hardware* gives",
        "for the same core-count step — vCPUs are SMT/oversubscribed, so the",
        "probe is the attainable ceiling for any job on this box.",
        "",
        "| parallelism | best wall (s) | median (s) | points/s (best) | all reps (s) | hw probe (work/s) |",
        "|---|---|---|---|---|---|",
    ]
    for c in levels:
        lines.append(
            f"| local[{c}] | {best[c]:.1f} | {med[c]:.1f} | {POINTS/best[c]:,.0f} | "
            + ", ".join(f"{w:.1f}" for w in walls[c])
            + f" | {hw[c]:.2f} |"
        )
    lines.append("")
    for lo, hi in PAIRS:
        ratio = hi / lo
        eff = (best[lo] / best[hi]) / ratio
        eff_med = (med[lo] / med[hi]) / ratio
        hw_eff = (hw[hi] / hw[lo]) / ratio
        rel = eff / hw_eff if hw_eff else float("nan")
        lines += [
            f"**local[{lo}] → local[{hi}] (×{ratio:.0f}): pipeline scaling efficiency = "
            f"{eff:.2f} (min) / {eff_med:.2f} (median)**; hardware ceiling from the spin probe = {hw_eff:.2f}; "
            f"pipeline achieves **{rel:.0%} of the hardware's own scaling** "
            f"(target ≥ 0.8 of ideal on real multi-executor hardware).",
            "",
        ]
    lines += [
        "On a real cluster the N→4N step adds machines (memory bandwidth and",
        "LLC scale with nodes); in this sandbox both levels share one",
        "oversubscribed VM, so the hardware probe — not 1.0 — is the honest",
        "denominator. Per-series work is embarrassingly parallel across",
        "doc_ids (hash-partitioned), with no driver-side loops in the job.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"best": best, "median": med, "hw": hw}))


if __name__ == "__main__":
    main()
