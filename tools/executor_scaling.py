"""Executor-count scaling proxy — the closest sandbox analog of the
north_rule's "N and 4N executors" criterion.

``tools/scaling_bench.py`` scales THREADS inside one JVM (local[N]); a real
cluster scales EXECUTOR PROCESSES with private heaps/GC/allocators. This
harness runs K cooperating single-core Spark JVMs ("executors"), each
owning the series whose doc_id hashes to its shard (the engine's actual
partitioning axis), with a file barrier so every process enters its timed
section together after warmup. Aggregate throughput = total points /
slowest executor wall; efficiency(N→4N) = thr(4N) / (4·thr(N)).

Env: EXEC_POINTS (default 8M total; with EXEC_WEAK=1, points PER executor),
     EXEC_REPS (default 3), EXEC_PAIRS (default "2:8"),
     EXEC_CORES_PER (default 1), EXEC_WEAK (default 0).
Strong mode splits a fixed table across K executors; weak mode (the
10^12-scale-representative one) holds per-executor work constant so
K×4 executors process 4× the data — efficiency = thr(4N)/(4·thr(N)).
Writes BENCH/EXEC_SCALING.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import hardware_probe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = int(os.environ.get("EXEC_POINTS", "8000000"))
REPS = int(os.environ.get("EXEC_REPS", "3"))
PAIRS = [
    tuple(int(x) for x in p.split(":"))
    for p in os.environ.get("EXEC_PAIRS", "2:8").split(",")
]
CORES_PER = int(os.environ.get("EXEC_CORES_PER", "1"))
WEAK = os.environ.get("EXEC_WEAK", "0") == "1"


def run_fleet(k: int) -> float:
    """K concurrent executors over disjoint shards; returns total points/s."""
    barrier = os.path.join(tempfile.mkdtemp(prefix="exec_barrier_"), "go")
    total_points = POINTS * k if WEAK else POINTS
    procs = []
    for i in range(k):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(CORES_PER),
            BENCH_POINTS=str(total_points),
            BENCH_SHARDS=str(k),
            BENCH_SHARD_IDX=str(i),
            BENCH_BARRIER_FILE=barrier,
            BENCH_PIPELINE_ONLY="1",
            BENCH_REPS="1",
            SPARK_DRIVER_MEM="5g",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    # rendezvous: all executors warmed up -> release the barrier together
    deadline = time.time() + 900
    while time.time() < deadline:
        ready = sum(
            os.path.exists(f"{barrier}.ready.{i}") for i in range(k)
        )
        if ready == k:
            break
        if any(p.poll() is not None for p in procs):
            raise RuntimeError("an executor died before the barrier")
        time.sleep(0.2)
    with open(barrier, "w") as f:
        f.write("go")

    walls, pts = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        j = json.loads(line)
        walls.append(j["queries"]["qc_correct_rollup_pipeline"])
        pts.append(j["points"])
    total = sum(pts)
    wall = max(walls)
    print(
        f"  k={k}: total {total:,} pts, walls {['%.1f' % w for w in walls]} -> "
        f"{total / wall:,.0f} pts/s",
        file=sys.stderr, flush=True,
    )
    return total / wall


def _points_scope() -> str:
    if WEAK:
        return (
            "PER EXECUTOR — weak scaling: 4N executors process 4x the data, "
            "the 10^12-scale-representative mode"
        )
    return "total, split across executors"


def main():
    levels = sorted({c for p in PAIRS for c in p})
    thr: dict[int, list[float]] = {c: [] for c in levels}
    probes: dict[int, list[float]] = {c: [] for c in levels}
    for rep in range(REPS):
        for k in levels:
            t = run_fleet(k)
            thr[k].append(t)
            # pair a pure-CPU probe with the same contention window: the
            # box's own k-process scaling is the attainable ceiling
            probes[k].append(hardware_probe(k * CORES_PER))
            print(
                f"rep{rep} executors={k}: {t:,.0f} pts/s (hw {probes[k][-1]:.2f})",
                file=sys.stderr, flush=True,
            )
    best = {k: max(ts) for k, ts in thr.items()}
    med = {k: statistics.median(ts) for k, ts in thr.items()}
    hw = {k: statistics.median(ps) for k, ps in probes.items()}

    lines = [
        "# BENCH/EXEC_SCALING — N→4N EXECUTOR-count scaling (process proxy)",
        "",
        "The north_rule's criterion is executor-count scaling on a cluster.",
        "This harness is the sandbox analog: K cooperating single-JVM Spark",
        "processes (one core each, private heap/GC — like real executors),",
        "each owning the doc_id-hash shard of the same deterministic token",
        f"table ({POINTS:,} points {_points_scope()}), released from a file barrier so the",
        "timed sections coincide. Aggregate throughput = total points /",
        f"slowest executor; best of {REPS} interleaved repetitions.",
        "",
        "| executors | best pts/s | median pts/s | all reps | hw probe (work/s) |",
        "|---|---|---|---|---|",
    ]
    for k in levels:
        lines.append(
            f"| {k} × local[{CORES_PER}] | {best[k]:,.0f} | {med[k]:,.0f} | "
            + ", ".join(f"{t:,.0f}" for t in thr[k])
            + f" | {hw[k]:.2f} |"
        )
    lines.append("")
    for lo, hi in PAIRS:
        ratio = hi / lo
        eff = best[hi] / (ratio * best[lo])
        eff_med = med[hi] / (ratio * med[lo])
        hw_eff = (hw[hi] / hw[lo]) / ratio if hw.get(lo) else float("nan")
        rel = eff / hw_eff if hw_eff else float("nan")
        lines.append(
            f"**{lo} → {hi} executors (×{ratio:.0f}): scaling efficiency = "
            f"{eff:.2f} (best) / {eff_med:.2f} (median)**; the box's own "
            f"paired-probe ceiling for the same process step = {hw_eff:.2f}; "
            f"the pipeline achieves **{rel:.0%} of the hardware's own scaling** "
            f"(target ≥ 0.8 of ideal on real multi-executor hardware)."
        )
        lines.append("")
    lines += [
        "Per-series work is hash-partitioned across executors with no",
        "cross-executor communication until the final (tiny) rollup counts —",
        "the same property that makes the plan shuffle-minimal on a real",
        "cluster. All K processes share one sandbox VM, so memory-bandwidth",
        "contention still taxes the high-K side; on real hardware added",
        "executors bring their own sockets.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "EXEC_SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"best": best, "median": med}))


if __name__ == "__main__":
    main()
