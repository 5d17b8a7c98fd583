"""Scale evidence for the training-data (textops) operators.

Generates a deterministic synthetic corpus (seeded vocab sampling with
planted near-duplicates — no external data), then times the dedup surfaces
at two parallelism levels on the same input, mirroring the pipeline's
N→4N methodology (BENCH/BASELINE.md): min-of-reps per level plus a paired
pure-CPU spin probe for the window's hardware ceiling.

Env: TEXT_DOCS (default 200_000), TEXT_REPS (default 2),
     TEXT_LEVELS (default "8,32").
Writes BENCH/TEXTOPS.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("TEXT_DOCS", "200000"))
REPS = int(os.environ.get("TEXT_REPS", "2"))
LEVELS = [int(x) for x in os.environ.get("TEXT_LEVELS", "8,32").split(",")]

WORKER = r"""
import os, sys, time
sys.path.insert(0, "__REPO__")
import numpy as np
from pyhydroqc_spark.session import get_spark

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark("textops-scale", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
spark.conf.set("spark.sql.files.openCostInBytes", "8m")

corpus_dir = os.path.join("__REPO__", ".bench", f"docs_{n_docs}")
if not os.path.exists(corpus_dir):
    # deterministic corpus: 20-60 words per doc from a 30k vocab; every
    # 50th doc is a near-dup of its predecessor (one word changed)
    from pyspark.sql import functions as F
    vocab_df = spark.range(30000).select(
        F.concat(F.lit("w"), F.col("id")).alias("w")
    )
    docs = (
        spark.range(n_docs)
        .withColumn("n_words", (F.pmod(F.xxhash64("id"), F.lit(41)) + 20))
        .withColumn(
            "seed", F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id"))
        )
        .withColumn(
            "words",
            F.transform(
                F.sequence(F.lit(1), F.col("n_words")),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.concat(F.col("seed"), F.lit("|"), i)), F.lit(30000)),
                ),
            ),
        )
        .withColumn(
            "words",
            F.when(
                F.col("id") % 50 == 1,
                F.concat(F.slice("words", 1, 5), F.array(F.lit("uniq")), F.slice("words", 7, 1000)),
            ).otherwise(F.col("words")),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.array_join("words", " ").alias("text"),
        )
    )
    docs.repartition(128, "doc_id").write.mode("overwrite").parquet(corpus_dir)

df = spark.read.parquet(corpus_dir)
from pyhydroqc_spark.textops import dedup

def jobs_for(frame):
    return {
        "exact_dedup": lambda: dedup.exact_dedup(frame),
        "wordset_dedup": lambda: dedup.wordset_dedup(frame),
        "minhash_candidates": lambda: dedup.minhash_candidates(
            dedup.minhash_signatures(frame, num_perm=32), bands=8
        ),
        "simhash_pairs": lambda: dedup.simhash_candidates(
            dedup.simhash(frame, bits=64), max_hamming=3
        ),
        # exact-substring dedup; the >0 filter keeps count() honest (it
        # forces the mark-merge subtree instead of the join-eliminated spine)
        "dup_spans": lambda: dedup.dup_spans(frame).where("dup_words > 0"),
    }

# codegen warmup on a slice
for mk in jobs_for(df.limit(2000)).values():
    mk().count()
out = {}
for name, mk in jobs_for(df).items():
    t0 = time.time(); n = mk().count(); out[name] = (round(time.time() - t0, 2), n)
import json
print(json.dumps(out), flush=True)
spark.stop()
"""


from scaling_bench import hardware_probe as spin_probe  # noqa: E402


def main():
    script = WORKER.replace("__REPO__", REPO)
    results: dict[int, dict] = {c: {} for c in LEVELS}
    probes: dict[int, list] = {c: [] for c in LEVELS}
    import json

    for rep in range(REPS):
        for c in LEVELS:
            r = subprocess.run(
                [sys.executable, "-c", script, str(c), str(N_DOCS)],
                capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            data = json.loads(line)
            for k, (t, n) in data.items():
                results[c].setdefault(k, []).append((t, n))
            probes[c].append(spin_probe(c))
            print(f"rep{rep} cores={c}: {data} (hw {probes[c][-1]:.2f})",
                  file=sys.stderr, flush=True)

    lines = [
        "# BENCH/TEXTOPS — training-data operator scale evidence",
        "",
        f"Synthetic corpus: {N_DOCS:,} documents (seeded vocab sampling, 2%",
        "planted near-dups), generated deterministically — no external data.",
        f"Each operator timed at local[{LEVELS[0]}] vs local[{LEVELS[1]}] on the",
        f"same parquet input; min of {REPS} interleaved reps; paired spin probe",
        "gives the window's hardware ceiling (see BENCH/BASELINE.md for the",
        "methodology).",
        "",
        "| operator | " + " | ".join(f"local[{c}] best (s)" for c in LEVELS)
        + " | speedup | hw ceiling | rows |",
        "|---|" + "---|" * (len(LEVELS) + 3),
    ]
    import statistics

    hw = {c: statistics.median(probes[c]) for c in LEVELS}
    ratio_hw = hw[LEVELS[1]] / hw[LEVELS[0]]
    for op in results[LEVELS[0]]:
        best = {c: min(t for t, _ in results[c][op]) for c in LEVELS}
        n_rows = results[LEVELS[0]][op][0][1]
        speed = best[LEVELS[0]] / best[LEVELS[1]]
        lines.append(
            f"| {op} | " + " | ".join(f"{best[c]:.2f}" for c in LEVELS)
            + f" | {speed:.2f}× | {ratio_hw:.2f}× | {n_rows:,} |"
        )
    lines += [
        "",
        f"Spin-probe window ceiling local[{LEVELS[0]}]→local[{LEVELS[1]}]: "
        f"{ratio_hw:.2f}× (ideal {LEVELS[1]/LEVELS[0]:.0f}×; this box is "
        "SMT/oversubscribed — compare operators to the probe, not to ideal).",
        "",
        "Sub-second rows (exact/wordset dedup at this corpus size) are",
        "scheduler-overhead-bound, not compute-bound — their speedup column",
        "is noise; the CPU-heavy LSH ops are the scaling signal (minhash",
        "tracks the probe ceiling).",
        "",
        "The hash/LSH ops are single-shuffle shapes (hash-groupBy or",
        "band-bucket aggregation + in-bucket enumeration); dup_spans is a",
        "two-shuffle shape (map-side-combined gram count, then one id-hash",
        "exchange shared by the span-merge window and both island",
        "aggregations — plan-audited). None self-joins the raw corpus, so",
        "the work per executor stays O(docs/executors) at any cluster size.",
    ]
    out = os.path.join(REPO, "BENCH", "TEXTOPS.md")
    # preserve the deep-dive sections other tools appended (simhash 1M,
    # IVF recall): everything from the first "## " section after the
    # standard block survives a rerun
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        idx = old.find("\n## ")
        if idx >= 0:
            tail = old[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
