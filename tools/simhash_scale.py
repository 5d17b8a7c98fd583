"""Simhash pairing at >=1M documents: bounded-in-bucket-work evidence.

The fixed 16-bit quarter bands are pigeonhole-correct but their expected
occupancy grows as n/2^16 — the one dedup surface whose enumeration cost
was quadratic in corpus size. simhash_candidates now splits any bucket
larger than ``bucket_cap`` by four 12-bit sub-blocks of the remaining 48
bits (multi-index Hamming search; recall preserved by pigeonhole, see
textops/dedup.py). This tool builds a 1M-doc corpus that actually HAS hot
buckets — ten planted boilerplate clusters of ~300 near-identical docs
each, the "same template, one slot changed" shape real crawls produce —
and reports:

* wall time + pair count at two parallelism levels (local[8]/local[32]);
* the level-1 bucket size distribution (max, #buckets over the cap);
* the max bucket size actually ENUMERATED after splitting — the bounded
  quantity.

Appends a section to BENCH/TEXTOPS.md.

Env: SIMHASH_DOCS (default 1_000_000), SIMHASH_LEVELS (default "8,32"),
     SIMHASH_CAP (default 512).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SIMHASH_DOCS", "1000000"))
LEVELS = [int(x) for x in os.environ.get("SIMHASH_LEVELS", "8,32").split(",")]
CAP = int(os.environ.get("SIMHASH_CAP", "512"))

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, "__REPO__")
from pyhydroqc_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); cap = int(sys.argv[3])
want_stats = len(sys.argv) > 4 and sys.argv[4] == "stats"
spark = get_spark("simhash-scale", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

corpus_dir = os.path.join("__REPO__", ".bench", f"docs_hot_{n_docs}")
if not os.path.exists(corpus_dir):
    # deterministic corpus: the textops_scale base recipe (20-60 words
    # from a 30k vocab, 2% chained near-dups) PLUS ten boilerplate
    # clusters of ~n_docs/3333 near-identical docs (one word slot varies
    # per member) — the template-page shape that makes quarter buckets hot
    n_clustered = max(3000, n_docs // 50)
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
        .withColumn(
            "words",
            F.when(
                F.col("id") < F.lit(n_clustered),
                # cluster c = id % 10: 30 shared template words, THREE
                # member-dependent slots replaced by member-unique words —
                # buckets stay hot (27/30 words shared) while most member
                # pairs land beyond hamming 3, separating enumeration
                # overhead from genuine candidate output
                F.transform(
                    F.sequence(F.lit(0), F.lit(29)),
                    lambda j: F.when(
                        (j == F.pmod(F.floor(F.col("id") / 10), F.lit(30)).cast("int"))
                        | (j == F.pmod(F.floor(F.col("id") / 7), F.lit(30)).cast("int"))
                        | (j == F.pmod(F.floor(F.col("id") / 11), F.lit(30)).cast("int")),
                        F.concat(F.lit("m"), F.col("id"), F.lit("_"), j),
                    ).otherwise(
                        F.concat(F.lit("tpl"), F.pmod(F.col("id"), F.lit(10)), F.lit("_"), j)
                    ),
                ),
            ).otherwise(F.col("words")),
        )
        .select(F.col("id").alias("doc_id"), F.array_join("words", " ").alias("text"))
    )
    docs.repartition(128, "doc_id").write.mode("overwrite").parquet(corpus_dir)

df = spark.read.parquet(corpus_dir)
from pyhydroqc_spark.textops import dedup

sig = dedup.simhash(df, bits=64)
if want_stats:
    # level-1 bucket occupancy + the sizes actually enumerated post-split
    sigp = sig.persist(); sigp.count()
    quarters = F.array(*[
        F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)) for q in range(4)
    ])
    banded = sigp.select("id", "simhash", F.posexplode(quarters).alias("q", "qv"))
    l1 = banded.groupBy("q", "qv").count()
    l1_stats = l1.agg(
        F.max("count").alias("mx"),
        F.sum((F.col("count") > cap).cast("long")).alias("hot"),
        F.sum(F.when(F.col("count") <= cap, F.col("count") * (F.col("count") - 1) / 2)
              .otherwise(0)).alias("small_work"),
    ).first()
    hot_members = banded.join(
        l1.where(F.col("count") > cap).select("q", "qv"), ["q", "qv"]
    )
    rem = F.filter(quarters, lambda x, i: i != F.col("q"))
    r48 = (F.element_at(rem, 1)
           .bitwiseOR(F.shiftleft(F.element_at(rem, 2), 16))
           .bitwiseOR(F.shiftleft(F.element_at(rem, 3), 32)))
    subs = F.array(*[F.shiftright(r48, 12 * s).bitwiseAND(F.lit(0xFFF)) for s in range(4)])
    l2_banded = hot_members.select(
        "q", "qv", "simhash", F.posexplode(subs).alias("sq", "sv"))
    l2 = l2_banded.groupBy("q", "qv", "sq", "sv").count()
    l2_stats = l2.agg(
        F.max("count").alias("mx"),
        F.sum((F.col("count") > cap).cast("long")).alias("hot"),
        F.sum(F.when(F.col("count") <= cap, F.col("count") * (F.col("count") - 1) / 2)
              .otherwise(0)).alias("small_work"),
    ).first()
    # level 3 (r5): members of still-hot 12-bit sub-buckets re-banded on
    # four 9-bit blocks of the remaining 36 bits
    l2_hot_members = l2_banded.join(
        l2.where(F.col("count") > cap).select("q", "qv", "sq", "sv"),
        ["q", "qv", "sq", "sv"])
    cases = []
    for s_ in range(4):
        low = r48.bitwiseAND(F.lit((1 << (12 * s_)) - 1))
        high = F.shiftleft(F.shiftright(r48, 12 * (s_ + 1)), 12 * s_)
        cases.append((s_, low.bitwiseOR(high)))
    r36 = F.when(F.col("sq") == cases[0][0], cases[0][1])
    for s_, expr in cases[1:]:
        r36 = r36.when(F.col("sq") == s_, expr)
    sub2 = F.array(*[F.shiftright(r36, 9 * s2).bitwiseAND(F.lit(0x1FF)) for s2 in range(4)])
    l3 = (l2_hot_members.select("q", "qv", "sq", "sv", F.posexplode(sub2).alias("ssq", "ssv"))
          .groupBy("q", "qv", "sq", "sv", "ssq", "ssv").count())
    l3_stats = l3.agg(
        F.max("count").alias("mx"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("work"),
    ).first()
    print(json.dumps({
        "l1_max": int(l1_stats["mx"]), "l1_hot_buckets": int(l1_stats["hot"]),
        "l1_small_work": int(l1_stats["small_work"]),
        "l2_max": int(l2_stats["mx"] or 0), "l2_hot_buckets": int(l2_stats["hot"] or 0),
        "l2_small_work": int(l2_stats["small_work"] or 0),
        "l3_max": int(l3_stats["mx"] or 0), "l3_work": int(l3_stats["work"] or 0),
    }), flush=True)
    sigp.unpersist()

t0 = time.time()
n_pairs = dedup.simhash_candidates(sig, max_hamming=3, bucket_cap=cap).count()
print(json.dumps({"secs": round(time.time() - t0, 2), "pairs": n_pairs}), flush=True)
spark.stop()
"""


def run(cores: int, extra: list[str]) -> list[dict]:
    script = WORKER.replace("__REPO__", REPO)
    r = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(N_DOCS), str(CAP)] + extra,
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        print(r.stdout[-3000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        raise SystemExit("worker failed")
    return [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]


def main():
    (stats, timing_hi) = run(LEVELS[1], ["stats"])
    (timing_lo,) = run(LEVELS[0], [])
    print("stats:", stats, file=sys.stderr)
    print(f"local[{LEVELS[1]}]:", timing_hi, f"local[{LEVELS[0]}]:", timing_lo,
          file=sys.stderr)

    section = f"""
## simhash at {N_DOCS:,} documents — bounded in-bucket work

Corpus: the standard recipe plus TEN planted boilerplate clusters of
~{max(3000, N_DOCS // 333) // 10:,} near-identical docs each (template pages) — the shape that
makes fixed 16-bit quarter buckets hot. bucket_cap={CAP}.

| level | metric | value |
|---|---|---|
| 1 | max (quarter, value) bucket occupancy | {stats['l1_max']:,} |
| 1 | buckets over cap (split, not enumerated) | {stats['l1_hot_buckets']:,} |
| 1 | pair-enumeration work in small buckets | {stats['l1_small_work']:,} |
| 2 | max sub-bucket occupancy after 12-bit split | {stats['l2_max']:,} |
| 2 | sub-buckets still over cap (split again, r5) | {stats['l2_hot_buckets']:,} |
| 2 | pair-enumeration work in small sub-buckets | {stats['l2_small_work']:,} |
| 3 | max bucket occupancy after 9-bit second split | {stats['l3_max']:,} |
| 3 | pair-enumeration work at the final level | {stats['l3_work']:,} |

Without any split, each hot bucket of size m would enumerate m(m-1)/2
pairs (max bucket {stats['l1_max']:,} → {stats['l1_max'] * (stats['l1_max'] - 1) // 2:,} struct pairs for that one
bucket); the 4×12-bit split bounds level-2 buckets at {stats['l2_max']:,}, and the r5
second split (four 9-bit blocks of the remaining 36 bits — pigeonhole
still leaves one block equal for hamming≤3) bounds the largest
enumerated bucket at {stats['l3_max']:,}. Enumeration work is bounded by the cap and
the true near-dup cluster sizes (identical-signature members stay
together because every pair of them IS a result: output-bound, not
overhead; past that, minhash banding is the documented routing escape).

| cores | simhash_pairs wall (s) | pairs |
|---|---|---|
| local[{LEVELS[0]}] | {timing_lo['secs']} | {timing_lo['pairs']:,} |
| local[{LEVELS[1]}] | {timing_hi['secs']} | {timing_hi['pairs']:,} |
"""
    out = os.path.join(REPO, "BENCH", "TEXTOPS.md")
    with open(out, "a") as f:
        f.write(section)
    print(f"appended to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
