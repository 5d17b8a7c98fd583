"""Extra benchmarks for optimization work (bench.py is frozen — guide §1.4).

Times individual declared queries with the SAME session config and
methodology as bench.py (sf0.001 warmup pass, then min-of-N `.count()` at
the target SF), optionally isolating computation with the noop sink, plus
a paired hardware probe so numbers from different windows are comparable.

Usage:
  python bench_extra.py q1,q2,...      # time those queries (default reps 3)
  BENCH_EXTRA_REPS=5 python bench_extra.py simhash_pairs
  BENCH_EXTRA_NOOP=1 python bench_extra.py simhash_pairs   # noop sink
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import hardware_probe  # same probe as the frozen harness


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    use_noop = os.environ.get("BENCH_EXTRA_NOOP") == "1"
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []

    import __spark_entry__ as entrymod
    from pyhydroqc_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # mirror bench.py's file-split conf so scan task counts match
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "4m")

    qs = entrymod.queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    out = {}
    probe0 = round(hardware_probe(cpus), 2)
    for name in names:
        fn = qs[name]
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).count()
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            if use_noop:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min {min(samples)}s of {samples}", file=sys.stderr)
    probe1 = round(hardware_probe(cpus), 2)
    print(json.dumps({"queries": out, "hw_probe": [probe0, probe1],
                      "noop": use_noop, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
