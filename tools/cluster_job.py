"""The driver program for the real-cluster-shaped run (north-rule
invocation): submitted with ``spark-submit --py-files engine.zip`` against
a standalone master — NOT a local[] session — proving the packaged engine
runs where only the zip (no repo checkout) is shipped to executors.

Reads the token parquet dir from argv[1], runs the headline
fused_tokens_to_cells pipeline, prints one JSON line with throughput.
Driven by tools/cluster_run.sh.
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main():
    tok_dir = sys.argv[1]
    spark = SparkSession.builder.appName("pyhydroqc-cluster-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # the zip is on every executor's PYTHONPATH via --py-files
    from pyhydroqc_spark.operators.fused import fused_tokens_to_cells

    tok = spark.read.parquet(tok_dir)
    n_points = tok.agg(F.sum("n_tok")).first()[0]
    # warmup (JIT + shuffle service)
    fused_tokens_to_cells(tok).count()
    t0 = time.time()
    n_cells = fused_tokens_to_cells(tok).count()
    dt = time.time() - t0
    print(json.dumps({
        "master": spark.sparkContext.master,
        "executors": spark.sparkContext.defaultParallelism,
        "points": int(n_points),
        "cells": int(n_cells),
        "secs": round(dt, 2),
        "points_per_sec": int(n_points / dt),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
