"""Per-stage scaling attribution: time each pipeline stage at a given
parallelism (fresh JVM per invocation). Usage: python stage_scaling.py <cpus>.
Prints one JSON line of stage → seconds."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = int(os.environ.get("SCALE_POINTS", "8000000"))


def main(cpus: int):
    from pyspark.sql import functions as F

    from pyhydroqc_spark.ingest import explode_tokens, repartition_series
    from pyhydroqc_spark.operators import correct as C
    from pyhydroqc_spark.operators import detect as D
    from pyhydroqc_spark.operators import rollup as RO
    from pyhydroqc_spark.operators import rules as R
    from pyhydroqc_spark.operators import threshold as T
    from pyhydroqc_spark.operators.events import anomaly_events
    from pyhydroqc_spark.session import get_spark

    spark = get_spark("stage-scaling", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", f"tokens_{POINTS}",
    )
    tok = spark.read.parquet(bench_dir)
    times = {}

    def stage(name, df, cache=True):
        t0 = time.time()
        if cache:
            df = df.persist()
        df.count()
        times[name] = round(time.time() - t0, 2)
        print(f"[{cpus}] {name}: {times[name]}s", file=sys.stderr, flush=True)
        return df

    long_df = stage("explode", explode_tokens(repartition_series(tok, max(cpus, 8))))
    qc = stage("rules_qc", R.interpolate(R.persistence(R.range_check(long_df, 25.0, -1.0), 30)))
    det = stage("arima_sql", D.arima_residuals_sql(qc, "observed", order=(1, 1, 0), cache_input=False))
    det2 = T.detect_threshold_anomalies(
        T.dynamic_threshold(det, "residual", window_sz=96, alpha=0.0001, min_range=0.25, strategy="prefix_sum")
    )
    det2 = det2.withColumn("all_anomalies", F.col("detected_anomaly") | F.col("anomaly"))
    det2 = stage("threshold_events", anomaly_events(det2, "all_anomalies", wf=1, out_col="detected_event"))
    cor = stage(
        "correct",
        C.generate_corrections(
            det2.select("doc_id", "pos", "ts", "observed", "detected_event"),
            "observed", "detected_event", arima_order=(1, 1, 0),
        ).select("doc_id", "ts", "pos", "det_cor"),
    )
    t0 = time.time()
    fin = RO.rollup_points(cor, 900).persist()
    n = fin.count()
    agg = fin
    for t in (3600, 86400):
        agg = RO.rollup_from_rollup(agg.drop("tier"), t).persist()
        n += agg.count()
    times["rollups"] = round(time.time() - t0, 2)
    print(f"[{cpus}] rollups: {times['rollups']}s ({n} rows)", file=sys.stderr, flush=True)
    times["total"] = round(sum(times.values()), 2)
    print(json.dumps({"cpus": cpus, "stages": times}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
