"""Structured-Streaming surface for incremental rollup maintenance.

The engine's primary incremental path is batch-over-snapshots
(pipeline.py); this module is the equivalent expressed as Structured
Streaming with ``Trigger.AvailableNow`` — each invocation drains whatever
new token files have landed, rolls them up, and MERGEs the affected
(doc_id, bucket) cells into the aggregate store via ``foreachBatch``.
State lives in the Spark checkpoint dir + the aggregate tables, so a
killed stream resumes exactly where it stopped (same guarantee as the
batch checkpoint log, enforced by Spark's write-ahead offsets).

Cell-level MERGE semantics: rollup aggregates (cnt/sum/min/max) are
commutative monoids, so merging a micro-batch's partial aggregates into
stored cells is associative — late/new data for an existing bucket folds
in without recomputing the series (`avg = merged sum / merged cnt`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ingest import explode_tokens
from .operators.rollup import rollup_points

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _merge_cells(existing: DataFrame | None, incoming: DataFrame) -> DataFrame:
    if existing is None:
        return incoming
    merged = (
        existing.unionByName(incoming)
        .groupBy("doc_id", "bucket_start", "tier")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .withColumn("avg_val", F.col("sum_val") / F.col("cnt"))
    )
    return merged.select(
        "doc_id", "bucket_start", "cnt", "sum_val", "avg_val", "min_val", "max_val", "tier"
    )


def run_streaming_rollup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    tier_seconds: int = 900,
    value_col: str = "value",
) -> None:
    """Drain new token files → 15min rollup cells → merge into out_dir.

    ``Trigger.AvailableNow`` processes everything pending then stops —
    the scheduled-job shape of "continuous aggregates maintained
    incrementally as new partitions land".
    """
    agg_path = os.path.join(out_dir, "agg")
    ckpt_path = os.path.join(out_dir, "_stream_checkpoint")

    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    long_df = explode_tokens(stream)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        incoming = rollup_points(batch_df, tier_seconds, value_col=value_col)
        try:
            existing = batch_df.sparkSession.read.parquet(agg_path)
        except Exception:
            existing = None
        merged = _merge_cells(existing, incoming)
        tmp = agg_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = batch_df.sparkSession.read.parquet(tmp)
        final.write.mode("overwrite").parquet(agg_path)

    q = (
        long_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
