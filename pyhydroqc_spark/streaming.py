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
from .tables import SnapshotTable

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _merge_cells(existing: DataFrame | None, incoming: DataFrame) -> DataFrame:
    if existing is None:
        return incoming
    merged = (
        existing.unionByName(incoming)
        .groupBy("doc_id", "bucket_start", "tier", "day")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .withColumn("avg_val", F.col("sum_val") / F.col("cnt"))
    )
    return merged.select(
        "doc_id", "bucket_start", "cnt", "sum_val", "avg_val", "min_val", "max_val",
        "tier", "day",
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
        """Cell-scoped MERGE: read ONLY the day-partitions the micro-batch
        touches, fold the batch's partial aggregates in, and atomically
        replace just those partitions (SnapshotTable.overwrite_partitions).
        Per-batch cost is O(touched cells), not O(store size), and the
        snapshot commit replaces the old tmp-dir double write."""
        spark = batch_df.sparkSession
        incoming = rollup_points(batch_df, tier_seconds, value_col=value_col).withColumn(
            "day", F.date_format("bucket_start", "yyyy-MM-dd")
        ).persist()
        days = {r["day"] for r in incoming.select("day").distinct().collect()}
        store = SnapshotTable(agg_path)
        hit_files = store.files_for_partitions(days)
        if hit_files:
            existing = spark.read.parquet(*hit_files)
            merged = _merge_cells(existing, incoming)
        else:
            merged = incoming
        store.overwrite_partitions(merged, "day")
        incoming.unpersist()

    q = (
        long_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
