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


def merge_batch_tiers(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    tiers,
    value_col: str = "value",
) -> int:
    """Multi-tier continuous aggregates: fold one micro-batch into EVERY
    retention tier's store (``agg_{t}s``). The finest tier aggregates the
    raw batch; coarser tiers re-aggregate the finest tier's PARTIAL cells
    (cnt/sum/min/max are monoids, so partials of partials are exact) — the
    batch is scanned once regardless of tier count. Each store commits its
    own batch id, so a crash between tier commits replays safely: finished
    tiers skip, unfinished tiers apply. Returns how many tiers applied."""
    from .operators.rollup import rollup_from_rollup

    tiers_sorted = sorted(int(t) for t in tiers)
    finest = rollup_points(batch_df, tiers_sorted[0], value_col=value_col).persist()
    applied = 0
    try:
        agg = finest
        for t in tiers_sorted:
            if t != tiers_sorted[0]:
                agg = rollup_from_rollup(agg.drop("tier"), t)
            applied += _merge_cells_into(
                batch_df.sparkSession, agg, batch_id,
                os.path.join(out_dir, f"agg_{t}s"),
            )
    finally:
        finest.unpersist()
    return applied


def merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    agg_path: str,
    tier_seconds: int = 900,
    value_col: str = "value",
) -> bool:
    """Cell-scoped MERGE of one micro-batch: read ONLY the day-partitions
    the batch touches, fold the batch's partial aggregates in, and
    atomically replace just those partitions via
    ``SnapshotTable.overwrite_partitions``. Per-batch cost is O(touched
    cells), not O(store size).

    IDEMPOTENT under foreachBatch's at-least-once delivery: the batch id
    rides the atomic snapshot commit (manifest ``extra``), and a batch whose
    id is ≤ the last committed one is a retry of work already folded in —
    it must be skipped, or cnt/sum would double. Returns True if the batch
    was applied, False if it was recognized as a replay."""
    cells = rollup_points(batch_df, tier_seconds, value_col=value_col)
    return bool(
        _merge_cells_into(batch_df.sparkSession, cells, batch_id, agg_path)
    )


def _merge_cells_into(spark, cells: DataFrame, batch_id: int, agg_path: str) -> int:
    """Fold partial cells into one tier store (see merge_batch for the
    idempotence contract). Returns 1 if applied, 0 if replay-skipped."""
    store = SnapshotTable(agg_path)
    # walk the snapshot lineage, not just the current snapshot: an
    # interleaved non-stream commit (append / retention) would otherwise
    # hide the streaming high-water mark and a retry would double-count
    last = store.latest_extra_value("stream_batch_id")
    if last is not None and batch_id <= int(last):
        return 0
    incoming = cells.withColumn(
        "day", F.date_format("bucket_start", "yyyy-MM-dd")
    ).persist()
    days = {r["day"] for r in incoming.select("day").distinct().collect()}
    hit_files = store.files_for_partitions(days)
    if hit_files:
        existing = spark.read.parquet(*hit_files)
        merged = _merge_cells(existing, incoming)
    else:
        merged = incoming
    store.overwrite_partitions(merged, "day", extra={"stream_batch_id": int(batch_id)})
    incoming.unpersist()
    return 1


def run_streaming_rollup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    tier_seconds=900,
    value_col: str = "value",
) -> None:
    """Drain new token files → rollup cells → merge into out_dir.

    ``tier_seconds`` may be one tier (store ``agg``) or a tuple of tiers
    (one store per tier, ``agg_{t}s`` — ALL retention tiers maintained
    continuously from the same single scan of each micro-batch).

    ``Trigger.AvailableNow`` processes everything pending then stops —
    the scheduled-job shape of "continuous aggregates maintained
    incrementally as new partitions land".

    The aggregate store and the stream checkpoint live and die together:
    batch ids (which make the merge idempotent under retries) are scoped to
    the checkpoint, so pointing a FRESH checkpoint at an existing store
    would replay ids from 0 and be skipped as duplicates — wipe both or
    neither.
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
        if isinstance(tier_seconds, (tuple, list, set)):
            merge_batch_tiers(batch_df, batch_id, out_dir, tier_seconds, value_col)
        else:
            merge_batch(batch_df, batch_id, agg_path, tier_seconds, value_col)

    q = (
        long_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
