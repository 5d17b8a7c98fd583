"""Tiered continuous aggregates — 15min / 1h / 1d rollups.

Engine-added operators (north_star): aggregates of the anomaly-corrected
series (`det_cor`, the output of the correction pass — semantics anchor
`/root/reference/pyhydroqc/arima_correct.py:96,151,161,171`).

Scale design:
* the 15min tier aggregates the long fact table: ``groupBy(doc_id, bucket)``
  → partial+final hash aggregation from Catalyst (map-side combine shrinks
  the shuffle by the bucket fan-in, here 1 row per 1..N points);
* coarser tiers re-aggregate the next-finer tier (1h from 15min, 1d from
  1h) — sum/min/max/count compose, avg is recomputed as Σsum/Σcnt; this is
  a ~96× smaller input than re-scanning facts;
* bucket = epoch-floor, a pure column expression (partition-prunable when
  the table is laid out by bucket day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TIER_15MIN = 900
TIER_1H = 3600
TIER_1D = 86400
DEFAULT_TIERS = (TIER_15MIN, TIER_1H, TIER_1D)

AGG_COLS = ["cnt", "sum_val", "avg_val", "min_val", "max_val"]


def bucket_col(ts_col: str, tier_seconds: int):
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / tier_seconds) * tier_seconds
    )


def rollup_points(
    df: DataFrame,
    tier_seconds: int,
    value_col: str = "det_cor",
    ts_col: str = "ts",
    key: str = "doc_id",
) -> DataFrame:
    """Fact rows → one aggregate row per (series, bucket)."""
    return (
        df.withColumn("bucket_start", bucket_col(ts_col, tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(value_col).alias("cnt"),
            F.sum(value_col).alias("sum_val"),
            F.avg(value_col).alias("avg_val"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
        .withColumn("tier", F.lit(int(tier_seconds)))
    )


def rollup_from_rollup(
    agg_df: DataFrame, tier_seconds: int, key: str = "doc_id"
) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1h←15min, 1d←1h)."""
    return (
        agg_df.withColumn("bucket_start", bucket_col("bucket_start", tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .withColumn("avg_val", F.col("sum_val") / F.col("cnt"))
        .select(key, "bucket_start", "cnt", "sum_val", "avg_val", "min_val", "max_val")
        .withColumn("tier", F.lit(int(tier_seconds)))
    )


def rollup_all_tiers(
    df: DataFrame,
    tiers=DEFAULT_TIERS,
    value_col: str = "det_cor",
    ts_col: str = "ts",
    key: str = "doc_id",
) -> dict[int, DataFrame]:
    """All tiers, each coarser one derived tier-from-tier."""
    tiers = sorted(tiers)
    out: dict[int, DataFrame] = {}
    finest = rollup_points(df, tiers[0], value_col, ts_col, key)
    out[tiers[0]] = finest
    prev = finest
    for t in tiers[1:]:
        prev = rollup_from_rollup(prev.drop("tier"), t, key)
        out[t] = prev
    return out
