"""Calibration-event detection + linear drift correction.

Re-expression of `/root/reference/pyhydroqc/calibration.py`:

* ``edge_filter``        ↔ calib_edge_detect  (:13-51) — native Windows
* ``edge_candidates``    ↔ the per-day threshold scan (:38-49)
* ``persist_candidates`` ↔ calib_persist_detect (:54-97) — native Windows,
                           including the one-row-earlier group extension quirk (:74,:83)
* ``overlap``            ↔ calib_overlap (:100-141) — groupBy AND across sensors
* ``find_gaps``          ↔ find_gap (:144-183) — per-event grouped pandas over a
                           broadcast range-join (each window is ±hours, tiny)
* ``drift_correct``      ↔ lin_drift_cor (:186-210) applied sequentially per
                           series (events chain: each start is the prior end,
                           `Examples/FindCompareGaps.py:110-120`)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

from ..params import CalibParams
from .events import SERIES_KEY, ORDER_COL, series_window


def edge_filter(
    df: DataFrame,
    width: int,
    value_col: str = "observed",
    out_col: str = "edge_diff",
    key: str = SERIES_KEY,
    order: str = ORDER_COL,
) -> DataFrame:
    """edge[i] = (Σ x[i-w..i-1] − Σ x[i..i+w-1]) / w on interior rows, else 0
    (`calibration.py:34-36`)."""
    w = series_window(key, order)
    before = F.sum(value_col).over(w.rowsBetween(-width, -1))
    after = F.sum(value_col).over(w.rowsBetween(0, width - 1))
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(
        Window.partitionBy(key).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    interior = (rn > width) & (rn <= n - width)
    return df.withColumn(
        out_col,
        F.when(interior, (before - after) / width).otherwise(F.lit(0.0)),
    )


def edge_candidates(
    df: DataFrame,
    threshold: float,
    calib: CalibParams = CalibParams(),
    edge_col: str = "edge_diff",
    ts_col: str = "ts",
    key: str = SERIES_KEY,
) -> DataFrame:
    """Per day: if max |edge| > threshold, the candidate is the timestamp of
    the day's max edge value (NOT max |edge| — reference quirk at
    `calibration.py:42-43`: the test uses abs, the argmax does not), gated to
    business days and calibration hours. Returns (key, candidate ts)."""
    by_day = (
        df.groupBy(key, F.to_date(ts_col).alias("__day"))
        .agg(
            F.max(F.abs(F.col(edge_col))).alias("__max_abs"),
            F.max_by(F.col(ts_col), F.col(edge_col)).alias("candidate"),
        )
        .where(F.col("__max_abs") > threshold)
    )
    # pandas dayofweek Mon=0..Fri=4 → Spark dayofweek Sun=1..Sat=7: Mon-Fri = 2..6
    return by_day.where(
        F.dayofweek("candidate").between(2, 6)
        & F.hour("candidate").between(calib.hour_low, calib.hour_high)
    ).select(key, "candidate")


def persist_candidates(
    df: DataFrame,
    calib: CalibParams = CalibParams(),
    grp_col: str = "persist_grp",
    ts_col: str = "ts",
    key: str = SERIES_KEY,
    order: str = ORDER_COL,
    flag_col: str = "anomaly",
    out_col: str = "calib_flag",
) -> DataFrame:
    """Persistence-based calibration candidates (`calibration.py:54-97`).

    Reference semantics replicated exactly:
    * each persist group is first extended one row EARLIER (:74,:83 —
      the `shift(-1)` trick), so group length is measured including that row;
    * groups with extended length in [persist_low, persist_high] mark all of
      their rows anomalous;
    * the candidate flag is then (anomaly AND business-day AND hour window).
    """
    w = series_window(key, order)
    nxt = F.lead(grp_col).over(w)
    ext = F.when(
        (F.col(grp_col) == 0) & (F.coalesce(nxt, F.lit(0)) > 0), nxt
    ).otherwise(F.col(grp_col))
    out = df.withColumn("__egrp", ext)
    wg = Window.partitionBy(key, "__egrp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    glen = F.when(F.col("__egrp") > 0, F.count(F.lit(1)).over(wg)).otherwise(F.lit(0))
    hit = (
        (F.col("__egrp") > 0)
        & (glen >= calib.persist_low)
        & (glen <= calib.persist_high)
    )
    anom = F.col(flag_col) | hit
    business = F.dayofweek(ts_col).between(2, 6) & F.hour(ts_col).between(
        calib.hour_low, calib.hour_high
    )
    return out.withColumn(out_col, anom & business).drop("__egrp")


def overlap(
    df: DataFrame,
    sensor_col: str,
    n_sensors: int | None = None,
    flag_col: str = "calib_event_flag",
    key: str = "site",
    order: str = ORDER_COL,
) -> DataFrame:
    """AND of per-sensor calibration-event membership at each position
    (`calibration.py:100-141`): a position overlaps when EVERY sensor of the
    site is inside a (widened) calib event there. Input: one row per
    (site, sensor, pos) with a boolean event-membership flag."""
    counted = df.groupBy(key, order).agg(
        F.sum(F.col(flag_col).cast("int")).alias("__n_in"),
        F.count(F.lit(1)).alias("__n_sensors"),
    )
    need = F.lit(n_sensors) if n_sensors else F.col("__n_sensors")
    return counted.withColumn("all_calib", F.col("__n_in") == need).select(
        key, order, "all_calib"
    )


def find_gaps(
    series_df: DataFrame,
    candidates_df: DataFrame,
    hours: int = 2,
    value_col: str = "observed",
    ts_col: str = "ts",
    key: str = SERIES_KEY,
) -> DataFrame:
    """Per candidate: gap magnitude + end timestamp (`calibration.py:144-183`).

    Physical plan: the candidates side is tiny → broadcast range-join pulls
    only the ±hours window rows, then one grouped pandas kernel per
    (series, candidate) replicates the reference's argmax/tie/spike rules
    exactly. Returns (doc_id, calib_date, gap, end).
    """
    from pyspark.sql.types import StringType

    schema = StructType(
        [
            StructField("doc_id", StringType(), True),
            StructField("calib_date", TimestampType(), True),
            StructField("gap", DoubleType(), True),
            StructField("end", TimestampType(), True),
        ]
    )
    cand = candidates_df.select(
        F.col(key).alias("c_doc_id"), F.col("candidate").alias("calib_date")
    )
    ser = series_df.select(
        F.col(key).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("val"),
    )
    joined = ser.join(
        F.broadcast(cand),
        on=(F.col("doc_id") == F.col("c_doc_id"))
        & F.col("ts").between(
            F.col("calib_date") - F.expr(f"INTERVAL {hours} HOURS"),
            F.col("calib_date") + F.expr(f"INTERVAL {hours} HOURS"),
        ),
    ).select("doc_id", "ts", "val", "calib_date")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        sub = pd.Series(pdf["val"].to_numpy(), index=pd.DatetimeIndex(pdf["ts"]))
        diff = sub.diff()
        fwd = sub.shift(-1).diff()  # x[t+1] − x[t]
        maxtime = diff.abs().idxmax()
        if diff.loc[maxtime] * fwd.loc[maxtime] < 0:
            gap = diff.loc[maxtime] + fwd.loc[maxtime]
        else:
            gap = diff.loc[maxtime]
        end = fwd.abs().idxmax()
        return pd.DataFrame(
            {
                "doc_id": [pdf["doc_id"].iloc[0]],
                "calib_date": [pdf["calib_date"].iloc[0]],
                "gap": [float(gap)],
                "end": [end],
            }
        )

    return joined.groupBy("doc_id", "calib_date").applyInPandas(kernel, schema=schema)


def lin_drift_ramp(
    df: DataFrame,
    start,
    end,
    gap: float,
    value_col: str = "observed",
    out_col: str = "ldc",
    ts_col: str = "ts",
    key: str = SERIES_KEY,
    order: str = ORDER_COL,
) -> DataFrame:
    """Single-event linear drift correction as a pure column expression
    (`calibration.py:186-210`): y_i = x_i + gap·i/(cnt−1) over [start, end]."""
    in_evt = F.col(ts_col).between(F.lit(start), F.lit(end))
    wevt = Window.partitionBy(key, in_evt).orderBy(order)
    wcnt = Window.partitionBy(key, in_evt).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    i = F.row_number().over(wevt) - 1
    cnt = F.count(F.lit(1)).over(wcnt)
    ramp = F.lit(float(gap)) / (cnt - 1) * i
    return df.withColumn(
        out_col,
        F.when(in_evt, F.col(value_col) + ramp).otherwise(F.col(value_col)),
    )


def drift_correct(
    series_df: DataFrame,
    events_df: DataFrame,
    value_col: str = "observed",
    out_col: str = "drift_cor",
    ts_col: str = "ts",
    key: str = SERIES_KEY,
    order: str = ORDER_COL,
) -> DataFrame:
    """Apply a series' calibration events in time order, each a linear ramp
    ending with the full gap at its end timestamp — the chained form used by
    `Examples/FindCompareGaps.py:110-120` (event k's start is event k−1's
    end, so corrections must be applied sequentially within a series).

    events_df: (doc_id, start, end, gap) — small relative to the series.
    Cogrouped, NOT joined: replicating the event array onto every series
    row makes Arrow serialize n_rows × n_events nested timestamp structs
    to the Python worker (measured 45s/35k-row series at 18 events —
    dominated a real-LRO test); a cogroup ships each side once per group.
    """
    schema = StructType(
        list(series_df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )

    def kernel(pdf: pd.DataFrame, ev: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:  # events for a series absent from series_df
            return pdf.assign(**{out_col: pd.Series(dtype=float)})
        pdf = pdf.sort_values(order).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=float).copy()
        ts = pd.DatetimeIndex(pdf[ts_col])
        # same application order as the former sort_array(struct(start,end,gap))
        for e in ev.sort_values(["start", "end", "gap"]).itertuples():
            m = (ts >= e.start) & (ts <= e.end)
            cnt = int(m.sum())
            if cnt >= 2:
                vals[m] = vals[m] + e.gap / (cnt - 1) * np.arange(cnt)
        out = pdf.copy()
        out[out_col] = vals
        return out

    return (
        series_df.groupBy(key)
        .cogroup(events_df.select(key, "start", "end", "gap").groupBy(key))
        .applyInPandas(kernel, schema=schema)
    )
