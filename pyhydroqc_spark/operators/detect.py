"""ARIMA-residual detection pipeline (reference workflow F1).

Re-expression of `/root/reference/pyhydroqc/model_workflow.py:19-87`
(`arima_detect`): rules QC → per-series ARIMA residuals → dynamic threshold
→ residual test → OR with rules flags → widen+enumerate events.

Physical plan: one grouped-map Arrow UDF per series computes residuals/
predictions (the only sequential math); everything else is native Window/
column expressions. The UDF returns full rows, so no re-join is needed —
the series grouping IS the shuffle, and downstream windows over the same
key reuse it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from . import arima as arima_mod
from .events import SERIES_KEY, ORDER_COL, anomaly_events
from .rules import interpolate, persistence, range_check
from .threshold import detect_threshold_anomalies, dynamic_threshold


def arima_residuals(
    df: DataFrame,
    value_col: str = "observed",
    order=(1, 1, 1),
    order_by_group: dict | None = None,
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
    resid_col: str = "residual",
    pred_col: str = "prediction",
) -> DataFrame:
    """Per-series ARIMA(p,d,q) in-sample residuals + one-step predictions.

    ``order_by_group`` optionally maps doc_id → (p,d,q) (params lookup J5);
    it is broadcast into the UDF closure.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(resid_col, DoubleType(), True),
            StructField(pred_col, DoubleType(), True),
        ]
    )
    sc = df.sparkSession.sparkContext
    bc_orders = sc.broadcast(order_by_group or {})
    default_order = tuple(order)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        o = bc_orders.value.get(pdf[key].iloc[0], default_order)
        x = pdf[value_col].to_numpy(dtype=float)
        valid = ~np.isnan(x)
        resid = np.full(len(x), np.nan)
        pred = np.full(len(x), np.nan)
        if valid.all() and len(x) > max(o[0], o[2]) + o[1] + 2:
            resid, pred, _ = arima_mod.fit_arima(x, *o)
        elif valid.any():
            # gaps survive QC only for fully-missing stretches; fit on the
            # contiguous valid prefix view and leave NaN elsewhere
            xi = np.where(valid, x, np.interp(np.arange(len(x)), np.flatnonzero(valid), x[valid]))
            r, p_, _ = arima_mod.fit_arima(xi, *o)
            resid = np.where(valid, r, np.nan)
            pred = p_
        pdf[resid_col] = resid
        pdf[pred_col] = pred
        return pdf

    return df.groupBy(key).applyInPandas(fit, schema=out_schema)


def arima_detect(
    df: DataFrame,
    params,
    rules: bool = True,
    value_col: str = "value",
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
) -> DataFrame:
    """Full detection workflow (`model_workflow.py:19-60`):

    1. (rules) range_check + persistence + interpolate → observed
    2. per-series ARIMA residuals on observed
    3. dynamic threshold over residuals
    4. residual-vs-threshold anomalies, OR'd with rules anomalies
    5. widen + enumerate → detected_event

    ``params`` is a SeriesParams (engine defaults if None).
    """
    from ..params import DEFAULT_PARAMS

    p = params or DEFAULT_PARAMS
    out = df
    if rules:
        out = range_check(out, p.max_range, p.min_range, value_col)
        out = persistence(out, p.persist, value_col)
        out = interpolate(out, 10000, value_col)
        obs_col = "observed"
    else:
        out = out.withColumn("anomaly", F.lit(False)).withColumn(
            "observed", F.col(value_col)
        )
        obs_col = "observed"
    out = arima_residuals(out, obs_col, order=tuple(p.pdq), key=key, order_col=order_col)
    out = dynamic_threshold(
        out,
        "residual",
        window_sz=p.window_sz,
        alpha=p.alpha,
        min_range=p.threshold_min,
        key=key,
        order=order_col,
    )
    out = detect_threshold_anomalies(out)
    out = out.withColumn(
        "all_anomalies", F.col("detected_anomaly") | F.col("anomaly")
    )
    out = anomaly_events(out, "all_anomalies", wf=p.widen, out_col="detected_event", key=key, order=order_col)
    return out
