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
from pyspark.sql import DataFrame, Window, functions as F
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


def arima_residuals_fixed(
    df: DataFrame,
    value_col: str = "observed",
    model=None,
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
    resid_col: str = "residual",
    pred_col: str = "prediction",
) -> DataFrame:
    """Per-series residuals/predictions for a FIXED ARIMA model
    ``model = (c, phi, theta, d)`` — the q>0 ψ-filter innovation path with
    coefficients supplied instead of fit. This is how tuned site parameters
    are applied at scale (the reference's per-sensor configs fix q=1,
    `parameters.py:70-272`): the fit happened once offline, the cluster job
    only applies it, so the math is replayable coefficient-exact by any SQL
    engine (e_t = Σ_j (−θ)^j z_{t−j}, geometric truncation).

    ``model`` is REQUIRED: applying arbitrary default coefficients would
    silently produce residuals from a model nobody fit."""
    if model is None:
        raise ValueError(
            "arima_residuals_fixed requires model=(c, phi, theta, d) — "
            "fixed coefficients must come from an offline fit, not a default"
        )
    c, phi, theta, d = model
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(resid_col, DoubleType(), True),
            StructField(pred_col, DoubleType(), True),
        ]
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        resid, pred = arima_mod.apply_arima(x, c, np.asarray(phi), np.asarray(theta), d)
        pdf[resid_col] = resid
        pdf[pred_col] = pred
        return pdf

    # pin the grouped-map parallelism: the shuffled rows are tiny by BYTES
    # (AQE would coalesce the kernel stage to one task) while the per-series
    # work is CPU-heavy — the repo-wide AQE-coalescing-trap treatment
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key).groupBy(key).applyInPandas(apply_fn, schema=out_schema)


def arima_residuals_sql(
    df: DataFrame,
    value_col: str = "observed",
    order=(1, 1, 0),
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
    resid_col: str = "residual",
    pred_col: str = "prediction",
    cache_input: bool = False,
) -> DataFrame:
    """AR(p) / ARI(p,d) residuals computed almost entirely JVM-side.

    For q=0 the Hannan–Rissanen fit degenerates to per-series least squares,
    whose normal equations are just sums of lag products — a groupBy
    aggregation. Only the (p+1)-vector of coefficients per series crosses
    the Python boundary (a mapInPandas solve over one row per series);
    predictions/residuals are then pure column expressions. Numerically
    identical (≤1e-9) to the grouped-map ``fit_arima`` path, ~10× cheaper
    at scale because the fact rows never leave the JVM.

    The lagged plan is consumed twice (moment sums, then the fact-side
    join). The DEFAULT is to recompute: at cluster scale persisting the
    whole fact table costs more (memory pressure + spill + eviction of
    hotter caches) than replaying a columnar scan + window, and the second
    consumer reuses the same shuffle output anyway where one exists. Pass
    ``cache_input=True`` only for small inputs behind expensive upstream
    lineage (e.g. an un-checkpointed iterative result).
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

    p, d, q = order
    if q != 0 or d > 2:
        raise ValueError("SQL path supports q=0, d<=2; use arima_residuals")

    w = Window.partitionBy(key).orderBy(order_col)
    x = F.col(value_col)
    # d-fold difference
    y = x
    for _ in range(d):
        y = y - F.lag(y).over(w)
    tmp = df.withColumn("__y", y)
    for j in range(1, p + 1):
        tmp = tmp.withColumn(f"__yl{j}", F.lag("__y", j).over(w))
    if cache_input:
        # opt-in only — see docstring for why recompute is the default
        from pyspark import StorageLevel

        tmp = tmp.persist(StorageLevel.MEMORY_AND_DISK)

    intercept = d == 0
    # regression rows: all lags present (t >= d + p in original indexing)
    cond = F.lit(True)
    for j in range(0, p + 1):
        c = F.col("__y") if j == 0 else F.col(f"__yl{j}")
        cond = cond & c.isNotNull()
    terms = ["__y"] + [f"__yl{j}" for j in range(1, p + 1)]
    aggs = [F.count(F.when(cond, 1)).alias("n")]
    for i, a in enumerate(terms):
        aggs.append(F.sum(F.when(cond, F.col(a))).alias(f"s_{i}"))
        for jj, b in enumerate(terms[i:], start=i):
            aggs.append(
                F.sum(F.when(cond, F.col(a) * F.col(b))).alias(f"s_{i}_{jj}")
            )
    moments = tmp.groupBy(key).agg(*aggs)

    n_terms = p + 1
    key_type = df.schema[key].dataType
    coef_schema = StructType(
        [
            StructField(key, key_type, False),
            StructField("__coef", ArrayType(DoubleType(), False), False),
        ]
    )

    def solve(batches):
        for pdf in batches:
            out_keys, out_coefs = [], []
            for _, r in pdf.iterrows():
                n = r["n"]
                # build X'X / X'y from the moment sums; term 0 is y itself
                import numpy as np

                k = p + (1 if intercept else 0)
                XtX = np.zeros((k, k))
                Xty = np.zeros(k)
                def s(i, j):
                    i, j = min(i, j), max(i, j)
                    return r[f"s_{i}_{j}"]
                off = 0
                if intercept:
                    XtX[0, 0] = n
                    for j in range(1, p + 1):
                        XtX[0, j] = XtX[j, 0] = r[f"s_{j}"]
                    Xty[0] = r["s_0"]
                    off = 1
                for i in range(1, p + 1):
                    for j in range(i, p + 1):
                        XtX[off + i - 1, off + j - 1] = XtX[off + j - 1, off + i - 1] = s(i, j)
                    Xty[off + i - 1] = s(0, i)
                try:
                    if not (np.isfinite(XtX).all() and np.isfinite(Xty).all()):
                        raise ValueError("non-finite moments")
                    beta = np.linalg.lstsq(XtX, Xty, rcond=None)[0]
                except Exception:
                    beta = np.zeros(k)
                c0 = float(beta[0]) if intercept else 0.0
                phi = beta[off:].astype(float)
                if p and np.sum(np.abs(phi)) > 0.99 and np.any(
                    np.abs(np.roots(np.r_[1, -phi])) >= 1
                ):
                    phi = phi * 0.98 / max(np.sum(np.abs(phi)), 1e-9)
                out_keys.append(r[key])
                out_coefs.append([c0] + phi.tolist())
            yield pd.DataFrame({key: out_keys, "__coef": out_coefs})

    coefs = moments.mapInPandas(solve, schema=coef_schema)

    # one tiny row per series — always broadcast; never let the planner
    # shuffle the fact side for this join
    joined = tmp.join(F.broadcast(coefs), on=key)
    yhat = F.element_at("__coef", 1)
    for j in range(1, p + 1):
        yhat = yhat + F.element_at("__coef", j + 1) * F.coalesce(
            F.col(f"__yl{j}"), F.lit(0.0)
        )
    # rebuild the level prediction from observed lags (fit_arima semantics)
    rn = F.row_number().over(w)
    if d == 0:
        pred = yhat
    elif d == 1:
        pred = F.lag(x, 1).over(w) + yhat
    else:
        pred = 2 * F.lag(x, 1).over(w) - F.lag(x, 2).over(w) + yhat
    warm = max(d, 1)
    pred = F.when(rn <= warm, x).otherwise(pred)
    resid = F.when(rn <= 1, F.lit(0.0)).otherwise(x - pred)
    out = joined.withColumn(pred_col, pred).withColumn(resid_col, resid)
    drop = ["__y", "__coef"] + [f"__yl{j}" for j in range(1, p + 1)]
    return out.drop(*drop)


def arima_detect(
    df: DataFrame,
    params,
    rules: bool = True,
    value_col: str = "value",
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
    threshold_strategy: str = "exact",
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
    pdq = tuple(p.pdq)
    if pdq[2] == 0 and pdq[1] <= 2:
        out = arima_residuals_sql(out, obs_col, order=pdq, key=key, order_col=order_col)
    else:
        out = arima_residuals(out, obs_col, order=pdq, key=key, order_col=order_col)
    out = dynamic_threshold(
        out,
        "residual",
        window_sz=p.window_sz,
        alpha=p.alpha,
        min_range=p.threshold_min,
        key=key,
        order=order_col,
        strategy=threshold_strategy,
    )
    out = detect_threshold_anomalies(out)
    out = out.withColumn(
        "all_anomalies", F.col("detected_anomaly") | F.col("anomaly")
    )
    out = anomaly_events(out, "all_anomalies", wf=p.widen, out_col="detected_event", key=key, order=order_col)
    return out
