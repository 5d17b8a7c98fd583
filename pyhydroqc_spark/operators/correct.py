"""Anomaly correction — forecast/backcast blend per anomalous event.

Clean-room re-implementation of the reference's correction pass
(`/root/reference/pyhydroqc/arima_correct.py:13-188`): alternate-run
grouping, conditional widening of too-short valid groups, then an
iterative shortest-event-first loop that forecasts from the preceding
valid group, backcasts from the following one, and cross-fades the two.

The whole loop is inherently sequential *within* a series (group ids are
renumbered as events are corrected) and embarrassingly parallel *across*
series — exactly the applyInPandas shape. Forecasts come from the engine's
own numpy ARIMA (`arima.forecast_arima`); the reference's pmdarima calls
are swapped for the same function in the parity tests so the loop logic is
compared like-for-like.

Deviation from the reference (documented): when a series is entirely
anomalous the reference prints an error and loops forever
(`arima_correct.py:147-148`); the engine leaves those points uncorrected
and terminates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

from .arima import forecast_arima
from .events import SERIES_KEY, ORDER_COL

MIN_GROUP_LEN = 20  # `arima_correct.py:13` default
MODEL_LIMIT_DAYS = 6  # `arima_correct.py:69` default


def crossfade(front: np.ndarray, back: np.ndarray) -> np.ndarray:
    """Linear ramp blend (`anomaly_utilities.py:346-378`): weight
    (i+1)/(n+1) on the backcast, mirrored on the forecast."""
    n = len(front)
    w = np.arange(1, n + 1, dtype=float) / (n + 1)
    return np.flip(w) * front + w * back


def _alternate_groups(marks: np.ndarray) -> np.ndarray:
    """group_bools semantics (`anomaly_utilities.py:313-343`): a new group id
    at every change of the raw column value, starting at 0."""
    if len(marks) == 0:
        return np.zeros(0, dtype=int)
    changed = np.r_[0, (marks[1:] != marks[:-1]).astype(int)]
    return np.cumsum(changed)


def _widen_groups(event_vals: np.ndarray, grp: np.ndarray, min_group_len: int):
    """arima_group semantics (`arima_correct.py:13-47`): valid groups shorter
    than min_group_len are absorbed into the surrounding anomalous event."""
    n = len(grp)
    ev = event_vals != 0
    agrp = np.zeros(n, dtype=int)
    new_gi = 0
    for g in range(int(grp.max()) + 1 if n else 0):
        m = grp == g
        first = np.argmax(m)
        if (not ev[first]) and int(m.sum()) < min_group_len:
            ev[m] = True
            if new_gi > 0:
                new_gi -= 1
            agrp[m] = new_gi
        else:
            agrp[m] = new_gi
            new_gi += 1
    return ev, agrp


def correct_series(
    values: np.ndarray,
    event_vals: np.ndarray,
    ts: pd.DatetimeIndex,
    min_group_len: int = MIN_GROUP_LEN,
    model_limit_days: int = MODEL_LIMIT_DAYS,
    order=None,
    order_search: str = "grid",
):
    """Run the correction loop on one series.

    Returns (det_cor, corrected) — the corrected value per point and a
    bool marking which points were synthesized.
    """
    vals = np.asarray(values, dtype=float)
    n = len(vals)
    grp = _alternate_groups(np.asarray(event_vals))
    ev, agrp = _widen_groups(np.asarray(event_vals), grp, min_group_len)
    det_cor = vals.copy()
    corrected = ev.copy()
    # label-based DatetimeIndex slicing is the kernel's hot spot at scale;
    # the same inclusive-endpoint semantics in int64 ns via searchsorted
    ts_i8 = ts.asi8
    limit_ns = pd.Timedelta(days=model_limit_days).value

    while ev.any():
        # shortest anomalous group next — ties broken the way pandas
        # value_counts orders them, which the reference relies on
        # (`arima_correct.py:105`). Fast path: when ONE group strictly has
        # the minimum count the pick is unambiguous (numpy bincount); the
        # pandas call — whose tie order comes from an unstable sort over
        # hashtable insertion order and can't be replicated — runs only on
        # actual ties, preserving exact reference behavior.
        sub = agrp[ev]
        counts = np.bincount(sub)
        present = np.flatnonzero(counts)
        mcount = counts[present].min()
        mins = present[counts[present] == mcount]
        if len(mins) == 1:
            i = int(mins[0])
        else:
            i = int(pd.Series(sub).value_counts().index.values[-1])
        gmask = agrp == i
        glen = int(gmask.sum())
        gmax = int(agrp.max())

        yfor = ybac = None
        if i != 0:
            pm = agrp == (i - 1)
            pv, pt = vals[pm], ts_i8[pm]
            # pre[last-limit : last] label slice = first index ≥ lower bound
            start = int(np.searchsorted(pt, pt[-1] - limit_ns, side="left"))
            yfor = forecast_arima(pv[start:], glen, order=order, order_search=order_search)
        if i != gmax:
            qm = agrp == (i + 1)
            qv, qt = vals[qm], ts_i8[qm]
            # post[first : first+limit] label slice = last index ≤ upper bound
            end = int(np.searchsorted(qt, qt[0] + limit_ns, side="right"))
            ybac = np.flip(
                forecast_arima(np.flip(qv[:end]), glen, order=order, order_search=order_search)
            )

        if yfor is None and ybac is None:
            # whole series anomalous — leave as-is, terminate (see module doc)
            corrected[gmask] = False
            ev[gmask] = False
        elif yfor is None:
            det_cor[gmask] = ybac
            ev[gmask] = False
            agrp[agrp > i] -= 1
        elif ybac is None:
            det_cor[gmask] = yfor
            ev[gmask] = False
            agrp[gmask] = i - 1
        else:
            det_cor[gmask] = crossfade(yfor, ybac)
            ev[gmask] = False
            agrp[gmask] = i - 1
            agrp[agrp == i + 1] = i - 1
            agrp[agrp > i] -= 2

    return det_cor, corrected


def generate_corrections(
    df: DataFrame,
    observed_col: str = "observed",
    event_col: str = "detected_event",
    key: str = SERIES_KEY,
    order_col: str = ORDER_COL,
    ts_col: str = "ts",
    min_group_len: int = MIN_GROUP_LEN,
    model_limit_days: int = MODEL_LIMIT_DAYS,
    arima_order=None,
    order_search: str = "grid",
) -> DataFrame:
    """Distributed correction: one grouped-map UDF per series.

    Adds ``det_cor`` (double) and ``corrected`` (boolean). The corrected
    series is what every retention-tier rollup aggregates — byte-parity here
    anchors "exact match to reference aggregates" (BASELINE.json).
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("det_cor", DoubleType(), True),
            StructField("corrected", BooleanType(), True),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        det, cor = correct_series(
            pdf[observed_col].to_numpy(dtype=float),
            pdf[event_col].to_numpy(),
            pd.DatetimeIndex(pdf[ts_col]),
            min_group_len=min_group_len,
            model_limit_days=model_limit_days,
            order=arima_order,
            order_search=order_search,
        )
        pdf["det_cor"] = det
        pdf["corrected"] = cor
        return pdf

    return df.groupBy(key).applyInPandas(run, schema=out_schema)
