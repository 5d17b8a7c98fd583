"""Parity: dynamic threshold vs reference set_dynamic_threshold — including
the edge-clamping subtlety (`anomaly_utilities.py:403-413`)."""

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhydroqc_spark.operators import threshold
from tests.reference_oracle import load_reference

REF = load_reference()


def _mk(spark, resids_by_doc):
    rows = [
        (d, i, float(v))
        for d, rs in resids_by_doc.items()
        for i, v in enumerate(rs)
    ]
    return spark.createDataFrame(rows, "doc_id string, pos int, residual double")


@pytest.mark.parametrize("strategy", ["exact", "prefix_sum"])
@pytest.mark.parametrize("window_sz,alpha,min_range", [(30, 0.0001, 0.25), (5, 0.05, 0.0), (96, 0.01, 0.1)])
def test_dynamic_threshold_parity(spark, window_sz, alpha, min_range, strategy):
    rng = np.random.default_rng(11)
    resids = {
        "a": rng.normal(0, 1, 300),
        "b": rng.normal(2, 0.5, 40),
        "c": rng.normal(0, 3, 7),  # shorter than window: reference shrinks w
    }
    df = _mk(spark, resids)
    out = (
        threshold.dynamic_threshold(
            df, window_sz=window_sz, alpha=alpha, min_range=min_range, strategy=strategy
        )
        .orderBy("doc_id", "pos")
        .select("doc_id", "low", "high")
        .toPandas()
    )
    atol = 1e-9 if strategy == "exact" else 1e-6
    for d, rs in resids.items():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            exp = REF["anomaly_utilities"].set_dynamic_threshold(
                pd.Series(rs), window_sz=window_sz, alpha=alpha, min_range=min_range
            )
        got = out[out.doc_id == d].reset_index(drop=True)
        np.testing.assert_allclose(got["low"].values, exp["low"].values, atol=atol, err_msg=d)
        np.testing.assert_allclose(got["high"].values, exp["high"].values, atol=atol, err_msg=d)


def test_detect_anomalies_parity(spark):
    rng = np.random.default_rng(3)
    rs = rng.normal(0, 1, 200)
    rs[[20, 80, 150]] = [9.0, -9.0, 7.5]
    df = _mk(spark, {"a": rs})
    out = threshold.dynamic_threshold(df, window_sz=30, alpha=0.001, min_range=0.1)
    out = threshold.detect_threshold_anomalies(out)
    got = out.orderBy("pos").select("detected_anomaly").toPandas()["detected_anomaly"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        th = REF["anomaly_utilities"].set_dynamic_threshold(
            pd.Series(rs), window_sz=30, alpha=0.001, min_range=0.1
        )
        det = REF["anomaly_utilities"].detect_anomalies(
            pd.Series(rs), pd.Series(rs), pd.Series(rs), th, summary=False
        )
    assert got.astype(bool).tolist() == det["anomaly"].astype(bool).tolist()
    assert got[20] and got[80] and got[150]
