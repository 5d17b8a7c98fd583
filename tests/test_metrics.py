"""Parity: compare_events / metrics / event_metrics vs the reference."""

import warnings

import numpy as np
import pandas as pd
import pytest

from pyhydroqc_spark.operators import events as ev_ops, metrics
from tests.reference_oracle import load_reference

REF = load_reference()


def _mk_events(spark, labeled, detected):
    n = len(labeled)
    pdf = pd.DataFrame(
        {
            "doc_id": ["s"] * n,
            "pos": range(n),
            "labeled_anomaly": np.asarray(labeled, dtype=bool),
            "detected_anomaly": np.asarray(detected, dtype=bool),
        }
    )
    df = spark.createDataFrame(pdf)
    df = ev_ops.anomaly_events(df, "labeled_anomaly", wf=1, out_col="labeled_event")
    df = ev_ops.anomaly_events(df, "detected_anomaly", wf=1, out_col="detected_event")
    return df, pdf


def _ref_compare(pdf, wf=1):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        la = REF["anomaly_utilities"].anomaly_events(pdf["labeled_anomaly"], wf=1)
        da = REF["anomaly_utilities"].anomaly_events(pdf["detected_anomaly"], wf=1)
        rdf = pd.DataFrame(
            {
                "labeled_anomaly": pdf["labeled_anomaly"].values,
                "detected_anomaly": pdf["detected_anomaly"].values,
                "labeled_event": la,
                "detected_event": da,
            }
        )
        return REF["anomaly_utilities"].compare_events(rdf, wf=wf)


@pytest.mark.parametrize("seed,n,pl,pdet", [(0, 120, 0.08, 0.1), (1, 200, 0.15, 0.02), (2, 80, 0.3, 0.3)])
def test_compare_events_parity(spark, seed, n, pl, pdet):
    rng = np.random.default_rng(seed)
    labeled = rng.random(n) < pl
    detected = rng.random(n) < pdet
    df, pdf = _mk_events(spark, labeled, detected)
    got = (
        metrics.compare_events(df, wf=1)
        .orderBy("pos")
        .select("conf_mtx")
        .toPandas()["conf_mtx"]
        .tolist()
    )
    exp = _ref_compare(pdf)["conf_mtx"].tolist()
    assert got == exp


def test_point_metrics_parity(spark):
    rng = np.random.default_rng(5)
    labeled = rng.random(300) < 0.1
    detected = labeled & (rng.random(300) < 0.8) | (rng.random(300) < 0.05)
    df, pdf = _mk_events(spark, labeled, detected)
    cm = metrics.compare_events(df, wf=1)
    got = metrics.point_metrics(cm).toPandas().iloc[0]
    rdf = _ref_compare(pdf)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = REF["anomaly_utilities"].metrics(rdf)
    assert got["tp"] == exp.true_positives
    assert got["fp"] == exp.false_positives
    assert got["fn"] == exp.false_negatives
    assert got["tn"] == exp.true_negatives
    np.testing.assert_allclose(
        [got["prc"], got["npv"], got["acc"], got["rcl"], got["f1"], got["f2"]],
        [exp.prc, exp.npv, exp.acc, exp.rcl, exp.f1, exp.f2],
        atol=1e-12,
    )


def test_event_metrics_parity(spark):
    rng = np.random.default_rng(6)
    labeled = rng.random(300) < 0.12
    detected = labeled & (rng.random(300) < 0.7) | (rng.random(300) < 0.04)
    df, pdf = _mk_events(spark, labeled, detected)
    cm = metrics.compare_events(df, wf=1)
    got = metrics.event_metrics(cm).toPandas().iloc[0]
    rdf = _ref_compare(pdf)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = REF["anomaly_utilities"].event_metrics(rdf)
    assert got["tp"] == exp.true_positives
    assert got["fp"] == exp.false_positives
    assert got["fn"] == exp.false_negatives


def test_aggregate_results(spark):
    n = 30
    base = pd.DataFrame({"doc_id": ["s"] * n, "pos": range(n)})
    m1 = base.assign(detected_event=[1 if 5 <= i <= 8 else 0 for i in range(n)])
    m2 = base.assign(detected_event=[2 if 7 <= i <= 12 else 0 for i in range(n)])
    out = metrics.aggregate_results(
        {"a": spark.createDataFrame(m1), "b": spark.createDataFrame(m2)}
    )
    got = out.orderBy("pos").toPandas()["detected_event"].tolist()
    assert got == [(5 <= i <= 12) for i in range(n)]


def test_compare_events_sql_equals_kernel(spark):
    """The Window-expression compare_events must be row-identical to the
    grouped-map kernel on adversarial event sequences (overlaps, touching
    groups, trailing group, singleton groups)."""
    import numpy as np

    rng = np.random.default_rng(17)
    rows = []
    for d in ["a", "b", "c"]:
        n = 300
        lab = (rng.random(n) < 0.08).astype(int)
        det = (rng.random(n) < 0.12).astype(int)
        # enumerate simple runs as pseudo event-ids (what anomaly_events makes)
        def ids(f):
            out, g = [], 0
            prev = 0
            for v in f:
                if v and not prev:
                    g += 1
                out.append(g if v else 0)
                prev = v
            return out
        li, di = ids(lab), ids(det)
        for i in range(n):
            rows.append((d, i, int(li[i]), int(di[i])))
    df = spark.createDataFrame(
        rows, "doc_id string, pos long, labeled_event long, detected_event long"
    )
    for wf in (0, 1, 2):
        a = (
            metrics.compare_events(df, wf=wf)
            .orderBy("doc_id", "pos")
            .toPandas()["conf_mtx"]
            .tolist()
        )
        b = (
            metrics.compare_events_sql(df, wf=wf)
            .orderBy("doc_id", "pos")
            .toPandas()["conf_mtx"]
            .tolist()
        )
        assert a == b, wf
