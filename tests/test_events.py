"""Parity: event machinery vs reference anomaly_utilities — property-tested
on random boolean series (integer ops, exact match required)."""

import warnings

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyhydroqc_spark.operators import events
from tests.reference_oracle import load_reference

REF = load_reference()


def _to_df(spark, flags_by_doc):
    rows = []
    for d, flags in flags_by_doc.items():
        for i, f in enumerate(flags):
            rows.append((d, i, bool(f)))
    return spark.createDataFrame(rows, "doc_id string, pos int, flag boolean")


@pytest.mark.parametrize("wf", [0, 1, 3])
def test_anomaly_events_parity(spark, wf):
    rng = np.random.default_rng(7)
    flags_by_doc = {
        f"d{k}": (rng.random(n) < p).astype(int)
        for k, (n, p) in enumerate([(50, 0.1), (80, 0.3), (40, 0.0), (30, 0.9), (5, 0.5)])
    }
    df = _to_df(spark, flags_by_doc)
    out = (
        events.anomaly_events(df, "flag", wf=wf)
        .orderBy("doc_id", "pos")
        .select("doc_id", "event_id")
        .toPandas()
    )
    for d, flags in flags_by_doc.items():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            exp = REF["anomaly_utilities"].anomaly_events(pd.Series(flags), wf=wf, sf=1.0)
        got = out[out.doc_id == d]["event_id"].tolist()
        if 2 * wf > len(flags):
            # reference emits 2*wf zeros here (longer than its input — a
            # latent length bug); the engine keeps 1 row per input row,
            # all zeros, which is the only sane reading of the semantics
            assert set(exp) == {0} and got == [0] * len(flags), (d, wf)
        else:
            assert got == list(exp), (d, wf)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=60), st.integers(0, 4))
def test_anomaly_events_hypothesis(spark, flags, wf):
    df = _to_df(spark, {"x": [int(f) for f in flags]})
    got = (
        events.anomaly_events(df, "flag", wf=wf)
        .orderBy("pos")
        .select("event_id")
        .toPandas()["event_id"]
        .tolist()
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = REF["anomaly_utilities"].anomaly_events(pd.Series([int(f) for f in flags]), wf=wf, sf=1.0)
    if 2 * wf > len(flags):
        assert set(exp) == {0} and got == [0] * len(flags)
    else:
        assert got == list(exp)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=50))
def test_group_bools_hypothesis(spark, flags):
    df = _to_df(spark, {"x": [int(f) for f in flags]})
    got = (
        events.group_bools(df, "flag", "grp")
        .orderBy("pos")
        .select("grp")
        .toPandas()["grp"]
        .tolist()
    )
    rdf = pd.DataFrame({"flag": [int(f) for f in flags]})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = REF["anomaly_utilities"].group_bools(rdf, "flag", "out")["out"].tolist()
    assert got == exp


def test_run_lengths(spark):
    df = _to_df(spark, {"x": [0, 1, 1, 0, 1, 1, 1]})
    out = events.run_ids(df, "flag", "rid")
    out = events.run_lengths(out, "rid", "rl")
    got = out.orderBy("pos").select("rid", "rl").toPandas()
    assert got["rid"].tolist() == [0, 1, 1, 0, 2, 2, 2]
    assert got[got.rid == 1]["rl"].tolist() == [2, 2]
    assert got[got.rid == 2]["rl"].tolist() == [3, 3, 3]
