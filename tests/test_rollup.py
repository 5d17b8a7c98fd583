"""Rollup correctness vs pandas resample oracle; tier-from-tier equivalence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhydroqc_spark.operators import rollup


@pytest.fixture(scope="module")
def fact(spark):
    rng = np.random.default_rng(1)
    rows = []
    for d in ["a", "b"]:
        n = 500
        ts = pd.date_range("2022-01-01 00:07", periods=n, freq="11min")  # off-grid
        vals = rng.normal(10, 2, n)
        rows.append(pd.DataFrame({"doc_id": d, "pos": range(n), "ts": ts, "det_cor": vals}))
    pdf = pd.concat(rows, ignore_index=True)
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("tier,freq", [(900, "15min"), (3600, "1h"), (86400, "1D")])
def test_rollup_matches_resample(fact, tier, freq):
    df, pdf = fact
    got = (
        rollup.rollup_points(df, tier)
        .orderBy("doc_id", "bucket_start")
        .toPandas()
    )
    for d in ["a", "b"]:
        sub = pdf[pdf.doc_id == d].set_index("ts")["det_cor"]
        exp = sub.resample(freq).agg(["count", "sum", "mean", "min", "max"])
        exp = exp[exp["count"] > 0]
        mine = got[got.doc_id == d].set_index("bucket_start")
        assert list(mine.index) == list(exp.index)
        np.testing.assert_allclose(mine["cnt"], exp["count"])
        np.testing.assert_allclose(mine["sum_val"], exp["sum"], atol=1e-9)
        np.testing.assert_allclose(mine["avg_val"], exp["mean"], atol=1e-9)
        np.testing.assert_allclose(mine["min_val"], exp["min"], atol=1e-12)
        np.testing.assert_allclose(mine["max_val"], exp["max"], atol=1e-12)


def test_tier_from_tier_equals_direct(fact):
    df, _ = fact
    tiers = rollup.rollup_all_tiers(df)
    direct_1d = rollup.rollup_points(df, 86400).orderBy("doc_id", "bucket_start").toPandas()
    derived_1d = tiers[86400].orderBy("doc_id", "bucket_start").toPandas()
    np.testing.assert_allclose(derived_1d["cnt"], direct_1d["cnt"])
    np.testing.assert_allclose(derived_1d["sum_val"], direct_1d["sum_val"], atol=1e-9)
    np.testing.assert_allclose(derived_1d["avg_val"], direct_1d["avg_val"], atol=1e-9)
    np.testing.assert_allclose(derived_1d["min_val"], direct_1d["min_val"])
    np.testing.assert_allclose(derived_1d["max_val"], direct_1d["max_val"])


def test_rollup_ignores_nulls(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": ["x"] * 4,
            "pos": range(4),
            "ts": pd.date_range("2022-01-01", periods=4, freq="15min"),
            "det_cor": [1.0, None, 3.0, None],
        }
    )
    got = rollup.rollup_points(spark.createDataFrame(pdf), 3600).toPandas()
    assert got["cnt"].tolist() == [2]
    assert got["avg_val"].tolist() == [2.0]
