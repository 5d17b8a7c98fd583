"""Test-only loader for the REAL reference library at /root/reference.

The reference imports matplotlib/scipy/statsmodels/pmdarima/tensorflow/
sklearn at module scope; none are in this image. We stub just enough for the
modules to import — the stubs are never exercised by the deterministic
functions we use as oracles (scipy.stats.norm.ppf is backed by stdlib
NormalDist, exact to double precision; pmdarima.auto_arima is patched per
test to the engine's own forecaster so the correction-loop logic can be
compared like-for-like).

This executes reference code as a parity oracle — nothing is copied from it.
"""

from __future__ import annotations

import sys
import types
from statistics import NormalDist


def _stub(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    m = sys.modules.get(name) or types.ModuleType(name)
    if getattr(m, "__spec__", None) is None:
        # pyspark.testing probes find_spec(); a None __spec__ raises
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_loaded = {}


def load_reference():
    """Import and return the reference modules (cached)."""
    if _loaded:
        return _loaded

    mpl = _stub("matplotlib")
    mpl.pyplot = _stub("matplotlib.pyplot")

    class _Norm:
        @staticmethod
        def ppf(q):
            return NormalDist().inv_cdf(q)

    sp = _stub("scipy")
    sp.stats = _stub("scipy.stats", norm=_Norm())

    _stub("pmdarima", auto_arima=None)

    tf = _stub("tensorflow")
    tf.keras = _stub("tensorflow.keras")
    _stub("tensorflow.keras.models", Sequential=object)
    _stub("tensorflow.keras.layers", Dense=object, LSTM=object, Bidirectional=object)
    sk = _stub("sklearn")
    sk.preprocessing = _stub("sklearn.preprocessing", StandardScaler=object)
    _stub("statsmodels")
    sys.modules["statsmodels"].api = _stub(
        "statsmodels.api", tsa=types.SimpleNamespace(SARIMAX=None)
    )

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from pyhydroqc import (  # noqa: F401
            anomaly_utilities,
            arima_correct,
            calibration,
            rules_detect,
        )

    _loaded.update(
        anomaly_utilities=anomaly_utilities,
        rules_detect=rules_detect,
        calibration=calibration,
        arima_correct=arima_correct,
    )
    return _loaded
