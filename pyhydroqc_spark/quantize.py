"""Shared float↔token quantizer (FIXTURES.md §F3).

``token = round((value - lo) / (hi - lo) * 65535)``, sentinel ``-1`` for
missing. The fixture generator and the engine share THIS module so the
per-row "token-array equality" invariant (BASELINE.json:input_hint) is
well-posed: any value that round-trips through ``quantize(dequantize(t))``
returns ``t`` exactly.
"""

from __future__ import annotations

import numpy as np

TOKEN_MAX = 65535
SENTINEL = -1


def quantize(values: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """float64 → int32 tokens; NaN → -1. Uses banker's-free round-half-away?
    No: uses numpy round-half-even consistently on both sides, so the
    invariant holds regardless of tie behavior."""
    v = np.asarray(values, dtype=np.float64)
    t = np.rint((v - lo) / (hi - lo) * TOKEN_MAX)
    t = np.where(np.isnan(v), SENTINEL, np.clip(t, 0, TOKEN_MAX))
    return t.astype(np.int32)


def dequantize(tokens: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """int32 tokens → float64; -1 → NaN."""
    t = np.asarray(tokens, dtype=np.float64)
    v = lo + t / TOKEN_MAX * (hi - lo)
    return np.where(t == SENTINEL, np.nan, v)
