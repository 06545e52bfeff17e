"""Hypothesis property tests for the mergeable sketch kernels (pure
Python/numpy surfaces — no Spark session needed): the merge-invariance
and error-bound claims these sketches make are exactly what the
checkpoint layer relies on at scale, so they are pinned against a plain
reference model over arbitrary inputs and arbitrary split points."""
from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detector_faironchain_spark.operators.heavyhitters import (
    _mg_update,
    merge_mg_py,
)
from anomaly_detector_faironchain_spark.operators.tdigest import (
    _compress,
    _quantile,
    merge_digests_py,
)


def hazen(vals: np.ndarray, q: float) -> float:
    v = np.sort(vals)
    h = q * v.size + 0.5
    if h <= 1:
        return float(v[0])
    if h >= v.size:
        return float(v[-1])
    lo = int(np.floor(h))
    return float(v[lo - 1] + (h - lo) * (v[lo] - v[lo - 1]))


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1, max_size=300,
    ),
    split=st.integers(min_value=0, max_value=300),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99]),
)
def test_tdigest_exact_mode_split_invariant(vals, split, q):
    """≤ delta values → (a) any 2-way split merges to the exact Hazen
    quantile, and (b) the merge equals the unsplit digest."""
    arr = np.asarray(vals, dtype=float)
    split = min(split, arr.size)
    parts = [arr[:split], arr[split:]]
    rows = [
        (m, w, p.size, p.min(), p.max())
        for p in parts
        if p.size
        for m, w in [_compress(p.copy(), np.ones(p.size), 512)]
    ]
    m, w, n, vmin, vmax = merge_digests_py(rows, delta=512)
    assert n == arr.size
    est = _quantile(m, w, vmin, vmax, q)
    assert est == np.float64(hazen(arr, q)) or abs(est - hazen(arr, q)) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=1e4, allow_nan=False),
        min_size=2, max_size=2000,
    ),
    delta=st.sampled_from([8, 32, 128]),
)
def test_tdigest_compressed_invariants(vals, delta):
    """Any input, any delta: total mass conserved, weighted mean exact,
    centroid means sorted and inside [min, max], quantiles monotone."""
    arr = np.asarray(vals, dtype=float)
    m, w = _compress(arr.copy(), np.ones(arr.size), delta)
    assert w.sum() == arr.size
    assert abs(np.average(m, weights=w) - arr.mean()) < 1e-6 * max(
        1.0, abs(arr.mean())
    ) + 1e-6
    assert (np.diff(m) >= 0).all()
    assert arr.min() - 1e-9 <= m[0] and m[-1] <= arr.max() + 1e-9
    qs = [
        _quantile(m, w, arr.min(), arr.max(), q)
        for q in (0.1, 0.3, 0.5, 0.7, 0.9)
    ]
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                  max_size=500),
    n_parts=st.integers(min_value=1, max_value=5),
    k=st.sampled_from([4, 8, 64]),
)
def test_mg_bounds_hold_under_any_split(keys, n_parts, k):
    """Any key stream, any task split, any k: (a) est ≤ true ≤ est+err,
    (b) every key with freq > n/(k+1) is present, (c) exact when
    #distinct ≤ k end-to-end."""
    parts = np.array_split(np.asarray(keys), n_parts)
    rows = []
    for p in parts:
        counters, decs = _mg_update(
            {}, 0, pd.Series(p.astype(str)).value_counts(sort=False), k
        )
        rows += [(key, c, 0) for key, c in counters.items()]
        rows.append((None, 0, decs))
    counters, err = merge_mg_py(rows, k)
    true = pd.Series(np.asarray(keys).astype(str)).value_counts()
    n = len(keys)
    for key, est in counters.items():
        assert est <= true[key] <= est + err
    for key, cnt in true.items():
        if cnt > n / (k + 1):
            assert key in counters
    if true.size <= k:
        assert err == 0 and dict(true) == counters
