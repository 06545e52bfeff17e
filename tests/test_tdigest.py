"""t-digest sketch: exact-mode Hazen parity, compressed-mode accuracy
bounds, merge associativity, and the no-value-shuffle partial path."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.tdigest import (
    _compress,
    _quantile,
    merge_digests_py,
    tdigest_partition_sketches,
    tdigest_quantiles,
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


def test_exact_mode_is_hazen():
    rng = np.random.default_rng(7)
    vals = rng.integers(1, 5000, size=800).astype(float)
    m, w = _compress(vals.copy(), np.ones(vals.size), delta=8192)
    assert m.size == vals.size  # no compression below delta
    for q in (0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 0.999):
        est = _quantile(m, w, vals.min(), vals.max(), q)
        assert est == pytest.approx(hazen(vals, q), abs=1e-9)


def test_compressed_accuracy_bounds():
    # lognormal — heavy right tail, the file-length regime the engine
    # profiles; rank error of the estimate must stay small, tighter at
    # the tails (the t-digest selling point vs uniform summaries)
    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(5, 1.5, size=200_000))
    m, w = _compress(vals.copy(), np.ones(vals.size), delta=500)
    assert m.size < 1200  # ~2*delta bound
    assert w.sum() == pytest.approx(vals.size)
    s = np.sort(vals)
    for q, tol in ((0.5, 0.01), (0.95, 0.005), (0.99, 0.002), (0.999, 0.001)):
        est = _quantile(m, w, vals.min(), vals.max(), q)
        rank = np.searchsorted(s, est) / s.size
        assert abs(rank - q) < tol, (q, rank)


def test_compression_deterministic_and_mass_preserving():
    rng = np.random.default_rng(3)
    vals = rng.exponential(100, size=50_000)
    a = _compress(vals.copy(), np.ones(vals.size), delta=300)
    b = _compress(vals.copy(), np.ones(vals.size), delta=300)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    # weighted mean of centroids == mean of data (mass conservation)
    assert np.average(a[0], weights=a[1]) == pytest.approx(vals.mean())


def test_merge_matches_whole():
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1, size=60_000)
    parts = np.array_split(vals, 7)
    rows = []
    for p in parts:
        m, w = _compress(p.copy(), np.ones(p.size), delta=400)
        rows.append((m, w, p.size, p.min(), p.max()))
    m, w, n, vmin, vmax = merge_digests_py(rows, delta=400)
    assert n == vals.size and vmin == vals.min() and vmax == vals.max()
    s = np.sort(vals)
    for q in (0.05, 0.5, 0.95, 0.99):
        est = _quantile(m, w, vmin, vmax, q)
        rank = np.searchsorted(s, est) / s.size
        assert abs(rank - q) < 0.015, (q, rank)


def test_spark_sketches_match_pandas(spark):
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "grp": rng.choice(["a", "b", "c"], size=3000),
            "v": rng.integers(0, 10_000, size=3000).astype("float64"),
        }
    )
    pdf.loc[::97, "v"] = np.nan  # null/NaN values are excluded by contract
    df = spark.createDataFrame(
        [(g, None if np.isnan(v) else float(v)) for g, v in pdf.itertuples(index=False)],
        "grp string, v double",
    ).repartition(6)  # multi-partition path
    sk = tdigest_partition_sketches(df, "v", "grp", delta=8192)
    out = (
        tdigest_quantiles(sk, (0.5, 0.99))
        .toPandas()
        .set_index("partition_id")
        .sort_index()
    )
    for g, sub in pdf.dropna(subset=["v"]).groupby("grp"):
        vals = sub["v"].to_numpy()
        row = out.loc[g]
        assert row["n_rows"] == vals.size
        assert row["vmin"] == vals.min() and row["vmax"] == vals.max()
        assert row["p50"] == pytest.approx(hazen(vals, 0.5), abs=1e-9)
        assert row["p99"] == pytest.approx(hazen(vals, 0.99), abs=1e-9)
    # merged corpus row == digest over all values (exact mode)
    allv = pdf["v"].dropna().to_numpy()
    corpus = tdigest_quantiles(sk, (0.5, 0.99), merged=True).toPandas()
    assert corpus["partition_id"].iloc[0] == "__corpus__"
    assert corpus["n_rows"].iloc[0] == allv.size
    assert corpus["p50"].iloc[0] == pytest.approx(hazen(allv, 0.5), abs=1e-9)


def test_partial_rows_bounded(spark):
    # the mapInPandas stage emits digest rows, not value rows: with 6
    # input partitions and 3 groups the pre-shuffle frame holds ≤ 18
    # rows regardless of input size — the "values never shuffle" claim
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "grp": rng.choice(["x", "y", "z"], size=20_000),
            "v": rng.random(20_000),
        }
    )
    df = spark.createDataFrame(pdf).repartition(6)
    sk = tdigest_partition_sketches(df, "v", "grp", delta=200)
    rows = sk.toPandas()
    assert len(rows) == 3
    assert all(len(m) <= 500 for m in rows["means"])
    assert rows["n_rows"].sum() == 20_000


def test_checkpoint_tdigest_across_runs(spark, tmp_path):
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        corpus_tdigest_quantiles,
        write_tdigest_sketches,
    )

    out = str(tmp_path / "td")
    run1 = spark.range(400).select(
        F.lit("p0").alias("part"), F.col("id").cast("double").alias("v")
    )
    run2 = spark.range(400, 1200).select(
        F.concat(F.lit("p"), (F.col("id") % 2 + 1).cast("string"))
        .alias("part"),
        F.col("id").cast("double").alias("v"),
    )
    run3_revalidate_p0 = spark.range(400).select(
        F.lit("p0").alias("part"), (F.col("id") + 10_000).cast("double").alias("v")
    )
    write_tdigest_sketches(run1, F.col("v"), "part", out, run_id="r1")
    write_tdigest_sketches(run2, F.col("v"), "part", out, run_id="r2")
    write_tdigest_sketches(run3_revalidate_p0, F.col("v"), "part", out,
                           run_id="r3")

    got = corpus_tdigest_quantiles(spark, out, quantiles=(0.5, 0.99)).collect()[0]
    vs = np.sort(np.concatenate(
        [np.arange(400, 1200), np.arange(10_000, 10_400)]
    ).astype(float))
    assert got["n_rows"] == 1200
    assert got["vmin"] == 400.0 and got["vmax"] == 10_399.0
    assert got["p50"] == pytest.approx(hazen(vs, 0.5), abs=1e-9)
    assert got["p99"] == pytest.approx(hazen(vs, 0.99), abs=1e-9)
