"""Misra-Gries heavy hitters: exact mode, error-bound guarantee on
skewed data, presence guarantee, and the bounded pre-shuffle frame."""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.heavyhitters import (
    _mg_update,
    heavy_hitters,
    mg_partition_sketches,
)


def test_exact_mode_matches_groupby(spark):
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 50, size=8000)
    df = spark.createDataFrame(
        [(str(k),) for k in keys], "user string"
    ).repartition(6)
    got = heavy_hitters(df, "user", k=1024, top_n=10).toPandas()
    assert (got["err_bound"] == 0).all()
    exact = (
        pd.Series(keys.astype(str))
        .value_counts()
        .rename_axis("key")
        .reset_index(name="cnt")
        .sort_values(["cnt", "key"], ascending=[False, True])
        .head(10)
    )
    assert list(got["key"]) == list(exact["key"])
    assert list(got["est_count"]) == list(exact["cnt"])


def test_skewed_guarantees(spark):
    # zipf-ish: a few mega-keys over a huge tail, k far below #distinct
    rng = np.random.default_rng(7)
    tail = rng.integers(1000, 40_000, size=30_000)
    heavies = np.repeat(np.arange(5), 4000)  # 5 keys x 4000
    keys = np.concatenate([tail, heavies]).astype(str)
    df = spark.createDataFrame([(k,) for k in keys], "user string").repartition(8)
    got = heavy_hitters(df, "user", k=64, top_n=10).toPandas()
    exact = pd.Series(keys).value_counts()
    # every true heavy hitter (freq > n/(k+1)) must be present
    n = len(keys)
    for key, cnt in exact.items():
        if cnt > n / 65:
            assert key in set(got["key"]), key
    # undercount bounded by the reported decrement mass
    err = int(got["err_bound"].iloc[0])
    for _, r in got.iterrows():
        true = int(exact.get(r["key"], 0))
        assert r["est_count"] <= true <= r["est_count"] + err


def test_presheffle_frame_bounded(spark):
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 100_000, size=50_000).astype(str)
    df = spark.createDataFrame([(k,) for k in keys], "user string").repartition(4)
    sk = mg_partition_sketches(df, "user", k=32).toPandas()
    # ≤ (k counters + 1 decrement row) per task — never the raw rows
    assert len(sk) <= 4 * 33
    assert sk.loc[sk["key"].isna(), "dec"].sum() > 0  # decrements happened


def test_mg_update_deterministic():
    s = pd.Series({"a": 10, "b": 8, "c": 5, "d": 2, "e": 1})
    c1, d1 = _mg_update({}, 0, s, 3)
    c2, d2 = _mg_update({}, 0, s, 3)
    assert c1 == c2 and d1 == d2
    # cut = 4th largest (2): a=8, b=6, c=3 remain; decrement mass 2
    assert c1 == {"a": 8, "b": 6, "c": 3} and d1 == 2


def test_checkpoint_heavyhitters_across_runs(spark, tmp_path):
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        corpus_heavy_hitters,
        write_heavyhitter_sketches,
    )

    out = str(tmp_path / "hh")
    r1 = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, "user string")
    r2 = spark.createDataFrame([("b",)] * 25 + [("c",)] * 5, "user string")
    write_heavyhitter_sketches(r1, "user", out, run_id="r1", k=64)
    write_heavyhitter_sketches(r2, "user", out, run_id="r2", k=64)
    got = corpus_heavy_hitters(spark, out, k=64, top_n=3).toPandas()
    # counts ACCUMULATE across runs (b: 10 + 25 = 35), exact mode
    assert list(got["key"]) == ["b", "a", "c"]
    assert list(got["est_count"]) == [35, 30, 5]
    assert (got["err_bound"] == 0).all()
