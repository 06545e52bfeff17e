"""Isolation Forest detector (reference:
analysis/detectors/unsupervised_learning_anomaly_detection.py:5-46,
analysis/run_anomaly_analysis_pipeline.py:73-79).

The reference fits sklearn's IsolationForest on the whole pandas frame.
sklearn is not a dependency of this engine, so the iTree ensemble is
implemented here in numpy with the same algorithm and scoring convention:

  * each tree trains on <= max_samples rows drawn without replacement
    (sklearn draws per-tree from the full set; here the global fit sample
    IS <= max_samples, so every tree sees all of it — identical when
    n <= max_samples, which is the reference's own configuration at its
    data scale);
  * splits pick a uniformly random non-constant feature and a uniform
    threshold in that feature's node range; growth stops at depth
    ceil(log2(psi)) or single/constant nodes (Liu et al. 2008);
  * path length gets the c(n) unsuccessful-BST correction at leaves;
  * anomaly score s(x) = 2^(−E[h(x)] / c(psi)); the exported
    `iforest_score` is s(x) − 0.5, matching the reference's
    `-decision_function` with contamination="auto" (offset_ = −0.5):
    higher = more anomalous.

Spark shape (100 TB-safe):
  1. FIT on the driver over a deterministic sample: top-max_samples rows
     by xxhash64(features, seed) — a distributed TakeOrdered, one scan,
     no full collect;
  2. the fitted forest is a handful of flat numpy arrays (node-table
     encoding), broadcast once;
  3. SCORING is an Arrow-batched pandas UDF: all trees traverse the whole
     batch level-by-level with vectorized gathers — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EULER = 0.5772156649015329


def average_path_length(n) -> np.ndarray:
    """c(n): expected path length of an unsuccessful BST search — the
    normalizer/leaf correction from Liu et al. (2008), eq. 1 (same form
    sklearn uses). Vectorized over n."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    out[n == 2] = 1.0
    big = n > 2
    nb = n[big]
    out[big] = 2.0 * (np.log(nb - 1.0) + _EULER) - 2.0 * (nb - 1.0) / nb
    return out


@dataclass(frozen=True)
class IForestModel:
    """Flat node-table forest: concatenated per-node arrays + per-tree
    root offsets. `adj[i]` is precomputed depth + c(leaf_size) for leaves
    (0 for internal nodes); `psi` is the per-tree sample size used in the
    2^(−E/c(psi)) normalization."""

    feat: np.ndarray   # int32, −1 for leaves
    thr: np.ndarray    # float64
    left: np.ndarray   # int32 absolute node ids
    right: np.ndarray  # int32
    adj: np.ndarray    # float64
    roots: np.ndarray  # int32, one per tree
    psi: int
    n_features: int

    @property
    def n_trees(self) -> int:
        return len(self.roots)


def _build_tree(X: np.ndarray, rng: np.random.Generator, max_depth: int,
                base: int, feat, thr, left, right, adj) -> int:
    """Grow one iTree over X, appending nodes to the flat arrays starting
    at absolute id `base`. Returns the number of nodes appended."""
    # stack entries: (row-index array, depth, parent absolute id, is_right)
    stack = [(np.arange(len(X)), 0, -1, False)]
    count = 0
    while stack:
        idx, depth, parent, is_right = stack.pop()
        node = base + count
        count += 1
        sub = X[idx]
        split_feat = -1
        if depth < max_depth and len(idx) > 1:
            lo = sub.min(axis=0)
            hi = sub.max(axis=0)
            usable = np.flatnonzero(hi > lo)
            if len(usable) > 0:
                split_feat = int(usable[rng.integers(len(usable))])
        if split_feat < 0:
            feat.append(-1)
            thr.append(0.0)
            left.append(-1)
            right.append(-1)
            adj.append(depth + float(average_path_length(len(idx))))
        else:
            t = rng.uniform(lo[split_feat], hi[split_feat])
            go_left = sub[:, split_feat] < t
            feat.append(split_feat)
            thr.append(float(t))
            left.append(-1)   # patched when the child is appended
            right.append(-1)
            adj.append(0.0)
            # push right first so left is materialized (and numbered) first
            stack.append((idx[~go_left], depth + 1, node, True))
            stack.append((idx[go_left], depth + 1, node, False))
        if parent >= 0:
            arr = right if is_right else left
            arr[parent] = node
    return count


def fit_iforest_arrays(
    X: np.ndarray, n_estimators: int = 300, seed: int = 42
) -> IForestModel:
    """Fit the forest on an in-memory sample (rows = the fit sample; each
    tree sees all of it, shuffled split randomness per tree)."""
    psi = len(X)
    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    adj: list[float] = []
    roots = []
    rng = np.random.default_rng(seed)
    for _ in range(n_estimators):
        roots.append(len(feat))
        _build_tree(X, rng, max_depth, len(feat), feat, thr, left, right, adj)
    return IForestModel(
        feat=np.asarray(feat, dtype=np.int32),
        thr=np.asarray(thr, dtype=np.float64),
        left=np.asarray(left, dtype=np.int32),
        right=np.asarray(right, dtype=np.int32),
        adj=np.asarray(adj, dtype=np.float64),
        roots=np.asarray(roots, dtype=np.int32),
        psi=psi,
        n_features=X.shape[1],
    )


def score_arrays(model: IForestModel, X: np.ndarray) -> np.ndarray:
    """Vectorized forest scoring: every tree walks the whole batch
    level-by-level. Returns s(x) − 0.5 (−decision_function convention)."""
    n = len(X)
    total = np.zeros(n, dtype=np.float64)
    rows = np.arange(n)
    for root in model.roots:
        cur = np.full(n, root, dtype=np.int64)
        while True:
            f = model.feat[cur]
            active = f >= 0
            if not active.any():
                break
            acur = cur[active]
            af = f[active]
            go_left = X[rows[active], af] < model.thr[acur]
            cur[active] = np.where(
                go_left, model.left[acur], model.right[acur]
            )
        total += model.adj[cur]
    c_psi = float(average_path_length(model.psi))
    if c_psi <= 0:
        c_psi = 1.0
    s = np.power(2.0, -(total / model.n_trees) / c_psi)
    return s - 0.5


def fit_iforest(
    df: DataFrame,
    cols: list[str],
    n_estimators: int = 300,
    max_samples: int = 100_000,
    seed: int = 42,
) -> IForestModel:
    """Fit on a deterministic <= max_samples driver sample: the
    max_samples smallest xxhash64(features, seed) rows — one distributed
    TakeOrdered scan, stable under any partitioning. Nulls are 0-filled
    (the reference's preprocessing fillna)."""
    filled = df.na.fill({c: 0.0 for c in cols})
    sample = (
        filled.select(*[F.col(c).cast("double").alias(c) for c in cols])
        .withColumn("__h__", F.xxhash64(*cols, F.lit(seed)))
        .orderBy("__h__")
        .limit(max_samples)
        .drop("__h__")
        .toPandas()
    )
    X = sample.to_numpy(dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot fit an isolation forest on an empty frame")
    return fit_iforest_arrays(X, n_estimators=n_estimators, seed=seed)


def score_iforest(
    df: DataFrame,
    cols: list[str],
    model: IForestModel,
    out_col: str = "iforest_score",
) -> DataFrame:
    """Append iforest_score via one broadcast + one Arrow-batched UDF."""
    spark = df.sparkSession
    b_model = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def _score(*series: pd.Series) -> pd.Series:
        X = np.column_stack(
            [s.to_numpy(dtype=np.float64, na_value=0.0) for s in series]
        )
        return pd.Series(score_arrays(b_model.value, X))

    filled = df.na.fill({c: 0.0 for c in cols})
    return filled.withColumn(out_col, _score(*[F.col(c) for c in cols]))
