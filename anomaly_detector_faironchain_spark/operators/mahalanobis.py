"""Mahalanobis distance at scale (reference:
analysis/detectors/statistical_anomaly_detection.py:60-103, which looped
per-row in Python over a pandas frame).

Spark shape:
  1. ONE aggregation pass computes all k means + k·(k+1)/2 sample
     covariances (F.covar_samp) — fused by Catalyst into a single
     hash-aggregate over the data;
  2. the k×k matrix is inverted on the DRIVER (k is small — 9 in the
     reference) with numpy; zero-variance columns are dropped first
     (reference :74-78);
  3. distances are computed by a VECTORIZED pandas UDF — (X−μ) @ Σ⁻¹
     matmul per Arrow batch, no per-row Python (BASELINE.json input_hint
     hard requirement).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mean_and_cov(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """One fused pass: means + sample covariance matrix (ddof=1)."""
    aggs = [F.avg(c).alias(f"m__{c}") for c in cols]
    for i, ci in enumerate(cols):
        for j, cj in enumerate(cols):
            if j >= i:
                aggs.append(F.covar_samp(ci, cj).alias(f"c__{i}__{j}"))
    row = df.agg(*aggs).collect()[0]
    k = len(cols)
    mu = np.array([float(row[f"m__{c}"] or 0.0) for c in cols])
    cov = np.zeros((k, k))
    for i in range(k):
        for j in range(k):
            v = row[f"c__{min(i, j)}__{max(i, j)}"]
            cov[i, j] = float(v) if v is not None else 0.0
    return mu, cov


def drop_zero_variance(
    cols: list[str], mu: np.ndarray, cov: np.ndarray, eps: float = 1e-12
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Drop columns with ~zero variance before inversion (reference
    statistical_anomaly_detection.py:74-78 used nunique<=1)."""
    keep = [i for i in range(len(cols)) if cov[i, i] > eps]
    idx = np.ix_(keep, keep)
    return [cols[i] for i in keep], mu[keep], cov[idx]


def mahalanobis(
    df: DataFrame, cols: list[str], out_col: str = "mahalanobis_distance"
) -> DataFrame:
    """Append the Mahalanobis distance over `cols` (nulls treated as 0,
    mirroring the reference's fillna(0) preprocessing)."""
    filled = df.na.fill({c: 0.0 for c in cols})
    mu, cov = mean_and_cov(filled, cols)
    use_cols, mu2, cov2 = drop_zero_variance(cols, mu, cov)
    # Pseudo-inverse, not inverse: the reference's own 9-feature set is
    # rank-deficient BY CONSTRUCTION (log_degree_ratio is exactly
    # in_degree_log − out_degree_log, same for the amount ratio), so its
    # scipy.linalg.inv output is numerical noise on a singular matrix.
    # pinv computes the well-defined Mahalanobis distance in the feature
    # subspace and equals inv() whenever the matrix is well-conditioned.
    inv = np.linalg.pinv(cov2, hermitian=True)
    spark = df.sparkSession
    b_mu = spark.sparkContext.broadcast(mu2)
    b_inv = spark.sparkContext.broadcast(inv)
    use = list(use_cols)

    @F.pandas_udf(T.DoubleType())
    def dist(*series: pd.Series) -> pd.Series:
        x = np.column_stack([s.to_numpy(dtype=np.float64) for s in series])
        z = x - b_mu.value
        # row-wise sqrt(z Σ⁻¹ zᵀ) as one matmul per Arrow batch
        d2 = np.einsum("ij,jk,ik->i", z, b_inv.value, z)
        return pd.Series(np.sqrt(np.maximum(d2, 0.0)))

    return filled.withColumn(out_col, dist(*[F.col(c) for c in use]))
