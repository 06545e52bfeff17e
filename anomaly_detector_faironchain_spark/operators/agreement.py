"""Detector-agreement evaluation (reference: tests/test_analysis.py:51-119):
pairwise top-q overlap / Jaccard between detector score columns, Spearman
rank correlation, and Cohen's kappa at a top-fraction cut — the
consistency harness the reference runs across its three detectors.

All distributed: top-q sets come from per-column quantile thresholds (one
agg), overlaps from joins, Spearman from F.corr over rank columns, kappa
from a 2x2 confusion count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _flag_top_q(df: DataFrame, col: str, q: float) -> F.Column:
    """Membership in the top-q fraction by value (ties included, matching
    the reference's `score >= quantile(1-q)` binarization
    (tests/test_analysis.py:46-49))."""
    thr = df.agg(F.expr(f"percentile(`{col}`, {1.0 - q})")).collect()[0][0]
    return (F.col(col) >= F.lit(float(thr))).cast("int")


def topq_overlap(df: DataFrame, id_col: str, col_a: str, col_b: str,
                 q: float = 0.01) -> dict:
    """|A∩B|, |A|, |B|, Jaccard for the two detectors' top-q sets."""
    flagged = df.select(
        F.col(id_col).alias("id"),
        _flag_top_q(df, col_a, q).alias("fa"),
        _flag_top_q(df, col_b, q).alias("fb"),
    )
    row = flagged.agg(
        F.sum("fa").alias("na"),
        F.sum("fb").alias("nb"),
        F.sum(F.col("fa") * F.col("fb")).alias("inter"),
    ).collect()[0]
    union = row.na + row.nb - row.inter
    return {
        "n_a": int(row.na), "n_b": int(row.nb), "intersection": int(row.inter),
        "jaccard": (row.inter / union) if union else 0.0,
    }


def spearman(df: DataFrame, col_a: str, col_b: str) -> float:
    """Spearman rho = Pearson correlation of average ranks (pandas
    rank(method='average') parity). Ranks come from the range-partitioned
    distributed_avg_rank kernel — no single-reducer Window.orderBy over
    the score table, so the correlation stays parallel at any row count."""
    from .scoring import distributed_avg_rank

    ranked = distributed_avg_rank(df, col_a, out_col="ra", n_col="__na__")
    ranked = distributed_avg_rank(ranked, col_b, out_col="rb", n_col="__nb__")
    return float(ranked.agg(F.corr("ra", "rb")).collect()[0][0])


def cohens_kappa_top_q(df: DataFrame, col_a: str, col_b: str,
                       q: float = 0.01) -> float:
    """Cohen's kappa of the two binarized top-q flags
    (reference tests/test_analysis.py:106-119)."""
    flagged = df.select(
        _flag_top_q(df, col_a, q).alias("fa"),
        _flag_top_q(df, col_b, q).alias("fb"),
    )
    row = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("fa") * F.col("fb")).alias("tp"),
        F.sum(F.col("fa") * (1 - F.col("fb"))).alias("fp"),
        F.sum((1 - F.col("fa")) * F.col("fb")).alias("fn"),
        F.sum((1 - F.col("fa")) * (1 - F.col("fb"))).alias("tn"),
    ).collect()[0]
    n = row.n
    po = (row.tp + row.tn) / n
    pe = ((row.tp + row.fp) * (row.tp + row.fn)
          + (row.fn + row.tn) * (row.fp + row.tn)) / (n * n)
    return (po - pe) / (1 - pe) if pe != 1 else 1.0
