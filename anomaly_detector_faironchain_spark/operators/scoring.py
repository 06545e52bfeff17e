"""Scoring kernels: quantile thresholds, robust z / MAD, Hazen percentile,
the boolean rule engine, and score combination.

Re-expresses the reference's detector math as column expressions:
  * quantile thresholds          — analysis/detectors/rule_based_anomaly_detection.py:4-27
  * rule flags + descriptions    — rule_based_anomaly_detection.py:30-259 (H1-H6 pattern)
  * z-score preprocessing        — statistical_anomaly_detection.py:18-57
  * Hazen average-rank percentile— analysis/scoring/scoring.py:4-21,52-79
  * score combination            — scoring.py:24-105
plus the north-rule generalization: robust z via median/MAD instead of
mean/std, so a single mega-partition can't drag the threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_thresholds(
    df: DataFrame, cols: list[str], q: float = 0.99, exclude_zeros: bool = True
) -> dict[str, float]:
    """One-pass exact quantile thresholds (reference excludes zeros for
    heavy-tailed columns: rule_based_anomaly_detection.py:10-20).

    Exact `percentile` matches pandas/DuckDB linear interpolation; swap to
    percentile_approx (KLL sketch) for the 100 TB path — callers choose
    via `approx=True` in threshold_exprs().
    """
    aggs = []
    for c in cols:
        src = f"`{c}`"
        flt = f" FILTER (WHERE {src} > 0)" if exclude_zeros else ""
        aggs.append(F.expr(f"percentile({src}, {q}){flt}").alias(c))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[c] if row[c] is not None else 0.0) for c in cols}


def robust_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Median + MAD per column, two fused aggregation passes (medians,
    then MAD of residuals). Returns {col: (median, mad)}."""
    med_row = df.agg(
        *[F.expr(f"percentile(`{c}`, 0.5)").alias(c) for c in cols]
    ).collect()[0]
    medians = {c: float(med_row[c]) if med_row[c] is not None else 0.0 for c in cols}
    mad_row = df.agg(
        *[
            F.expr(f"percentile(abs(`{c}` - {medians[c]}), 0.5)").alias(c)
            for c in cols
        ]
    ).collect()[0]
    return {
        c: (medians[c], float(mad_row[c]) if mad_row[c] is not None else 0.0)
        for c in cols
    }


def robust_z(col: Column, median: float, mad: float) -> Column:
    """0.6745·(x-med)/MAD — the MAD-consistent robust z-score."""
    denom = mad if mad > 0 else 1.0
    return F.lit(0.6745) * (col - F.lit(median)) / F.lit(denom)


def zscore_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Classic mean + sample std (ddof=1, matching pandas
    statistical_anomaly_detection.py:6-15) in one fused pass."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"mean__{c}"))
        aggs.append(F.stddev_samp(c).alias(f"std__{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        m = row[f"mean__{c}"] or 0.0
        s = row[f"std__{c}"]
        out[c] = (float(m), float(s) if s not in (None, 0.0) else 1.0)
    return out


def hazen_percentile(
    df: DataFrame, col: str, out_col: str, ascending: bool = True
) -> DataFrame:
    """Hazen percentile of `col`: (avg_rank − 0.5) / n × 100.

    pandas `rank(method='average')` equals rank() + (ties−1)/2 where
    rank() is the competition rank; both are computed with window
    functions over the value order. The global (un-partitioned) window is
    intentional — it matches the reference's whole-table percentile
    (scoring.py:16-21) — and is the one operator documented as
    single-reducer; at scale it is applied to the (small) verdict/score
    table, never to raw rows. A fully parallel two-pass variant is
    hazen_percentile_agg() below.
    """
    order = F.col(col).asc() if ascending else F.col(col).desc()
    w_rank = Window.orderBy(order)
    w_ties = Window.partitionBy(col)
    n = df.count()
    avg_rank = F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_ties) - 1) / 2.0
    return df.withColumn(
        out_col,
        ((avg_rank - 0.5) / F.lit(float(n)) * 100.0).cast("float"),
    )


def hazen_percentile_agg(
    df: DataFrame, col: str, out_col: str, ascending: bool = True
) -> DataFrame:
    """Shuffle-parallel Hazen percentile: aggregate to distinct values,
    cumulative-count over the (small) distinct-value table, broadcast-join
    back. No global sort of the input — the only ordered pass runs over
    |distinct values| rows."""
    n = df.count()
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("__c__"))
    order = F.col(col).asc() if ascending else F.col(col).desc()
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.select(
        F.col(col),
        (F.coalesce(F.sum("__c__").over(w), F.lit(0)) + (F.col("__c__") + 1) / 2.0)
        .alias("__avg_rank__"),
    )
    return (
        df.join(F.broadcast(ranked), col, "left")
        .withColumn(
            out_col,
            ((F.col("__avg_rank__") - 0.5) / F.lit(float(n)) * 100.0).cast("float"),
        )
        .drop("__avg_rank__")
    )


@dataclass(frozen=True)
class Rule:
    """flag column + human description, the reference's H1-H6 shape."""

    name: str
    condition: Column
    description: str


def apply_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Adds {name}_flag (0/1 int) and {name}_description per rule —
    vectorized `when()` replaces the reference's per-row `.apply` of
    description lambdas (rule_based_anomaly_detection.py:60-64)."""
    for r in rules:
        flag = F.when(r.condition, 1).otherwise(0)
        df = df.withColumn(f"{r.name}_flag", flag.cast("int")).withColumn(
            f"{r.name}_description",
            F.when(F.col(f"{r.name}_flag") == 1, F.lit(r.description)).otherwise(
                F.lit("")
            ),
        )
    return df


def combine_rule_score(
    df: DataFrame,
    any_of: list[str],
    additive: list[str],
    out_col: str = "rule_based_score_0_100",
) -> DataFrame:
    """reference scoring.py:24-48: raw = any(H1..H4) + H5 + H6 ∈ [0,3],
    scaled ×100/3, rounded to 2dp, float32."""
    any_expr = F.greatest(*[F.col(f"{f}_flag") for f in any_of])
    raw = any_expr
    for f in additive:
        raw = raw + F.col(f"{f}_flag")
    return df.withColumn(
        out_col, F.round(raw * (100.0 / 3.0), 2).cast("float")
    )


def final_score(
    df: DataFrame, score_cols: list[str], out_col: str = "final_score_0_100"
) -> DataFrame:
    """Mean of detector scores (reference scoring.py:96-98)."""
    s = F.col(score_cols[0])
    for c in score_cols[1:]:
        s = s + F.col(c)
    return df.withColumn(out_col, (s / len(score_cols)).cast("float"))


def top_percent_label(
    df: DataFrame, score_col: str, out_col: str = "top_percent"
) -> DataFrame:
    """Descending average-rank / n × 100 as a '%.2f%%' display string
    (reference scoring.py:100-104)."""
    n = df.count()
    w_rank = Window.orderBy(F.col(score_col).desc())
    w_ties = Window.partitionBy(score_col)
    avg_rank = F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_ties) - 1) / 2.0
    pct = F.round(avg_rank / F.lit(float(n)) * 100.0, 2)
    return df.withColumn(out_col, F.format_string("%.2f%%", pct))
