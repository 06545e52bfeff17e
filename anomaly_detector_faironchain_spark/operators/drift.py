"""Distribution-drift scoring: PSI + two-sample KS from shared histograms.

Takes the validation role the reference gave to IsolationForest
(reference: analysis/detectors/unsupervised_learning_anomaly_detection.py)
but as pure aggregations: ONE histogram pass per column (groupBy bucket →
count, map-side combined, constant-size output of ``bins`` rows per
partition), then PSI and KS computed on the tiny histogram table. At
100 TB the raw data is touched once; everything downstream is O(bins).

PSI  = Σ (p_i - q_i) · ln(p_i / q_i)      (with epsilon smoothing)
KS   = max_i |CDF_cur(i) - CDF_ref(i)|    (histogram-approximated)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
    group_col: str | None = None,
) -> DataFrame:
    """Equi-width histogram: (group_id?, bucket, cnt). Values are clamped
    into [0, bins-1] so out-of-range rows land in the edge buckets (they
    count as distribution mass, not errors — range checks are separate).
    """
    width = (hi - lo) / bins
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(bins - 1),
    ).cast("int")
    keys = [bucket.alias("bucket")]
    if group_col:
        keys.insert(0, F.col(group_col).cast("string").alias("group_id"))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def categorical_histogram(
    df: DataFrame, col: str, group_col: str | None = None
) -> DataFrame:
    """Histogram over category values: (group_id?, bucket=value, cnt)."""
    keys = [F.col(col).cast("string").alias("bucket")]
    if group_col:
        keys.insert(0, F.col(group_col).cast("string").alias("group_id"))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _normalized_join(cur: DataFrame, ref: DataFrame, by_group: bool) -> DataFrame:
    """Full-outer join of the two histograms with smoothed probabilities."""
    join_keys = (["group_id"] if by_group else []) + ["bucket"]
    # single-group windows run over tiny histogram frames only; their
    # WindowExec "No Partition Defined" warning is silenced session-wide
    # (session.py _silence_window_warning — a lit(0) key does not work,
    # Catalyst constant-folds it away)
    cw = (Window.partitionBy("group_id") if by_group
          else Window.partitionBy())
    cur_p = cur.withColumn("p_raw", F.col("cnt") / F.sum("cnt").over(cw)).drop("cnt")
    ref_p = ref.withColumnRenamed("cnt", "rcnt")
    rw = (Window.partitionBy("group_id") if by_group
          else Window.partitionBy())
    ref_p = ref_p.withColumn("q_raw", F.col("rcnt") / F.sum("rcnt").over(rw)).drop(
        "rcnt"
    )
    j = cur_p.join(ref_p, join_keys, "full_outer")
    return j.select(
        *join_keys,
        F.coalesce(F.col("p_raw"), F.lit(0.0)).alias("p0"),
        F.coalesce(F.col("q_raw"), F.lit(0.0)).alias("q0"),
    ).select(
        *join_keys,
        (F.col("p0") + F.lit(EPS)).alias("p"),
        (F.col("q0") + F.lit(EPS)).alias("q"),
    )


def psi(cur: DataFrame, ref: DataFrame, by_group: bool = False) -> DataFrame:
    """PSI per group (or one global row): (group_id?, psi double)."""
    j = _normalized_join(cur, ref, by_group)
    keys = ["group_id"] if by_group else []
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    if keys:
        return j.groupBy(*keys).agg(F.sum(term).alias("psi"))
    return j.agg(F.sum(term).alias("psi"))


def ks(cur: DataFrame, ref: DataFrame, by_group: bool = False) -> DataFrame:
    """Two-sample KS statistic from histograms: max |CDF diff| per group.

    The cumulative window runs over the histogram table (bins·groups rows)
    — never over raw data — so the orderBy is cheap at any input scale.
    """
    j = _normalized_join(cur, ref, by_group)
    keys = ["group_id"] if by_group else []
    w = (
        Window.partitionBy(*keys).orderBy("bucket")
        if keys
        else Window.partitionBy().orderBy("bucket")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = j.select(
        *keys,
        F.abs(F.sum("p").over(w) - F.sum("q").over(w)).alias("cdf_diff"),
    )
    if keys:
        return cdf.groupBy(*keys).agg(F.max("cdf_diff").alias("ks"))
    return cdf.agg(F.max("cdf_diff").alias("ks"))


def benford_mad(
    df: DataFrame,
    col: str,
    scale: int = 6,
    partition_col: str | None = None,
) -> DataFrame:
    """Benford first-digit conformity per partition: (partition_id,
    mad double, n long) — mad is Nigrini's mean-absolute-deviation
    statistic over digits 1..9, n the number of rows carrying a first
    significant digit.

    Digit extraction is positional string parsing, not float log10: the
    value is cast through decimal(38, scale) — try_cast, so magnitudes
    beyond 10^(38-scale) become null and are skipped rather than aborting
    under ANSI mode — and the first [1-9] char of the decimal rendering
    is the digit. Exact for decimals; identical in any ANSI-SQL oracle
    (no scientific-notation or log-of-power-of-ten edge cases). Zeros and
    nulls have no first digit and are skipped.

    One map-side-combined groupBy to <= 9 rows per partition; digits
    absent from a partition enter the MAD as |0 - log10(1+1/d)| via a
    broadcast 9-row grid. Nothing downstream of the first agg scales
    with input size.
    """
    part = (
        F.coalesce(F.col(partition_col).cast("string"), F.lit("__null__"))
        if partition_col
        else F.lit("__whole_table__")
    )
    digit = F.regexp_extract(
        F.expr(f"try_cast(abs({col}) as decimal(38,{scale}))").cast("string"),
        "[1-9]",
        0,
    )
    counts = (
        df.select(part.alias("partition_id"), digit.alias("d"))
        .filter(F.col("d") != "")
        .groupBy("partition_id", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(str(d), float(__import__("math").log10(1.0 + 1.0 / d)))
         for d in range(1, 10)],
        "d string, p_exp double",
    )
    totals = counts.groupBy("partition_id").agg(
        F.sum("cnt").alias("__n__")
    )
    grid = totals.crossJoin(F.broadcast(expected))
    obs = grid.join(counts, ["partition_id", "d"], "left").select(
        "partition_id",
        "__n__",
        "p_exp",
        (F.coalesce(F.col("cnt"), F.lit(0)) / F.col("__n__")).alias("p_obs"),
    )
    return obs.groupBy("partition_id").agg(
        F.avg(F.abs(F.col("p_obs") - F.col("p_exp"))).alias("mad"),
        F.first("__n__").alias("n"),
    )
