"""Sample-first validation with exact escalation on undecidable partitions.

The 100 TB economics of row-level constraint checking: most partitions
are clean, a few are obviously broken, and only a thin band near the
tolerance actually needs an exact count. A deterministic hash sample
(md5-prefix range test — the same engine-portable device as
``operators/training.deterministic_split``) screens every partition in
one cheap pass; a Wilson score interval on the sampled violation rate
then CERTIFIES each (partition, check) as pass (UCB <= tolerance), fail
(LCB > tolerance), or *escalates* it, and only escalated partitions get
the exact full scan — pushed down as a partition-column ``IN`` literal
so the source prunes everything else.

At fraction=0.01 over a 10^12-row table this turns ~20 full-scan checks
into one 1%-scan plus exact scans over the (typically tiny) undecided
band. The screen itself is map-only codegen (md5 + the stacked
violation predicates, no Python); the only shuffle moves one counter
row per (partition, check).

Reference semantics anchor: the reference validates every assertion
exactly over the full frame (etl/test.py:60-128); this operator is the
scale path that produces the SAME verdicts whenever it certifies, and
falls back to the reference's exact count when it cannot.

Determinism contract (for the DuckDB oracle): the sample membership
test is a pure string comparison on ``substr(md5(key),1,4)``; Wilson
bounds use one fixed parenthesization evaluated in IEEE doubles on both
engines; decisions compare those doubles to the tolerance literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import stats
from anomaly_detector_faironchain_spark.plans.spec import TableSpec

# z for a two-sided 99% Wilson interval; a literal (not scipy) so the
# oracle SQL can embed the identical constant.
Z_99 = 2.5758293035489004

SCREEN_COLS = [
    "table", "partition_id", "check_id", "method",
    "n_scanned", "n_violations", "rate_ucb", "rate_lcb", "passed",
]


def _hex_threshold(fraction: float) -> tuple[str, float]:
    """4-hex-digit md5-prefix upper bound for a sampling fraction.

    Returns (threshold_string, effective_fraction): membership is
    ``substr(md5(key),1,4) < threshold``, so the effective fraction is
    exactly buckets/65536 — the value the estimator must use."""
    buckets = int(round(fraction * 65536))
    if not 0 < buckets < 65536:
        raise ValueError(f"fraction {fraction} out of (0, 1) at 16-bit grain")
    return format(buckets, "04x"), buckets / 65536.0


def _wilson(k: Column, n: Column, z: float) -> tuple[Column, Column]:
    """Wilson score interval (lcb, ucb) for k successes in n trials.

    One fixed parenthesization, all doubles — the oracle SQL mirrors it
    token-for-token so both engines run the identical IEEE expression
    tree. n must be > 0 (callers route n=0 to escalation)."""
    kd, nd = k.cast("double"), n.cast("double")
    z2 = F.lit(z * z)
    phat = kd / nd
    denom = F.lit(1.0) + z2 / nd
    center = (phat + z2 / (F.lit(2.0) * nd)) / denom
    half = (
        F.lit(z)
        * F.sqrt(phat * (F.lit(1.0) - phat) / nd + z2 / (F.lit(4.0) * nd * nd))
        / denom
    )
    return center - half, center + half


def sampled_row_screen(
    df: DataFrame,
    spec: TableSpec,
    *,
    sample_key: str,
    fraction: float = 0.01,
    tolerance: float = 0.0,
    z: float = Z_99,
) -> DataFrame:
    """Screen every row-level constraint of ``spec`` on a deterministic
    hash sample; escalate only undecidable partitions to exact scans.

    Output: one row per (partition_id, check_id) with
      method       'sample' (certified from the sample) | 'exact'
      n_scanned    rows the verdict was computed from
      n_violations violations among those rows
      rate_ucb/lcb Wilson bounds scaled back to full-population rate
                   (NULL for exact rows — the exact rate is k/n)
      passed       the verdict

    Scale notes: the screen is one scan of fraction·|df| rows (the md5
    range test is applied before any predicate work; at a parquet
    source with a persisted sample-bucket column it becomes a pushed
    filter). The exact stage collects only the escalated PARTITION IDS
    to the driver (bounded by partition count, never rows) and replays
    the stacked-predicate count over ``partition IN (...)`` — at a
    physically partitioned 100 TB table that literal prunes at the
    manifest level, so escalation cost is proportional to the undecided
    band, not the table.
    """
    thr, f_eff = _hex_threshold(fraction)
    checks = []
    for c in spec.constraints:
        pred = stats.violation_predicate(c, df.columns)
        if pred is not None:
            checks.append((c.check_id(), pred))
    if not checks:
        raise ValueError("spec has no row-level (metric) constraints")

    part = stats.partition_expr(spec).alias("partition_id")
    key_hash = F.substring(F.md5(F.col(sample_key).cast("string")), 1, 4)

    def counts(frame: DataFrame) -> DataFrame:
        """One pass → one counter row per partition, melted per check."""
        aggs = [F.count(F.lit(1)).alias("__n__")] + [
            F.sum(pred.cast("long")).alias(f"__k__{cid}")
            for cid, pred in checks
        ]
        wide = frame.select(part, *[F.col(c) for c in frame.columns]).groupBy(
            "partition_id"
        ).agg(*aggs)
        melted = None
        for cid, _ in checks:
            one = wide.select(
                "partition_id",
                F.lit(cid).alias("check_id"),
                F.col("__n__").alias("n_scanned"),
                F.coalesce(F.col(f"__k__{cid}"), F.lit(0)).alias("n_violations"),
            )
            melted = one if melted is None else melted.unionByName(one)
        return melted

    # Grid of every (partition, check): a partition too small to catch
    # any sample rows must still surface (as an escalation), not vanish.
    # The distinct-partition scan is column-pruned here; at a cataloged
    # (Iceberg/Hive) table it is a manifest lookup, not a scan.
    check_ids = F.array(*[F.lit(cid) for cid, _ in checks])
    grid = (
        df.select(part).distinct()
        .select("partition_id", F.explode(check_ids).alias("check_id"))
    )
    sample = grid.join(
        counts(df.filter(key_hash < F.lit(thr))),
        ["partition_id", "check_id"],
        "left",
    ).select(
        "partition_id", "check_id",
        F.coalesce(F.col("n_scanned"), F.lit(0)).alias("n_scanned"),
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
    )
    lcb, ucb = _wilson(F.col("n_violations"), F.col("n_scanned"), z)
    tol = F.lit(float(tolerance))
    screened = sample.select(
        "partition_id", "check_id", "n_scanned", "n_violations",
        F.round(lcb, 9).alias("rate_lcb"),
        F.round(ucb, 9).alias("rate_ucb"),
    ).withColumn(
        "decision",
        F.when(F.col("n_scanned") == 0, F.lit("escalate"))
        .when(F.col("rate_ucb") <= tol, F.lit("pass"))
        .when(F.col("rate_lcb") > tol, F.lit("fail"))
        .otherwise(F.lit("escalate")),
    )
    # The screen frame is consumed twice (certified rows + escalation id
    # list); it is counter-sized (partitions × checks), so persist it.
    screened = screened.persist()

    certified = screened.filter(F.col("decision") != "escalate").select(
        F.lit(spec.name).alias("table"),
        "partition_id", "check_id",
        F.lit("sample").alias("method"),
        F.col("n_scanned").cast("long").alias("n_scanned"),
        F.col("n_violations").cast("long").alias("n_violations"),
        "rate_ucb", "rate_lcb",
        (F.col("decision") == "pass").alias("passed"),
    )

    # Driver traffic = escalated partition ids only (bounded by the
    # partition count). The id literal reaches the source as partition
    # pruning on a physically partitioned table.
    esc_parts = sorted(
        r["partition_id"]
        for r in screened.filter(F.col("decision") == "escalate")
        .select("partition_id").distinct().collect()
    )
    # which checks escalated in which partition — exact rows are emitted
    # only for those (certified verdicts stand)
    esc_pairs = screened.filter(F.col("decision") == "escalate").select(
        "partition_id", "check_id"
    )

    if esc_parts:
        exact_src = df.filter(
            stats.partition_expr(spec).isin([str(p) for p in esc_parts])
        )
        exact = counts(exact_src).join(
            F.broadcast(esc_pairs), ["partition_id", "check_id"]
        ).select(
            F.lit(spec.name).alias("table"),
            "partition_id", "check_id",
            F.lit("exact").alias("method"),
            F.col("n_scanned").cast("long").alias("n_scanned"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.lit(None).cast("double").alias("rate_ucb"),
            F.lit(None).cast("double").alias("rate_lcb"),
            (
                F.col("n_violations").cast("double")
                / F.col("n_scanned").cast("double")
                <= tol
            ).alias("passed"),
        )
        out = certified.unionByName(exact)
    else:
        out = certified
    # f_eff currently only documents the effective grain; estimates are
    # rates (scale-free), so no correction by f_eff is needed.
    _ = f_eff
    return out.select(*SCREEN_COLS)
