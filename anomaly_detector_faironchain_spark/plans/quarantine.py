"""Row-level quarantine split: route violating rows out of the table.

The reference drops or fixes bad rows inline during preprocessing
(reference `preprocessing/cleaning/clean_blocks.py`,
`validate_blocks.py` — filter + log counts); at pipeline scale the
standard shape is a SPLIT instead: clean rows flow to the consumer,
violating rows land in a quarantine table carrying WHICH checks they
failed, so ingestion keeps moving and repair is an offline batch over
the quarantine.

`split_rows(df, spec)` marks each row with the row-level checks it
violates (the same `stats.violation_predicate` expressions the verdict
pass compiles — NotNull / Regex / InSet / InRange / LengthInRange /
VectorShape / RowCheck; partition-level constraints like Unique or
Drift cannot blame a single row and do not participate) and returns

    clean      — input schema unchanged, rows with zero violations
    quarantine — input schema + failed_checks array<string> (sorted)

Scale shape: the mark is ONE map-only projection (all predicates are
codegen expressions — no UDF, no shuffle, no action); `clean` and
`quarantine` are two filters over the same marked lineage, so consuming
both costs two source scans with the filter pushed into each. When the
source scan dominates and both sides are consumed in one job, persist
the input first — the split itself never shuffles either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import stats
from anomaly_detector_faironchain_spark.plans.spec import TableSpec

FAILED_COL = "failed_checks"


def split_rows(df: DataFrame, spec: TableSpec) -> tuple[DataFrame, DataFrame]:
    if FAILED_COL in df.columns:
        raise ValueError(
            f"input already has a {FAILED_COL!r} column; rename it or "
            "drop it before splitting"
        )
    checks = []
    for c in spec.constraints:
        pred = stats.violation_predicate(c, df.columns)
        if pred is not None:
            checks.append((c, pred))
    if not checks:
        return df, df.limit(0).withColumn(
            FAILED_COL, F.array().cast("array<string>")
        )
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(pred, F.lit(c.check_id()))
                    for c, pred in checks
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    marked = df.withColumn(FAILED_COL, failed)
    clean = marked.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    quarantine = marked.filter(F.size(FAILED_COL) > 0)
    return clean, quarantine
