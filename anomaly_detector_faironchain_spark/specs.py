"""Canonical TableSpecs: the north-rule source_files suite shared by
tests, bench, and the spark-submit entrypoint.

Constraint set mirrors FIXTURES.md §A: non-null core columns, unique
file_sid, 40-hex commit format, lang domain, content length bounds,
repo referential integrity, and the per-row sha256 invariant against
the generator manifest (BASELINE.json input_hint).
"""

from __future__ import annotations

from anomaly_detector_faironchain_spark.datagen import source_files as gen
from anomaly_detector_faironchain_spark.plans.spec import (
    CardinalityBounds,
    ForeignKey,
    FunctionalDependency,
    InSet,
    LengthInRange,
    NotNull,
    QuantileBounds,
    Regex,
    RowCheck,
    TableSpec,
    Unique,
)


def north_rule_spec(partition_col: str = "bucket") -> TableSpec:
    return TableSpec(
        name="source_files",
        partition_col=partition_col,
        # length sketches only where length varies: paths and file bodies
        # (commit/sha are fixed 40/64-hex, lang is a tiny enum)
        profile_len_cols=("path", "content"),
        constraints=(
            NotNull("repo", "path", "commit", "lang", "content"),
            Unique("file_sid"),
            Regex("commit", "[0-9a-f]{40}"),
            InSet("lang", gen.LANGS),
            # enum-cardinality budget: more distinct langs than the enum
            # has members means the column stopped being an enum (the
            # classic shifted-column ingestion bug). Absolute form is
            # scale-invariant (holds at 15 rows and at 10^9); the HLL
            # estimate rides the fused pass — zero extra scans
            CardinalityBounds("lang", hi_abs=len(gen.LANGS), mode="approx"),
            LengthInRange("content", 1, 1 << 20),
            # distribution contract on top of the per-row bound: the
            # p99 content length must stay inside the corpus envelope
            # (rides the fused pass as one KLL-backed percentile agg;
            # catches truncation/blob-concat shifts LengthInRange can't)
            QuantileBounds("content", q=0.99, length=True,
                           lo=1.0, hi=float(1 << 20)),
            ForeignKey(("repo",), "repos", ("repo",)),
            # north_star's commit->repo referential shape: a commit hash
            # must belong to exactly one repo (single-valued mapping)
            FunctionalDependency("commit", dependent="repo"),
            RowCheck(
                "sha_invariant",
                "sha2(content, 256) = content_sha256",
                "content sha256 must equal the generator manifest",
            ),
        ),
    )
