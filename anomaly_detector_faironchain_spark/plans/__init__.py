"""Declarative constraint specs and the plan compiler."""

from anomaly_detector_faironchain_spark.plans.spec import (
    Benford,
    Constraint,
    CountMatch,
    Drift,
    ForeignKey,
    FunctionalDependency,
    InRange,
    InSet,
    LengthInRange,
    MonotonicPerKey,
    NotNull,
    Regex,
    RowCheck,
    VectorShape,
    TableSpec,
    Unique,
)

__all__ = [
    "Benford",
    "Constraint",
    "CountMatch",
    "Drift",
    "ForeignKey",
    "FunctionalDependency",
    "InRange",
    "InSet",
    "LengthInRange",
    "MonotonicPerKey",
    "NotNull",
    "Regex",
    "RowCheck",
    "VectorShape",
    "TableSpec",
    "Unique",
]
