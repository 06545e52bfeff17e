"""Declarative constraint specs and the plan compiler."""

from anomaly_detector_faironchain_spark.plans.spec import (
    Constraint,
    Drift,
    ForeignKey,
    FunctionalDependency,
    InRange,
    InSet,
    LengthInRange,
    NotNull,
    Regex,
    RowCheck,
    VectorShape,
    TableSpec,
    Unique,
)

__all__ = [
    "Constraint",
    "Drift",
    "ForeignKey",
    "FunctionalDependency",
    "InRange",
    "InSet",
    "LengthInRange",
    "NotNull",
    "Regex",
    "RowCheck",
    "VectorShape",
    "TableSpec",
    "Unique",
]
