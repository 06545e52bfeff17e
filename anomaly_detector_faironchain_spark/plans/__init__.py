"""Declarative constraint specs and the plan compiler."""

from anomaly_detector_faironchain_spark.plans.spec import (
    Benford,
    CardinalityBounds,
    Constraint,
    Correlation,
    QuantileBounds,
    CountMatch,
    DistributionOutlier,
    Drift,
    ForeignKey,
    Freshness,
    FunctionalDependency,
    InRange,
    InSet,
    LengthInRange,
    MonotonicPerKey,
    NotNull,
    ProfileOutlier,
    Regex,
    RowCheck,
    SchemaMatch,
    VectorShape,
    TableSpec,
    Unique,
)

__all__ = [
    "Benford",
    "CardinalityBounds",
    "Constraint",
    "Correlation",
    "QuantileBounds",
    "CountMatch",
    "DistributionOutlier",
    "Drift",
    "ForeignKey",
    "Freshness",
    "FunctionalDependency",
    "InRange",
    "InSet",
    "LengthInRange",
    "MonotonicPerKey",
    "NotNull",
    "ProfileOutlier",
    "Regex",
    "RowCheck",
    "SchemaMatch",
    "VectorShape",
    "TableSpec",
    "Unique",
    "spec_from_json",
    "spec_to_json",
]

from anomaly_detector_faironchain_spark.plans.serde import (  # noqa: E402
    spec_from_json,
    spec_to_json,
    suite_from_json,
    suite_to_json,
)

__all__ += ["suite_from_json", "suite_to_json"]
