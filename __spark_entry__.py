"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full compiled constraint-validation suite
                over sf0.001 lineitem → per-partition verdict table.
queries()     — one callable per implemented operator (SURVEY.md §2),
                each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query.

All real logic lives in anomaly_detector_faironchain_spark.suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anomaly_detector_faironchain_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.q_validation_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
