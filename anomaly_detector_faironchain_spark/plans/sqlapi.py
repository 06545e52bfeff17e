"""Guarded interactive SQL surface over validation results — the Spark
re-expression of the reference's DuckDB-backed endpoints
(reference: api/sql_api.py:16-76, api/app.py:26-58).

Same contract: user SQL must be a single SELECT against the view `t`;
DDL/DML/system keywords are rejected with the reference's exact keyword
list. Catalyst supplies the parse→analyze→optimize→execute lifecycle the
reference delegated to DuckDB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# guard regexes: the reference's DuckDB keyword list (api/sql_api.py:16-18)
# PLUS Spark-specific SELECT-able escape hatches — reflect()/java_method()
# can invoke arbitrary static Java methods (System.getenv leaks), and the
# file/session introspection functions widen the surface beyond the view.
SQL_SELECT = re.compile(r"^\s*select\b", re.I)
SQL_FORBIDDEN = re.compile(
    r"\b(attach|install|load|pragma|copy|insert|update|delete|create|drop|"
    r"alter|grant|revoke|call|execute|"
    r"reflect|java_method|input_file_name|input_file_block_start|"
    r"input_file_block_length|current_user|session_user|uuid|"
    r"spark_partition_id|monotonically_increasing_id)\b",
    re.I,
)


class SqlGuardError(ValueError):
    pass


def guard_sql(user_sql: str) -> str:
    s = user_sql.strip()
    if not SQL_SELECT.match(s):
        raise SqlGuardError("only SELECT queries are allowed")
    if SQL_FORBIDDEN.search(s):
        raise SqlGuardError("forbidden keyword detected")
    return s


def run_sql(spark: SparkSession, df: DataFrame, user_sql: str,
            view: str = "t") -> DataFrame:
    """Register df as view `t` (reference: sql_api.py:64) and run the
    guarded user SELECT through Catalyst."""
    sql = guard_sql(user_sql)
    df.createOrReplaceTempView(view)
    return spark.sql(sql)


def top_failing_partitions(verdicts: DataFrame, n: int = 100) -> DataFrame:
    """/v1/top analogue (reference app.py:45-52): partitions ranked by
    failed checks then violations, with a 1..n ranking column."""
    from pyspark.sql import Window

    agg = verdicts.groupBy("table", "partition_id").agg(
        F.sum((~F.col("passed")).cast("long")).alias("n_failed"),
        F.sum("n_violations").alias("n_violations"),
    )
    w = Window.orderBy(
        F.col("n_failed").desc(), F.col("n_violations").desc(),
        F.col("partition_id").asc(),
    )
    return (
        agg.withColumn("ranking", F.row_number().over(w))
        .filter(F.col("ranking") <= n)
        .select("ranking", "table", "partition_id", "n_failed", "n_violations")
    )


def partition_profile(verdicts: DataFrame, violations: DataFrame,
                      partition_id: str) -> dict:
    """/v1/address analogue (reference app.py:103-188): one partition's
    verdict detail + its violation samples as a JSON-able dict."""
    checks = [
        {
            "check_id": r.check_id,
            "passed": bool(r.passed),
            "n_violations": int(r.n_violations),
            "description": r.description,
        }
        for r in verdicts.filter(
            F.col("partition_id") == partition_id
        ).collect()
    ]
    samples = [
        {"check_id": r.check_id, "row": r.row_payload}
        for r in violations.filter(F.col("partition_id") == partition_id)
        .limit(20).collect()
    ]
    return {
        "partition_id": partition_id,
        "passed": all(c["passed"] for c in checks) if checks else None,
        "checks": checks,
        "violation_samples": samples,
    }
