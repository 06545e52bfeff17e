"""SparkSession factory.

Local-mode defaults tuned for the sandbox (single JVM, N threads); on a
real cluster the same code runs unchanged — partitioning decisions are
expressed per-operator (broadcast hints, salting, repartition by key),
not via local-mode assumptions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "anomaly_detector_faironchain_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: int for local[N], "*" for local[*], None → $SPARK_GRAFT_CPUS or "*".
    shuffle_partitions defaults to 2× cores in local mode — enough tasks to
    keep every thread busy through AQE coalescing, few enough to avoid
    scheduling overhead at sandbox scale. On a cluster this is overridden
    by the submitter.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(cores) * 2)
        except (TypeError, ValueError):
            shuffle_partitions = 64

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
