"""Table source adapter: one place that turns a table *reference string*
into a DataFrame, so every surface (CLI, checkpoint runner, tests) shares
the same resolution rules.

Reference forms (the prefix is the format, everything after the first
colon is the location):

    parquet:/data/source_files          path-based parquet (default)
    csv:/data/dims/repos                header + inferSchema csv
    iceberg:catalog.db.source_files     Iceberg catalog table
    table:db.source_files               any Spark-catalog table
    /data/source_files                  no known prefix → default format;
                                        URI schemes (s3://, hdfs://,
                                        abfss://, file:/) are NOT formats
                                        and pass through untouched

The north rule targets Iceberg tables of source-code repositories; the
`iceberg:` form is the production path — it needs the Iceberg Spark
runtime on the cluster classpath, e.g.

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hive ...

`spark.table()` is used for both `iceberg:` and `table:` refs — Iceberg
tables registered in a catalog ARE Spark tables, which keeps partition
pruning, metadata-only scans, and time travel (`VERSION AS OF`) available
through the ordinary DataFrame reader. In an environment without the
Iceberg runtime the resolution fails with Spark's own DATA_SOURCE_NOT_FOUND /
TABLE_OR_VIEW_NOT_FOUND error; this module adds the missing-runtime hint.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_KNOWN = re.compile(r"^(parquet|csv|iceberg|table):(.*)$")

_ICEBERG_HINT = (
    "reading an iceberg: ref requires the Iceberg Spark runtime on the "
    "classpath (spark-submit --packages org.apache.iceberg:"
    "iceberg-spark-runtime-<spark>_<scala>:<version>) and a configured "
    "spark.sql.catalog.<name>"
)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Bucketing is the 100 TB co-location strategy for REPEATED joins on
    the same key: both sides pre-hashed into ``n_buckets`` files per
    partition at write time, so every later equi-join / anti-join on the
    bucket columns compiles WITHOUT an Exchange on either side — the
    shuffle is paid once at ingest instead of per run
    (tests/test_bucketed_joins.py asserts the Exchange-free plan).
    Size ``n_buckets`` so one bucket of the FACT table fits an executor
    core's working memory (e.g. 10^12 rows × 200 B / 8192 buckets ≈
    24 GB per bucket — split further by a partition column).

    On a cluster the same code lands on the Hive/Iceberg catalog;
    Iceberg reads bucketed writes back through its own partition
    transform (``bucket(n, col)``) with storage-partitioned joins."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def load_table(
    spark: SparkSession, ref: str, default_format: str = "parquet"
) -> DataFrame:
    """Resolve a table reference string to a DataFrame (see module doc)."""
    m = _KNOWN.match(ref)
    fmt, loc = (m.group(1), m.group(2)) if m else (default_format, ref)
    if fmt == "csv":
        return (
            spark.read.option("header", True).option("inferSchema", True).csv(loc)
        )
    if fmt in ("iceberg", "table"):
        try:
            return spark.table(loc)
        except Exception as e:  # noqa: BLE001 — annotate, then re-raise
            if fmt == "iceberg":
                e.add_note(_ICEBERG_HINT)
            raise
    return spark.read.parquet(loc)
