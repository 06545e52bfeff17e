"""Incremental validation via Structured Streaming.

The reference has no streaming; its incrementality contract is "re-run
the month over partition directories" (reference:
etl/run_preprocessing.py:6-10). This module upgrades that contract:
a file-source stream watches an input directory, and every micro-batch
runs the SAME compiled constraint suite (plans/compiler.validate_table)
through foreachBatch, appending verdicts/violations to the output dir.
Files already processed are tracked by the streaming checkpoint — the
exactly-once analogue of the batch manifest (plans/checkpoint.py).

Trigger(availableNow=True) drains the backlog then stops — deterministic
for tests and backfills; omit it for a continuously-running validator.

At scale: maxFilesPerTrigger bounds per-batch work; the per-batch
validate_table is the identical code path as batch, so constraint
semantics cannot drift between modes.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.spec import TableSpec


def validate_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    spec: TableSpec,
    out_dir: str,
    refs: dict[str, DataFrame] | None = None,
    drift_refs: dict[str, DataFrame] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and with available_now=True, run to completion) a streaming
    validation over parquet files arriving in input_dir.

    drift_refs: static reference histograms ({col: (bucket, cnt) DF}) —
    every micro-batch's distribution is PSI/KS-scored against them, so
    a drifting producer flips the drift verdict within one trigger
    instead of at the next batch backfill.

    Returns the StreamingQuery. Verdicts/violations parquet accumulate
    under out_dir with a batch_id lineage column.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    vdir = str(Path(out_dir) / "verdicts")
    xdir = str(Path(out_dir) / "violations")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = validate_table(batch_df, spec, refs=refs, drift_refs=drift_refs)
        res.verdicts.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(vdir)
        res.violations.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(xdir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", str(Path(out_dir) / "_stream_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
