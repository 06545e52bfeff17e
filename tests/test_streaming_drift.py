"""Streaming distribution-drift monitoring: every micro-batch is
PSI-scored against a static reference histogram, so a producer that
starts emitting a shifted distribution flips the drift verdict within
one trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import drift as drift_ops
from anomaly_detector_faironchain_spark.plans.spec import Drift, TableSpec
from anomaly_detector_faironchain_spark.streaming.incremental import (
    validate_stream,
)


def test_streaming_drift_flags_shifted_batch(spark, tmp_path):
    ref_df = spark.range(2000).select(
        F.lit("p").alias("part"), (F.col("id") % 100).cast("double").alias("v")
    )
    ref_hist = drift_ops.numeric_histogram(ref_df, "v", 32, 0.0, 200.0)

    in_dir = tmp_path / "in"
    # batch A matches the reference; batch B is shifted far outside it
    ref_df.coalesce(1).write.parquet(str(in_dir / "a"))
    spark.range(2000).select(
        F.lit("p").alias("part"),
        ((F.col("id") % 100) + 90).cast("double").alias("v"),
    ).coalesce(1).write.parquet(str(in_dir / "b"))

    spec = TableSpec(
        name="t", partition_col="part",
        constraints=(Drift("v", method="psi", bins=32, lo=0.0, hi=200.0,
                           threshold=0.2),),
    )
    out = tmp_path / "out"
    validate_stream(
        spark,
        f"{in_dir}/*",
        ref_df.schema,
        spec,
        str(out),
        drift_refs={"v": ref_hist},
        max_files_per_trigger=1,
    )
    verdicts = spark.read.parquet(str(out / "verdicts")).collect()
    assert len(verdicts) == 2
    by_batch = {r["batch_id"]: r["passed"] for r in verdicts}
    # exactly one micro-batch (the shifted one) fails the drift check
    assert sorted(by_batch.values()) == [False, True]
