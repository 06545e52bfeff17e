"""Watermarked windowed aggregation + stateful sessionization."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.streaming.windows import (
    sessionize,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_batch_semantics(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = windowed_counts(ev, "ts", "event_type", window="1 hour")
    # window totals reconcile with the raw table
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # windows are aligned hour boundaries
    bad = out.filter(
        (F.minute("window_start") != 0) | (F.second("window_start") != 0)
    ).count()
    assert bad == 0


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(2000)
    src = tmp_path / "in"
    ev.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    agg = windowed_counts(stream, "ts", "event_type", window="1 hour",
                          watermark="30 minutes")
    q = (
        agg.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    expected = spark.read.parquet(str(src)).count()
    got = spark.sql("SELECT SUM(n_events) AS n FROM win_counts").collect()[0].n
    assert got == expected > 0


def test_sessionize_emits_closed_sessions(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts").limit(500)
    src = tmp_path / "in"
    ev.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    sessions = sessionize(stream)
    q = (
        sessions.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    # first micro-batch ingests all files; sessions close on the 10s
    # processing-time timeout, which needs a later empty batch → poll
    deadline = time.time() + 60
    n = 0
    while time.time() < deadline:
        n = spark.sql("SELECT COUNT(*) AS n FROM sessions").collect()[0].n
        if n > 0:
            break
        time.sleep(2)
    q.stop()
    assert n > 0
    rows = spark.sql(
        "SELECT * FROM sessions WHERE session_end < session_start"
    ).collect()
    assert rows == []
