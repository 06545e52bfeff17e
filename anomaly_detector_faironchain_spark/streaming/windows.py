"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful sessionizer.

The reference is batch-only (SURVEY.md §2.9); these are the engine's
forward-looking streaming surface for the same validation role — e.g.
per-window violation-rate monitoring over an event stream — built on the
standard Structured Streaming machinery:

  * `windowed_counts`: tumbling/sliding event-time windows + watermark —
    late rows beyond the watermark are dropped by Spark, state is bounded;
  * `sessionize`: applyInPandasWithState with a processing-timeout —
    the canonical custom-stateful-operator shape (per-key pandas state,
    Arrow-batched, no per-row Python round trips).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-(window, group) event counts — plus a sum over `value_col`
    when the stream has one (pass value_col=None to skip) — with a
    watermark bounding state. Works identically on batch DataFrames
    (window() is just an expression), which is how tests pin semantics."""
    # watermarks require TIMESTAMP (with timezone); parquet NTZ timestamps
    # are cast up-front (no-op when already TIMESTAMP)
    src = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out_cols = ["n_events"]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
        out_cols.append("sum_value")
    return (
        src.groupBy(win.alias("win"), F.col(group_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            *out_cols,
        )
    )


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = "start long, last long, n long"


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator: extends the open session with every
    batch; emits it when the state times out (no events for the gap)."""
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [key[0]],
            "session_start": [pd.Timestamp(start, unit="s")],
            "session_end": [pd.Timestamp(last, unit="s")],
            "n_events": [n],
        })
        return

    ts_min, ts_max, cnt = None, None, 0
    for pdf in pdfs:
        ts = pdf["ts"].astype("int64") // 1_000_000_000
        ts_min = int(ts.min()) if ts_min is None else min(ts_min, int(ts.min()))
        ts_max = int(ts.max()) if ts_max is None else max(ts_max, int(ts.max()))
        cnt += len(pdf)
    if state.exists:
        start, last, n = state.get
        state.update((min(start, ts_min), max(last, ts_max), n + cnt))
    else:
        state.update((ts_min, ts_max, cnt))
    state.setTimeoutDuration(10_000)  # close session after 10s idle
    yield from ()


def sessionize(stream: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Custom stateful sessionization over a stream keyed by user."""
    return (
        stream.groupBy(F.col(user_col))
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
