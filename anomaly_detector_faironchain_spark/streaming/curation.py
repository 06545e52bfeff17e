"""Streaming corpus curation: the batch curation pipeline
(operators/curation.py) re-expressed over a Structured Streaming source.

Exact dedup becomes a STATE-STORE operation: `dropDuplicates` on the
content digest keeps the first-seen document per digest across
micro-batches — the streaming analogue of the batch keeper rule (batch
keeps min id; streaming keeps arrival order, identical when originals
arrive before their copies). The per-row statistics and the quality gate
are the same single codegen'd projection the batch pipeline uses, so
gate semantics cannot drift between modes.

State growth: without a watermark the digest state store retains one
entry per distinct document for the life of the stream (16-byte digest +
state overhead per distinct doc). For an unbounded 100 TB ingest, pass
event_time_col + watermark so `dropDuplicates` can expire state: dedup
then only spans the watermark horizon, which is the standard
bounded-state trade for infinite streams.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import text as text_ops


def curate_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 50.0,
    min_clf_score: float | None = None,
    event_time_col: str | None = None,
    watermark: str | None = None,
    available_now: bool = True,
):
    """Stream parquet document files from input_dir, emit the curated set
    (id, predicted_lang, n_tokens, quality) to out_dir/curated as
    append-only parquet. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    if event_time_col and watermark:
        stream = stream.withWatermark(event_time_col, watermark)
    hashed = stream.withColumn("__md5__", F.md5(F.col(text_col)))
    if event_time_col and watermark:
        # digest-keyed state that EXPIRES at the watermark horizon
        deduped = hashed.dropDuplicatesWithinWatermark(["__md5__"])
    else:
        deduped = hashed.dropDuplicates(["__md5__"])
    stat_cols = text_ops.token_stat_cols(text_col)
    extra = []
    if min_clf_score is not None:
        extra.append(text_ops.quality_score_col(text_col).alias("__clf__"))
    scored = deduped.select(
        F.col(id_col).alias("id"),
        stat_cols["n_tokens"].alias("n_tokens"),
        stat_cols["quality"].alias("quality"),
        text_ops.langid_col(text_col).alias("predicted_lang"),
        *extra,
    )
    gate = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if min_clf_score is not None:
        # the SAME literal-weight logistic as the batch gate — model
        # semantics cannot drift between modes
        gate = gate & (F.col("__clf__") >= float(min_clf_score))
    gated = scored.filter(gate).select(
        "id", "predicted_lang", "n_tokens", "quality"
    )

    writer = (
        gated.writeStream.format("parquet")
        .option("path", str(Path(out_dir) / "curated"))
        .option("checkpointLocation", str(Path(out_dir) / "_ckpt"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
