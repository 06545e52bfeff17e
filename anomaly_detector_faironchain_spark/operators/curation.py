"""End-to-end corpus curation: the standard training-data preparation
sequence — exact dedup → language ID → quality/length gate — composed
from the individual operators as ONE lazy DataFrame plan.

This is the composition a 100 TB curation job actually runs: dedup
shuffles only (id, md5) pairs, every text statistic (token counts,
quality, language ID) is evaluated in ONE codegen'd projection over the
surviving keepers, and the final gate is a plain filter. Document bodies
never enter an exchange — the only shuffled rows are (id, md5) for the
keeper group-by and bare ids for the keeper semi-join (asserted by
tests/test_plan_shape.py::test_curation_pipeline_never_shuffles_bodies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import dedup
from anomaly_detector_faironchain_spark.operators import text as text_ops


def curate_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 50.0,
    min_clf_score: float | None = None,
) -> DataFrame:
    """Returns the curated set: one row per surviving document with
    (id, predicted_lang, n_tokens, quality).

    A document survives when it is the keeper of its exact-content group
    (min id per md5) AND min_tokens ≤ n_tokens ≤ max_tokens AND
    quality ≥ min_quality (token_stats' 0-100 score). With
    ``min_clf_score`` set, the model-based gate (text.quality_score_col,
    the CCNet/fastText-stage logistic) also applies — it folds into the
    SAME fused projection, so the extra gate costs zero extra scans.
    """
    keepers = dedup.exact_dedup(df, id_col, text_col).filter(
        ~F.col("is_dup")
    ).select("id")
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text__"))
    kept = base.join(keepers, "id", "left_semi")
    # every per-row statistic in ONE projection (no stats⋈langid re-join —
    # that shape re-scanned the source per operator branch)
    stat_cols = text_ops.token_stat_cols("__text__")
    extra = []
    if min_clf_score is not None:
        extra.append(
            text_ops.quality_score_col("__text__").alias("__clf__")
        )
    scored = kept.select(
        "id",
        stat_cols["n_tokens"].alias("n_tokens"),
        stat_cols["quality"].alias("quality"),
        text_ops.langid_col("__text__").alias("predicted_lang"),
        *extra,
    )
    gate = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if min_clf_score is not None:
        gate = gate & (F.col("__clf__") >= float(min_clf_score))
    return scored.filter(gate).select(
        "id", "predicted_lang", "n_tokens", "quality"
    )


def cap_per_group(
    df, group_col: str, order_col: str, k: int, id_col: str,
):
    """Per-group quota cap: keep at most ``k`` rows per ``group_col``,
    preferring the highest ``order_col`` (ties broken by ascending
    ``id_col`` for determinism). The web-corpus per-domain cap — bounding
    any single domain's share of the training mix — and the generic
    "top-k documents per source by quality" selector.

    Skew note: row_number() needs the whole group in ONE task, and AQE
    skew mitigation only splits join/rebalance partitions — never window
    partitions — so a mega-domain would otherwise funnel its entire row
    count through a single task. The mitigation here is a two-phase
    top-k: phase 1 keeps at most k rows per (input-partition, group)
    with a window over (spark_partition_id, group) — each task sorts
    only its own slice, no shuffle — which bounds the global window's
    input to k · #partitions rows per group. Correct for any partition
    assignment (the true global top-k always survives phase 1, whatever
    AQE does to partition ids), so the final ranking is unchanged.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    pre = Window.partitionBy(F.spark_partition_id(), F.col(group_col)) \
        .orderBy(*order)
    reduced = (
        df.withColumn("__pre__", F.row_number().over(pre))
        .filter(F.col("__pre__") <= k)
        .drop("__pre__")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        reduced.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .withColumnRenamed("__rn__", "group_rank")
    )
