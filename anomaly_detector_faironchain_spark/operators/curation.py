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
) -> DataFrame:
    """Returns the curated set: one row per surviving document with
    (id, predicted_lang, n_tokens, quality).

    A document survives when it is the keeper of its exact-content group
    (min id per md5) AND min_tokens ≤ n_tokens ≤ max_tokens AND
    quality ≥ min_quality (token_stats' 0-100 score).
    """
    keepers = dedup.exact_dedup(df, id_col, text_col).filter(
        ~F.col("is_dup")
    ).select("id")
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text__"))
    kept = base.join(keepers, "id", "left_semi")
    # every per-row statistic in ONE projection (no stats⋈langid re-join —
    # that shape re-scanned the source per operator branch)
    stat_cols = text_ops.token_stat_cols("__text__")
    scored = kept.select(
        "id",
        stat_cols["n_tokens"].alias("n_tokens"),
        stat_cols["quality"].alias("quality"),
        text_ops.langid_col("__text__").alias("predicted_lang"),
    )
    return scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    ).select("id", "predicted_lang", "n_tokens", "quality")


def cap_per_group(
    df, group_col: str, order_col: str, k: int, id_col: str,
):
    """Per-group quota cap: keep at most ``k`` rows per ``group_col``,
    preferring the highest ``order_col`` (ties broken by ascending
    ``id_col`` for determinism). The web-corpus per-domain cap — bounding
    any single domain's share of the training mix — and the generic
    "top-k documents per source by quality" selector.

    One shuffle keyed by group; within a group the window is a per-key
    sort, so a mega-domain is bounded by its own row count, not the
    corpus (AQE skew-split applies — the window key is the shuffle key).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .withColumnRenamed("__rn__", "group_rank")
    )
