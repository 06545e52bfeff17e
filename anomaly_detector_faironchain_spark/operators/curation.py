"""End-to-end corpus curation: the standard training-data preparation
sequence — exact dedup → language ID → quality/length gate — composed
from the individual operators as ONE lazy DataFrame plan.

This is the composition a 100 TB curation job actually runs: dedup
shuffles only (id, md5) pairs, the text statistics are codegen'd column
expressions over the surviving keepers, and the final gate is a plain
filter — so the whole pipeline is two shuffles (dedup keeper group-by +
the id-keyed stat joins) regardless of corpus size, and document bodies
are never moved except by the initial scan.
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
    kept = base.join(keepers, "id")
    stats = text_ops.token_stats(kept, "id", "__text__")
    lang = text_ops.langid(kept, "id", "__text__")
    return (
        stats.join(lang, "id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("quality") >= min_quality)
        )
        .select("id", "predicted_lang", "n_tokens", "quality")
    )
