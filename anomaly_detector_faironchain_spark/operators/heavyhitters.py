"""Mergeable Misra–Gries heavy-hitter sketches — the skew DIAGNOSIS
companion to `stats.key_skew_profile`.

`key_skew_profile` answers "is this key skewed" with one full count
aggregation: correct, but its shuffle is #distinct-keys wide — at 10^12
rows with a high-cardinality key (path, commit) that is itself a heavy
shuffle, and it cannot run incrementally. The Misra–Gries summary
(Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012 — public algorithms) bounds state at k counters
per task, shuffles ≤ k rows per task regardless of input size, and two
summaries MERGE into one with the same guarantee — so per-run sketches
persist and combine across incremental validation runs exactly like the
HLL / KLL / t-digest families in plans/checkpoint.py.

Guarantees (standard MG): est_count undercounts true count by at most
`err_bound` (the summary's total decrement mass, tracked explicitly);
every key with true frequency > n/(k+1) is PRESENT in the summary.
Exactness contract for the small-scale oracle (mirrors the KLL /
t-digest exact modes): while every task and the merge hold ≤ k distinct
keys, no decrements ever happen, err_bound == 0, and est_count is the
EXACT count — so the DuckDB oracle can state plain GROUP BY counts.

Scale shape:
1. ONE mapInPandas pass builds a per-task MG summary (pandas
   value_counts per Arrow batch — vectorized, no per-row Python), so
   raw rows never shuffle.
2. The only shuffle moves ≤ k counter rows per task to one tiny
   reducer (`applyInPandas` on a literal group) that merges summaries
   and keeps the top_n head.

The 100 TB use: run this BEFORE choosing a join/groupBy strategy —
the keys it surfaces are the ones needing salting (north rule:
"repo-hash partitioning with salting for skewed mega-repos"), at the
cost of a k-row shuffle instead of a #distinct-row one.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MG_SCHEMA = "key string, cnt long, dec long"


def _mg_update(counters: dict, decs: int, series: pd.Series, k: int):
    """Fold a batch of (key -> add_count) into an MG summary of size ≤ k.
    Returns (counters, total_decrement). Deterministic: the decrement
    step is a pure function of the counter multiset."""
    vc = series
    for key, add in vc.items():
        if key in counters:
            counters[key] += int(add)
        else:
            counters[key] = int(add)
    if len(counters) > k:
        # subtract the (k+1)-th largest count from everyone, drop ≤ 0 —
        # one batched decrement is equivalent to the classic per-item
        # rule and keeps the error bound additive in the subtracted mass
        vals = sorted(counters.values(), reverse=True)
        cut = vals[k]
        decs += cut
        counters = {key: c - cut for key, c in counters.items() if c > cut}
    return counters, decs


def mg_partition_sketches(
    df: DataFrame, key_col: str, k: int = 1024
) -> DataFrame:
    """Per-task Misra–Gries summaries of `key_col` (nulls excluded).
    Output rows: ≤ k (key, cnt) rows per task plus one (null-key, 0,
    dec) row carrying the task's decrement mass. Raw rows never
    shuffle — this is the pre-shuffle frame."""
    src = df.select(F.col(key_col).cast("string").alias("key")).filter(
        F.col("key").isNotNull()
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decs = 0
        for pdf in batches:
            counters, decs = _mg_update(
                counters, decs, pdf["key"].value_counts(sort=False), k
            )
        rows = [(key, int(c), 0) for key, c in counters.items()]
        rows.append((None, 0, decs))
        yield pd.DataFrame(rows, columns=["key", "cnt", "dec"])

    return src.mapInPandas(summarize, schema=MG_SCHEMA)


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 1024, top_n: int = 20
) -> DataFrame:
    """Top-n heavy hitters of `key_col` with MG error bounds:
    (key, est_count, err_bound) — true count ∈ [est_count,
    est_count + err_bound]. Ties and ordering: est_count desc, key asc
    (deterministic). err_bound == 0 whenever the data held ≤ k distinct
    keys end-to-end (exact mode — the oracle contract)."""
    sk = mg_partition_sketches(df, key_col, k=k)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        decs = int(pdf.loc[pdf["key"].isna(), "dec"].sum())
        counts = pdf.dropna(subset=["key"]).groupby("key")["cnt"].sum()
        counters, decs = _mg_update({}, decs, counts, k)
        out = pd.DataFrame(
            {"key": list(counters), "est_count": list(counters.values())}
        )
        out["err_bound"] = decs
        out = out.sort_values(
            ["est_count", "key"], ascending=[False, True]
        ).head(top_n)
        return out.reset_index(drop=True)

    merged = (
        sk.withColumn("__g__", F.lit(0))
        .groupBy("__g__")
        .applyInPandas(
            lambda pdf: merge(pdf),
            schema="key string, est_count long, err_bound long",
        )
    )
    return merged


def merge_mg_py(rows: list[tuple], k: int) -> tuple[dict, int]:
    """Driver/test-side merge of (key, cnt, dec) rows — the
    associativity surface the pytest property checks exercise."""
    counters: dict = {}
    decs = 0
    agg: dict = {}
    for key, cnt, dec in rows:
        if key is None:
            decs += int(dec)
        else:
            agg[key] = agg.get(key, 0) + int(cnt)
    counters, decs = _mg_update(counters, decs, pd.Series(agg), k)
    return counters, decs
