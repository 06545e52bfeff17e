"""Training-data preparation operators: deterministic splits, chunking,
token-budget packing, corpus heavy-hitters, stratified sampling.

These are the steps between a curated corpus (operators/curation.py) and
a tokenizer: assign every document to a train/val/test split WITHOUT a
random() that breaks reproducibility or a shuffle that moves bodies,
cut documents into overlapping context-window chunks, group documents
into token-budget batches, and surface corpus statistics (top terms,
per-stratum samples) for inspection.

All pure built-in expressions — whole-stage codegen, zero Python UDFs:

- deterministic_split: md5(group)-prefix range test. Map-only (no
  shuffle, no RNG): the same group always lands in the same split, on
  any cluster size, in any run — and grouping by repo/source keeps
  near-duplicate documents of one origin out of opposite splits
  (the classic train/test contamination bug).
- chunk_documents: sequence() + posexplode-style substring windows.
  Map-only; bodies never shuffle — each chunk row carries a hash, not
  the text, unless asked.
- pack_token_budget: running token sum per shard (partitioned window)
  → batch id. One shuffle on the shard key; within a shard the
  assignment is the sequential greedy one.
- top_terms: explode→map-side-combined count→TakeOrderedAndProject.
  The shuffle carries (word, partial count) pairs, never documents.
- stratified_sample: per-stratum deterministic top-k by key hash
  (partitioned window) — a reproducible "random" sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "deterministic_split",
    "leakage_safe_split",
    "split_thresholds",
    "chunk_documents",
    "pack_token_budget",
    "top_terms",
    "stratified_sample",
]


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative 4-hex-digit md5-prefix upper bounds for each split,
    in declaration order; the last split absorbs rounding remainder.

    [('train', 'cccc'), ('val', 'e666'), ('test', None)] for 80/10/10.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, format(min(int(cum * 65536), 65535), "04x")))
    out.append((names[-1], None))
    return out


def deterministic_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Assign a reproducible train/val/test split by GROUP, not by row:
    every row whose ``group_col`` hashes into a split's md5-prefix range
    gets that split. Pure string comparison on the md5 hex prefix — no
    numeric conversion, no RNG, no shuffle; identical assignment on any
    engine that computes standard md5 (the DuckDB oracle does)."""
    prefix = F.substring(F.md5(F.col(group_col).cast("string")), 1, 4)
    thresholds = split_thresholds(fractions)
    result = F.lit(thresholds[-1][0])
    for name, upper in reversed(thresholds[:-1]):
        result = F.when(prefix < F.lit(upper), F.lit(name)).otherwise(result)
    return df.withColumn(out_col, result)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 200,
    overlap: int = 50,
    keep_text: bool = False,
) -> DataFrame:
    """Cut each document into chunks of ``chunk_size`` chars advancing
    by ``chunk_size - overlap``; the final partial chunk is kept. Output
    is one row per (doc, chunk_id) with the chunk length and an md5 of
    the chunk — the text itself only with ``keep_text=True`` (hash-only
    output keeps the exploded table narrow at corpus scale; the chunk
    is re-derivable from (doc_id, chunk_id))."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    n = F.length(F.col(text_col))
    last_k = F.floor((n - F.lit(1)) / F.lit(step)).cast("int")
    exploded = df.filter(n.isNotNull() & (n > 0)).select(
        *id_cols,
        F.explode(
            F.sequence(F.lit(0), F.greatest(last_k, F.lit(0)))
        ).alias("chunk_id"),
        F.col(text_col).alias("__text__"),
    )
    piece = F.col("__text__").substr(
        F.col("chunk_id") * step + 1, F.lit(chunk_size)
    )
    cols = [
        *id_cols,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.length(piece).cast("long").alias("chunk_len"),
        F.md5(piece).alias("chunk_md5"),
    ]
    if keep_text:
        cols.append(piece.alias("chunk_text"))
    return exploded.select(*cols)


def pack_token_budget(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    budget: int,
    token_expr: Column | None = None,
) -> DataFrame:
    """Group documents into token-budget batches per shard: documents
    are taken in ``order_col`` order, a running token total accumulates,
    and ``batch_id = floor((running - tokens) / budget)`` — the batch in
    which each document STARTS (the streaming sequence-packing
    approximation: batches fill to ~budget, a document never splits).

    One hash shuffle on the shard column; the per-shard running sum is a
    partitioned window, so shards pack in parallel. Default token proxy:
    ceil(len/4) chars-per-token."""
    tokens = (
        token_expr
        if token_expr is not None
        else F.ceil(F.length("text") / F.lit(4)).cast("long")
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("tokens", tokens)
    running = F.sum("tokens").over(w)
    return out.withColumn(
        "batch_id",
        F.floor((running - F.col("tokens")) / F.lit(budget)).cast("long"),
    )


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_len: int = 4,
) -> DataFrame:
    """Top-k corpus terms by frequency (ties broken by term) — the
    stopword/boilerplate report for a curation run. Explode → partial
    count (map-side combine) → TakeOrderedAndProject: the only shuffle
    carries (term, count) partials. For heavy-hitter screening at
    10^12 docs swap the exact count for count_min_sketch() partials;
    exact counting of the shuffled partials is already linear-scalable
    so the exact form is the default."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
    ).filter(F.length("term") >= min_len)
    return (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum
    by md5(key) (uniform, reproducible, engine-portable) and keep the
    first k. Partitioned window — strata sample in parallel; no RNG
    state, so a resumed or re-run job samples identically."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mix_corpora(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: str = "mix",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic source-weighted training mixture: each document is
    emitted ``floor(w)`` times plus once more for a hash-chosen
    ``frac(w)`` fraction of its source, with an ``epoch`` column (1..k)
    distinguishing the repeats — the up/down-sampling step that turns
    per-source quality decisions into a training mix (0.5 = keep half,
    2.5 = two full epochs plus a half epoch).

    Same machinery as deterministic_split: the keep/extra-copy decision
    is a string comparison on a 4-hex md5 prefix of (seed, source, id) —
    no RNG, no shuffle, identical on any engine with standard md5, and
    re-running with the same seed reproduces the exact mixture. Map-only:
    the explode multiplies rows in place; nothing is sampled via
    df.sample (whose seed is partition-layout-dependent and therefore
    NOT stable across repartitioning).
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be non-negative")

    def frac_hex(w: float) -> str:
        return format(min(int((w - int(w)) * 65536), 65535), "04x")

    src = F.col(source_col)
    base = F.lit(int(default_weight))
    thresh = F.lit(frac_hex(default_weight))
    for name, w in weights.items():
        base = F.when(src == name, F.lit(int(w))).otherwise(base)
        thresh = F.when(src == name, F.lit(frac_hex(w))).otherwise(thresh)
    prefix = F.substring(
        F.md5(F.concat(
            F.lit(f"{seed}:"), src, F.lit(":"),
            F.col(id_col).cast("string"),
        )), 1, 4,
    )
    copies = (base + (prefix < thresh).cast("int")).alias("__copies__")
    # the copies > 0 filter must precede the explode: sequence(1, 0) is
    # DESCENDING in Spark, not empty
    return (
        df.withColumn("__copies__", copies)
        .filter(F.col("__copies__") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(1), F.col("__copies__"))),
        )
        .drop("__copies__")
    )


def write_training_shards(
    df,
    out_dir: str,
    sort_cols: list[str] | str,
    max_records_per_file: int,
    n_shards: int | None = None,
) -> dict:
    """Deterministic sorted-shard export — the sink that turns a curated
    corpus into training shards: range-partition on ``sort_cols`` (so
    shard N's keys all precede shard N+1's — epoch readers get a global
    order without any reader-side sort), sort within each shard, and cap
    file size with maxRecordsPerFile so no shard exceeds the loader's
    memory budget. Returns a manifest dict {n_rows, n_files, files}.

    Scale shape: ONE range-partitioning shuffle (sampled boundaries,
    skew-balanced by Spark's range partitioner) + per-partition sort that
    spills; maxRecordsPerFile splits oversized partitions at write time
    without another shuffle. Writing through the committer keeps the
    export atomic per Spark's usual _SUCCESS contract.
    """
    from pyspark.sql import functions as F

    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    part = df.repartitionByRange(*([n_shards] if n_shards else []), *cols)
    (
        part.sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(out_dir)
    )
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    files = sorted(
        r.f for r in written.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    )
    return {
        "n_rows": written.count(),
        "n_files": len(files),
        "max_records_per_file": max_records_per_file,
        "files": files,
    }


def leakage_safe_split(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_col: str = "split",
) -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicate documents must
    land in the SAME split, or the held-out sets leak (memorized)
    training text and every eval number is inflated — the benchmark-
    contamination bug applied to a model's own validation data. Returns
    (id, component, split).

    ``pairs`` is any near-dup pair table (MinHash/SimHash/embedding LSH
    output, ``id_a``/``id_b``); its connected components (large-star/
    small-star, operators/graph.py) become the split unit: every member
    of a component inherits the split of the component label (the
    order-minimal member), and documents in no pair are their own
    singleton component. Assignment is deterministic_split's md5-prefix
    range test on the component id — map-only after the components
    converge, no RNG, reproducible on any engine.

    Scale shape: components run over the PAIR table (near-dup pairs are
    sparse — orders of magnitude smaller than the corpus); the corpus
    itself takes one broadcast-or-shuffle left join against the
    (id, component) labels and one codegen'd hash test. Compare
    deterministic_split's group_col variant, which gets leakage safety
    only when near-dups never cross the grouping key; this operator
    derives the safe grouping from measured similarity instead of
    trusting a metadata column.
    """
    from anomaly_detector_faironchain_spark.operators import graph

    comp = graph.connected_components(pairs, src=id_a, dst=id_b)
    labeled = docs.select(F.col(id_col).alias("id")).join(
        comp, "id", "left"
    ).select(
        "id",
        F.coalesce(F.col("component"), F.col("id")).alias("component"),
    )
    return deterministic_split(labeled, "component", fractions, out_col=out_col)


def temperature_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    max_weight: float = 4.0,
    by_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual/LLM "alpha
    sampling" rule: sample probability ∝ share^alpha): one row per
    source with (source, n_docs, share, weight), where weight is the
    per-document epoch multiplier that realizes the tempered
    distribution — feed it straight into ``mix_corpora``.

    alpha=1 reproduces natural shares (all weights equal); alpha→0
    approaches uniform over sources (rare sources upsampled hardest).
    Weights are scaled so the LARGEST upsample factor equals
    ``max_weight`` (the usual guard against repeating a tiny source
    hundreds of times); the dominant source therefore gets the smallest
    weight. ``by_col`` weights by a size column (e.g. token counts from
    bpe_token_count) instead of document counts.

    Shape: one map-side-combined groupBy to #sources rows, the
    normalizing sums reduce that tiny frame — the corpus is scanned
    once and never shuffled.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    size = F.count(F.lit(1)) if by_col is None else F.sum(by_col)
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        size.cast("double").alias("n")
    )
    tot = per_src.agg(
        F.sum("n").alias("tot"),
    )
    shared = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n", (F.col("n") / F.col("tot")).alias("share")
    )
    # q_i = share^alpha / Σ share^alpha; epoch factor = q_i / share_i,
    # rescaled so max factor == max_weight
    powed = shared.select(
        "source", "n", "share", F.pow("share", F.lit(float(alpha))).alias("pa")
    )
    norm = powed.agg(F.sum("pa").alias("z"))
    raw = powed.crossJoin(F.broadcast(norm)).select(
        "source", "n", "share",
        (F.col("pa") / F.col("z") / F.col("share")).alias("raw_w"),
    )
    mx = raw.agg(F.max("raw_w").alias("mx"))
    return raw.crossJoin(F.broadcast(mx)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round("share", 6).alias("share"),
        F.round(F.col("raw_w") / F.col("mx") * F.lit(float(max_weight)), 6)
        .alias("weight"),
    )
