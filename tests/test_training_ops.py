"""Unit tests for training-data preparation operators beyond the
DuckDB oracle pairs: group purity of splits, chunk coverage, packing
invariants, and determinism across re-runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.training import (
    chunk_documents,
    deterministic_split,
    pack_token_budget,
    split_thresholds,
    stratified_sample,
)


def test_split_thresholds_validation():
    assert split_thresholds({"a": 0.5, "b": 0.5}) == [("a", "8000"), ("b", None)]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_split_is_group_pure_and_roughly_proportional(spark):
    df = spark.range(20000).select(
        (F.col("id") % 500).cast("string").alias("grp"), F.col("id")
    )
    out = deterministic_split(df, "grp", {"train": 0.8, "val": 0.1,
                                          "test": 0.1})
    # group purity: every group maps to exactly one split
    impure = (
        out.groupBy("grp").agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1).count()
    )
    assert impure == 0
    frac = {
        r["split"]: r["n"] / 500
        for r in out.select("grp", "split").distinct()
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(frac["train"] - 0.8) < 0.08
    assert abs(frac["val"] - 0.1) < 0.06
    assert abs(frac["test"] - 0.1) < 0.06


def test_split_stable_across_runs(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("grp"))
    a = {r["grp"]: r["split"] for r in
         deterministic_split(df, "grp", {"x": 0.5, "y": 0.5}).collect()}
    b = {r["grp"]: r["split"] for r in
         deterministic_split(df, "grp", {"x": 0.5, "y": 0.5}).collect()}
    assert a == b


def test_chunks_cover_text_exactly(spark):
    text = "abcdefghij" * 53  # 530 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=200, overlap=50, keep_text=True)
        .collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts at 0,150,300,450 -> 4 chunks; last one is partial (80 chars)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert [r["chunk_len"] for r in rows] == [200, 200, 200, 80]
    # overlapped reconstruction: dropping each chunk's first 50 chars
    # (except chunk 0) re-yields the document
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][50:] for r in rows[1:]
    )
    assert rebuilt == text


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=10, overlap=10)


def test_packing_batches_fill_to_budget(spark):
    df = spark.createDataFrame(
        [(i, "s", "x" * 400) for i in range(30)],  # 100 tokens each
        "doc_id long, shard string, text string",
    )
    out = pack_token_budget(df, "shard", "doc_id", budget=1000).collect()
    # 100-token docs, 1000 budget -> exactly 10 docs per batch, in order
    for r in out:
        assert r["batch_id"] == (r["doc_id"] // 10)
    sums = {}
    for r in out:
        sums[r["batch_id"]] = sums.get(r["batch_id"], 0) + r["tokens"]
    assert all(v == 1000 for v in sums.values())


def test_packing_oversize_doc_gets_own_batch_slot(spark):
    df = spark.createDataFrame(
        [(1, "s", "x" * 40), (2, "s", "x" * 40000), (3, "s", "x" * 40)],
        "doc_id long, shard string, text string",
    )
    got = {r["doc_id"]: r["batch_id"] for r in
           pack_token_budget(df, "shard", "doc_id", budget=100).collect()}
    # doc 2 (10000 tokens) starts in batch 0 (after doc 1's 10 tokens);
    # doc 3 starts after 10010 tokens -> batch 100
    assert got[1] == 0 and got[2] == 0 and got[3] == 100


def test_stratified_sample_size_and_determinism(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("stratum"), F.col("id")
    )
    a = stratified_sample(df, "stratum", "id", k=7)
    counts = {r["stratum"]: r["n"] for r in
              a.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    ids_a = {r["id"] for r in a.collect()}
    ids_b = {r["id"] for r in
             stratified_sample(df, "stratum", "id", k=7).collect()}
    assert ids_a == ids_b


def test_chunking_plan_is_map_only(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t" * 100), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # bodies never shuffle


def test_mix_corpora_weights_and_determinism(spark):
    from anomaly_detector_faironchain_spark.operators import training

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(4000)],
        "doc_id long, source string",
    )
    weights = {"s0": 2.0, "s1": 0.5, "s2": 0.0}
    out = training.mix_corpora(df, "source", "doc_id", weights)
    rows = out.groupBy("source").count().collect()
    got = {r.source: r["count"] for r in rows}
    assert got["s0"] == 2000          # exactly 2 epochs, no fraction
    assert "s2" not in got            # dropped entirely
    assert abs(got["s1"] - 500) < 80  # ~half of 1000 kept
    assert got["s3"] == 1000          # default weight 1.0
    # epochs label the repeats
    e = out.filter(F.col("source") == "s0").groupBy("epoch").count().collect()
    assert {r.epoch: r["count"] for r in e} == {1: 1000, 2: 1000}
    # deterministic: identical output on re-run
    a = sorted((r.doc_id, r.epoch) for r in out.collect())
    b = sorted(
        (r.doc_id, r.epoch)
        for r in training.mix_corpora(df, "source", "doc_id", weights).collect()
    )
    assert a == b


def test_write_training_shards_sorted_and_capped(spark, tmp_path):
    from anomaly_detector_faironchain_spark.operators import training
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        (F.col("id") * 2654435761 % 1000).alias("key"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "shards")
    man = training.write_training_shards(
        df, out, "key", max_records_per_file=100, n_shards=4
    )
    assert man["n_rows"] == 1000
    # 1000 rows / 100-record cap → at least 10 files
    assert man["n_files"] >= 10 and len(man["files"]) == man["n_files"]
    got = spark.read.parquet(out)
    assert got.count() == 1000
    # per-file key ranges must not overlap ACROSS files (global range
    # order) and must be sorted WITHIN each file
    rows = got.select(
        F.input_file_name().alias("f"), "key",
        F.monotonically_increasing_id().alias("pos"),
    ).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.f, []).append((r.pos, r.key))
    ranges = []
    for f, kv in by_file.items():
        keys = [k for _, k in sorted(kv)]
        assert keys == sorted(keys), f"file {f} not internally sorted"
        ranges.append((min(keys), max(keys), f))
    ranges.sort()
    for (lo1, hi1, f1), (lo2, hi2, f2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping shard ranges {f1} {f2}"


def test_temperature_weights_semantics(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from anomaly_detector_faironchain_spark.operators.training import (
        temperature_weights,
    )

    out = temperature_weights(docs, "source", alpha=0.5, max_weight=4.0).cache()
    rows = {r.source: r for r in out.collect()}
    assert len(rows) == docs.select("source").distinct().count()
    # the rarest source gets the max weight; the dominant source the min
    by_n = sorted(rows.values(), key=lambda r: r.n_docs)
    assert abs(by_n[0].weight - 4.0) < 1e-6 or by_n[0].weight <= 4.0
    assert max(r.weight for r in rows.values()) <= 4.0 + 1e-9
    smallest = min(rows.values(), key=lambda r: r.n_docs)
    largest = max(rows.values(), key=lambda r: r.n_docs)
    assert smallest.weight >= largest.weight
    # alpha=1 keeps natural shares: all weights equal (== max_weight)
    flat = temperature_weights(docs, "source", alpha=1.0, max_weight=2.0)
    ws = {r.weight for r in flat.collect()}
    assert all(abs(w - 2.0) < 1e-6 for w in ws)
    with pytest.raises(ValueError):
        temperature_weights(docs, "source", alpha=-0.1)
