"""As-of join, interval join, and mergeable HLL sketch tests.

The as-of parity oracle is pandas.merge_asof (the semantics the operator
promises); the interval-join oracle is a naive O(n^2) pair filter; the
sketch tests exercise the checkpoint merge path that lets a resumed run
answer corpus-level uniqueness without rescanning completed partitions.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.temporal import (
    asof_join,
    interval_join,
)
from anomaly_detector_faironchain_spark.operators.uniqueness import (
    hll_partition_sketches,
    merge_sketches,
)


def _asof_frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, ts)  — includes equal-ts (inclusive) and no-match rows
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "a", 5.0),   # before any right row -> null match
            (4, "b", 100.0),
            (5, "b", 100.0),  # duplicate left ts
            (6, "c", 50.0),   # key with no right rows at all
        ],
        "id long, key string, ts double",
    )
    right = spark.createDataFrame(
        [
            ("a", 10.0, 1.5),   # equal ts -> must match row id=1 (inclusive)
            ("a", 18.0, 2.5),
            ("b", 40.0, 3.5),
            ("b", 99.0, 4.5),
        ],
        "key string, ts double, v double",
    )
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _asof_frames(spark)
    got = (
        asof_join(left, right, on=["key"], left_ts="ts", value_cols=["v"])
        .orderBy("id")
        .toPandas()
    )
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    exp = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward"
    ).sort_values("id").reset_index(drop=True)
    for _, e in exp.iterrows():
        g = got[got["id"] == e["id"]].iloc[0]
        if pd.isna(e["v"]):
            assert g["v"] is None or pd.isna(g["v"])
            assert g["ts_asof"] is None or pd.isna(g["ts_asof"])
        else:
            assert g["v"] == e["v"]


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left, right = _asof_frames(spark)
    got = {
        r["id"]: (r["v"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], left_ts="ts",
            value_cols=["v"], tolerance=2.0,
        ).collect()
    }
    assert got[1] == (1.5, 10.0)      # gap 0 <= 2
    assert got[2] == (2.5, 18.0)      # gap 2 <= 2 (inclusive tolerance)
    assert got[4] == (4.5, 99.0)      # gap 1
    assert got[5] == (4.5, 99.0)
    assert got[3] == (None, None)     # no earlier row
    assert got[6] == (None, None)     # no right rows for key


def test_asof_join_single_shuffle(spark):
    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, on=["key"], left_ts="ts", value_cols=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioned exchange for the keyed window; no broadcast,
    # no nested-loop, no global (single-partition) sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan


def test_asof_join_segmented_matches_unsegmented(spark):
    """The skew-mitigating (key, time-segment) plan must be result-
    identical to the single-window plan, including carry-in across
    empty segments and keys with no right rows at all."""
    left, right = _asof_frames(spark)
    base = {
        (r["id"], r["v"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", value_cols=["v"]
        ).collect()
    }
    for width in (7.0, 15.0, 1000.0):
        seg = {
            (r["id"], r["v"], r["ts_asof"])
            for r in asof_join(
                left, right, on=["key"], left_ts="ts",
                value_cols=["v"], segment_width=width,
            ).collect()
        }
        assert seg == base, f"segment_width={width}"


def test_asof_join_segmented_randomized_vs_pandas(spark):
    import random

    rng = random.Random(7)
    lrows = [(i, "k%d" % rng.randrange(4), float(rng.randrange(500)))
             for i in range(200)]
    rrows = sorted(
        {("k%d" % rng.randrange(4), float(rng.randrange(500)))
         for _ in range(120)}
    )
    left = spark.createDataFrame(lrows, "id long, key string, ts double")
    right = spark.createDataFrame(
        [(k, t, t * 10.0) for k, t in rrows],
        "key string, ts double, v double",
    )
    got = (
        asof_join(left, right, on=["key"], left_ts="ts",
                  value_cols=["v"], segment_width=50.0, tolerance=100.0)
        .orderBy("id").toPandas()
    )
    lp = left.toPandas().sort_values("ts", kind="stable")
    rp = right.toPandas().sort_values("ts", kind="stable")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward",
        tolerance=100.0,
    ).sort_values("id").reset_index(drop=True)
    for _, e in exp.iterrows():
        g = got[got["id"] == e["id"]].iloc[0]
        if pd.isna(e["v"]):
            assert g["v"] is None or pd.isna(g["v"])
        else:
            assert g["v"] == e["v"]


def test_asof_join_segmented_partitions_by_segment(spark):
    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, on=["key"], left_ts="ts", value_cols=["v"],
        segment_width=10.0,
    )._jdf.queryExecution().executedPlan().toString()
    # the big window must hash-partition on (key, __seg__) so a hot
    # key's history is spread across its time segments
    assert "__seg__" in plan
    assert "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError):
        asof_join(left, right, on=["key"], left_ts="ts",
                  value_cols=["v"], segment_width=0.0)


def test_asof_join_auto_segment_width(spark):
    """segment_width="auto" (VERDICT r4 item 8): result-identical to the
    unsegmented plan, and the width derivation follows the documented
    policy — None below the hot threshold, span·target/count above it."""
    from anomaly_detector_faironchain_spark.operators.temporal import (
        _auto_segment_width,
    )

    left, right = _asof_frames(spark)
    base = {
        (r["id"], r["v"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", value_cols=["v"]
        ).collect()
    }
    auto = {
        (r["id"], r["v"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", value_cols=["v"],
            segment_width="auto",
        ).collect()
    }
    assert auto == base
    # tiny keys: auto must decline to segment
    assert _auto_segment_width(
        left, right, ["key"], "ts", "ts", "double") is None
    # one hot key (600 rows > 4*100) over span 10000 -> width 10000*100/600
    hot_l = spark.range(600).select(
        F.lit("hot").alias("key"),
        (F.col("id") * (10000.0 / 599)).alias("ts"),
    )
    hot_r = spark.createDataFrame(
        [("hot", 0.0, 1.0)], "key string, ts double, v double")
    w = _auto_segment_width(
        hot_l, hot_r, ["key"], "ts", "ts", "double",
        target_rows=100, hot_factor=4)
    assert w is not None and abs(w - 10000.0 * 100 / 601) < 1.0
    # a key whose rows share one timestamp is unsplittable -> None
    flat = spark.range(600).select(
        F.lit("flat").alias("key"), F.lit(5.0).alias("ts"))
    assert _auto_segment_width(
        flat, hot_r, ["key"], "ts", "ts", "double",
        target_rows=100, hot_factor=4) is None
    # auto parity on a randomized skewed fixture with a genuinely hot key
    import random

    rng = random.Random(11)
    lrows = [(i, "hot" if i % 2 else "k%d" % rng.randrange(5),
              float(rng.randrange(2000)))
             for i in range(900)]
    rrows = sorted({("hot" if rng.random() < 0.5
                     else "k%d" % rng.randrange(5),
                     float(rng.randrange(2000))) for _ in range(400)})
    bl = spark.createDataFrame(lrows, "id long, key string, ts double")
    br = spark.createDataFrame([(k, t, t + 0.5) for k, t in rrows],
                               "key string, ts double, v double")
    plain = {(r["id"], r["v"], r["ts_asof"]) for r in asof_join(
        bl, br, on=["key"], left_ts="ts", value_cols=["v"]).collect()}
    seg = {(r["id"], r["v"], r["ts_asof"]) for r in asof_join(
        bl, br, on=["key"], left_ts="ts", value_cols=["v"],
        segment_width="auto").collect()}
    assert seg == plain
    with pytest.raises(ValueError, match="auto"):
        asof_join(left, right, on=["key"], left_ts="ts",
                  value_cols=["v"], segment_width="AUTO-ish")


def test_interval_join_matches_naive_pairs(spark):
    ev = spark.createDataFrame(
        [
            (i, "u%d" % (i % 3), float(i * 7 % 50), float(i))
            for i in range(60)
        ],
        "event_id long, user string, ts double, value double",
    )
    right = ev.select(
        F.col("event_id").alias("r_event_id"),
        "user",
        F.col("ts").alias("r_ts"),
    )
    got = {
        (r["event_id"], r["r_event_id"])
        for r in interval_join(
            ev, right, on=["user"], left_ts="ts", right_ts="r_ts",
            lower=0.0, upper=10.0,
        ).collect()
    }
    rows = ev.collect()
    exp = {
        (a["event_id"], b["event_id"])
        for a in rows for b in rows
        if a["user"] == b["user"] and a["ts"] < b["ts"] <= a["ts"] + 10.0
    }
    assert got == exp


def test_interval_join_narrow_buckets_same_result(spark):
    ev = spark.createDataFrame(
        [(i, float(i % 17), float(i)) for i in range(40)],
        "event_id long, ts double, value double",
    )
    right = ev.select(
        F.col("event_id").alias("rid"), F.col("ts").alias("r_ts")
    )
    kw = dict(on=[], left_ts="ts", right_ts="r_ts", lower=1.0, upper=5.0)
    a = {(r["event_id"], r["rid"]) for r in
         interval_join(ev, right, **kw).collect()}
    b = {(r["event_id"], r["rid"]) for r in
         interval_join(ev, right, bucket_width=2.0, **kw).collect()}
    assert a == b and a  # non-empty and bucket-width independent


def test_interval_join_is_hash_join_not_nested_loop(spark):
    ev = spark.createDataFrame(
        [(i, "u", float(i)) for i in range(10)],
        "event_id long, user string, ts double",
    )
    right = ev.select(F.col("event_id").alias("rid"), "user",
                      F.col("ts").alias("r_ts"))
    plan = interval_join(
        ev, right, on=["user"], left_ts="ts", right_ts="r_ts",
        lower=0.0, upper=3.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_hll_sketch_estimates_and_merge(spark):
    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("part"),
        F.col("id").alias("k_unique"),
        (F.col("id") % 100).alias("k_dup"),
    )
    sk = hll_partition_sketches(df, ["k_unique"], "part")
    rows = {r["partition_id"]: r for r in sk.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["n_rows"] == n // 4
        assert abs(r["distinct_estimate"] - r["n_rows"]) < 0.1 * r["n_rows"]
    merged = merge_sketches(sk).collect()[0]
    assert merged["n_partitions"] == 4
    assert abs(merged["distinct_estimate"] - n) < 0.1 * n

    dup = merge_sketches(
        hll_partition_sketches(df, ["k_dup"], "part")
    ).collect()[0]
    assert abs(dup["distinct_estimate"] - 100) < 15


def test_checkpoint_sketches_merge_across_runs(spark, tmp_path):
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        corpus_distinct_estimate,
        write_key_sketches,
    )

    out = str(tmp_path / "ckpt")
    run1 = spark.range(1000).select(
        F.lit("p0").alias("part"), F.col("id").alias("k")
    )
    # run 2 covers NEW partitions with keys overlapping run 1's
    run2 = spark.range(500, 2000).select(
        F.concat(F.lit("p"), (F.col("id") % 3 + 1).cast("string"))
        .alias("part"),
        F.col("id").alias("k"),
    )
    write_key_sketches(run1, ["k"], "part", out, run_id="r1")
    write_key_sketches(run2, ["k"], "part", out, run_id="r2")

    got = corpus_distinct_estimate(spark, out).collect()[0]
    assert got["n_partitions"] == 4
    assert got["n_rows"] == 2500
    # true distinct keys = 2000 (0..1999); union estimate within HLL error
    assert abs(got["distinct_estimate"] - 2000) < 0.1 * 2000


def test_checkpoint_sketches_revalidated_partition_uses_latest(spark, tmp_path):
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        corpus_distinct_estimate,
        write_key_sketches,
    )

    out = str(tmp_path / "ckpt2")
    old = spark.range(100).select(F.lit("p0").alias("part"),
                                  F.col("id").alias("k"))
    new = spark.range(1000).select(F.lit("p0").alias("part"),
                                   F.col("id").alias("k"))
    write_key_sketches(old, ["k"], "part", out, run_id="r1")
    write_key_sketches(new, ["k"], "part", out, run_id="r2")
    got = corpus_distinct_estimate(spark, out).collect()[0]
    # only the r2 sketch for p0 counts — not the union of both runs' rows
    assert got["n_partitions"] == 1
    assert got["n_rows"] == 1000
    assert abs(got["distinct_estimate"] - 1000) < 100


# -- mergeable KLL length-quantile sketches ---------------------------------

def test_kll_sketches_exact_at_small_n(spark):
    from anomaly_detector_faironchain_spark.operators.stats import (
        kll_partition_sketches,
        kll_quantiles,
    )

    # 4 partitions x 250 values each — well under k, so the sketch is in
    # exact mode and quantile(q) is the order statistic at rank ceil(q*n)
    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("part"),
        # deterministic scramble so per-partition values aren't sorted
        F.xxhash64("id").alias("v"),
    )
    sk = kll_partition_sketches(df, F.col("v"), "part", k=8192)
    got = {
        r["partition_id"]: r
        for r in kll_quantiles(sk, (0.5, 0.95, 0.99), k=8192).collect()
    }
    rows = df.collect()
    import math

    for p in ("0", "1", "2", "3"):
        vs = sorted(r["v"] for r in rows if r["part"] == p)
        n = len(vs)
        assert got[p]["n_rows"] == n == 250
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            assert got[p][col] == vs[math.ceil(q * n) - 1], (p, col)


def test_kll_merge_equals_direct_sketch(spark):
    from anomaly_detector_faironchain_spark.operators.stats import (
        kll_partition_sketches,
        kll_quantiles,
    )

    df = spark.range(2000).select(
        (F.col("id") % 8).cast("string").alias("part"),
        F.xxhash64("id", F.lit(7)).alias("v"),
    )
    sk = kll_partition_sketches(df, F.col("v"), "part", k=8192)
    merged = kll_quantiles(sk, (0.5, 0.95), merged=True, k=8192).collect()[0]
    direct = kll_quantiles(
        kll_partition_sketches(
            df.withColumn("part", F.lit("all")), F.col("v"), "part", k=8192
        ),
        (0.5, 0.95),
        k=8192,
    ).collect()[0]
    assert merged["n_rows"] == direct["n_rows"] == 2000
    assert merged["n_sketches"] == 8
    assert merged["p50"] == direct["p50"]
    assert merged["p95"] == direct["p95"]


def test_checkpoint_value_sketches_across_runs(spark, tmp_path):
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        corpus_value_quantiles,
        write_value_sketches,
    )
    import math

    out = str(tmp_path / "vk")
    # run 1: partition p0 with SMALL values; run 2: new partitions with
    # LARGE values + a re-validation of p0 (latest sketch must win)
    run1 = spark.range(400).select(
        F.lit("p0").alias("part"), F.col("id").alias("v")
    )
    run2 = spark.range(400, 1200).select(
        F.concat(F.lit("p"), (F.col("id") % 2 + 1).cast("string"))
        .alias("part"),
        F.col("id").alias("v"),
    )
    run3_revalidate_p0 = spark.range(400).select(
        F.lit("p0").alias("part"), (F.col("id") + 10_000).alias("v")
    )
    write_value_sketches(run1, F.col("v"), "part", out, run_id="r1")
    write_value_sketches(run2, F.col("v"), "part", out, run_id="r2")
    write_value_sketches(run3_revalidate_p0, F.col("v"), "part", out,
                         run_id="r3")

    got = corpus_value_quantiles(spark, out).collect()[0]
    # latest p0 sketch (10000..10399) + run2 (400..1199): 1200 values
    assert got["n_rows"] == 1200
    assert got["n_sketches"] == 3
    vs = sorted(list(range(400, 1200)) + list(range(10_000, 10_400)))
    assert got["p50"] == vs[math.ceil(0.5 * len(vs)) - 1]
    assert got["p99"] == vs[math.ceil(0.99 * len(vs)) - 1]
