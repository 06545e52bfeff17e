"""Interleaved A/B: the three standalone motif kernels (mutual-pair
self-join + triangle wedge + egonet wedge, left-joined per node — the
round-3 pre-fusion EP2 shape) vs graph.fused_motif_features (ONE pair
aggregation + ONE wedge enumeration serving all three).

Same cached edgelist, alternating runs in one session, identical-output
check via a full-frame checksum, CPU-canary stamps before/after so a
degraded host window is self-evident (BENCH/BASELINE.md protocol).

Usage: python tools/fused_ab.py [reps] [bench|skew|both]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anomaly_detector_faironchain_spark.analysis import pipeline  # noqa: E402
from anomaly_detector_faironchain_spark.operators import graph  # noqa: E402
from anomaly_detector_faironchain_spark.session import get_spark  # noqa: E402

from bench import cpu_canary  # noqa: E402
from tri_ab import FIXTURE, skewed_edges  # noqa: E402


def separate(edges):
    mutual = graph.mutual_pair_features(edges)
    tri = graph.triangle_features(edges)
    ego = graph.egonet_features(edges, method="wedge")
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst"))).distinct()
    return (
        nodes.join(mutual, "node", "left")
        .join(tri.withColumnRenamed("node", "n2"),
              F.col("n2") == F.col("node"), "left").drop("n2")
        .join(ego.withColumnRenamed("node", "n3"),
              F.col("n3") == F.col("node"), "left").drop("n3")
        .na.fill(0)
    )


def fused(edges):
    return graph.fused_motif_features(edges)


def fused_smj(edges):
    return graph.fused_motif_features(edges, join_strategy="smj")


_DICT_CACHE = []  # pinned dict frames, released by main() at exit


def fused_intids(edges):
    """Vertex-dictionary arm: encode string sids to int64 ids, run the
    fused kernel over the int edgelist (3 join keys drop ~30B→8B through
    the wedge shuffle, hash probes compare longs), decode per-node output.
    The dict MUST be materialized before reuse (monotonically_increasing_id
    is plan-layout-dependent — recomputation could mint different ids per
    branch)."""
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst"))).distinct()
    dic = nodes.withColumn("nid", F.monotonically_increasing_id()).cache()
    dic.count()
    _DICT_CACHE.append(dic)
    enc = (
        edges
        .join(F.broadcast(dic.select(F.col("node").alias("src"),
                                     F.col("nid").alias("__si__"))), "src")
        .join(F.broadcast(dic.select(F.col("node").alias("dst"),
                                     F.col("nid").alias("__di__"))), "dst")
        .select(F.col("__si__").alias("src"), F.col("__di__").alias("dst"),
                "amount", "cnt")
    )
    out = graph.fused_motif_features(enc)
    return (
        out.withColumnRenamed("node", "nid")
        .join(F.broadcast(dic), "nid")
        .drop("nid")
    )


ARMS = {"separate": separate, "fused": fused, "fused_smj": fused_smj,
        "fused_intids": fused_intids}

CHECK_COLS = [
    "two_node_loop_count", "two_node_loop_amount", "two_node_loop_tx",
    "triangle_count", "triangle_amount", "triangle_tx",
    "ego_n", "ego_m", "ego_density",
]


def run_arm(edges, reps: int) -> dict:
    def timed(fn):
        t0 = time.time()
        # %.9e formatting makes the checksum insensitive to the last-ulp
        # float-summation-order differences between the two plans
        out = fn(edges).agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.format_string("%.9e", F.sum(c).cast("double")).alias(c)
              for c in CHECK_COLS],
        ).collect()[0]
        return time.time() - t0, tuple(out)

    for fn in ARMS.values():
        timed(fn)  # warm both plans / caches
    runs: dict[str, list[float]] = {k: [] for k in ARMS}
    checks = set()
    for _ in range(reps):
        for name, fn in ARMS.items():
            t, c = timed(fn)
            runs[name].append(round(t, 2))
            checks.add(c)
    out = {"results_agree": len(checks) == 1}
    for name, ts in runs.items():
        out[name] = {"sec": ts, "min": min(ts)}
    if len(checks) != 1:
        out["totals"] = sorted(str(c) for c in checks)
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {"canary_pre_mips": cpu_canary(cpus)}
    spark = get_spark("fused_ab", cores=cpus)
    if which in ("bench", "both"):
        tt = spark.read.parquet(FIXTURE)
        edges = pipeline.build_edges(tt, None, min_amount=1e12).cache()
        out["bench_corpus"] = {"n_edges": edges.count(), **run_arm(edges, reps)}
        edges.unpersist()
    if which in ("skew", "both"):
        edges = skewed_edges(spark).cache()
        out["skewed_corpus"] = {"n_edges": edges.count(), **run_arm(edges, reps)}
        edges.unpersist()
    for d in _DICT_CACHE:
        d.unpersist()
    out["canary_post_mips"] = cpu_canary(cpus)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
