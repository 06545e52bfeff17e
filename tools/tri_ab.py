"""Interleaved A/B: id-order pivot-on-b triangle join (round-2 shape)
vs degree-order pivot-on-a (node-iterator-core). Same cached edgelist,
alternating runs in one session so host-variance windows hit both arms.

Usage: python tools/tri_ab.py [reps]
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

FIXTURE = "/tmp/bench_transfers/r2000000_v2"


def triangle_features_old(edges):
    """Round-2 shape: id order, wedge join pivoted on b, early filters."""
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst", "amount", "cnt")
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                  F.col("amount").alias("am1"), F.col("cnt").alias("c1"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"),
                  F.col("amount").alias("am2"), F.col("cnt").alias("c2"))
    e3 = e.select(F.col("src").alias("c"), F.col("dst").alias("a"),
                  F.col("amount").alias("am3"), F.col("cnt").alias("c3"))
    tri = (
        e1.filter(F.col("a") < F.col("b"))
        .join(e2, "b")
        .filter(F.col("a") < F.col("c"))
        .join(e3.filter(F.col("a") < F.col("c")), ["c", "a"])
        .select(
            "a", "b", "c",
            (F.col("am1") + F.col("am2") + F.col("am3")).alias("tri_amount"),
            (F.col("c1") + F.col("c2") + F.col("c3")).alias("tri_tx"),
        )
    )
    exploded = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node"), "tri_amount", "tri_tx"
    )
    return exploded.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangle_count"),
        F.sum("tri_amount").alias("triangle_amount"),
        F.sum("tri_tx").alias("triangle_tx"),
    )


def skewed_edges(spark, n_background: int = 500_000, hub_deg: int = 10_000):
    """Background random graph over 50k nodes + one mega-hub ('zhub',
    deliberately LAST in id order) with hub_deg in- and out-edges. Under
    the old id-order pivot-on-b shape every (a→zhub, zhub→c) pair is a
    wedge — ~hub_deg² = 1e8 intermediate rows; under the degree order
    the hub is the order-MAX vertex and generates no wedges at all."""
    bg = spark.range(n_background).selectExpr(
        "concat('n', cast(id * 2654435761 % 50000 as string)) as src",
        "concat('n', cast((id * 40503 + 7) % 50000 as string)) as dst",
        "1.0 as amount", "id as ts",
    )
    hub_out = spark.range(hub_deg).selectExpr(
        "'zhub' as src",
        "concat('n', cast(id % 50000 as string)) as dst",
        "1.0 as amount", "id as ts",
    )
    hub_in = spark.range(hub_deg).selectExpr(
        "concat('n', cast((id * 3 + 1) % 50000 as string)) as src",
        "'zhub' as dst",
        "1.0 as amount", "id as ts",
    )
    allr = bg.unionAll(hub_out).unionAll(hub_in)
    from anomaly_detector_faironchain_spark.operators import graph as g
    return g.aggregate_edges(allr, "src", "dst", "amount", "ts")


ARMS = {
    "pivot_b_id": triangle_features_old,
    "pivot_a_id": lambda e: graph.triangle_features(e, orientation="id"),
    "pivot_a_degree": lambda e: graph.triangle_features(e, orientation="degree"),
}


def run_arm(edges, reps: int) -> dict:
    def timed(fn):
        t0 = time.time()
        out = fn(edges).agg(
            F.sum("triangle_count").alias("tc"),
            F.sum("triangle_tx").alias("tx"),
        ).collect()[0]
        return time.time() - t0, (out.tc, out.tx)

    for fn in ARMS.values():  # warm every arm (codegen + page cache)
        timed(fn)
    runs: dict[str, list[float]] = {k: [] for k in ARMS}
    checks = set()
    for _ in range(reps):
        for name, fn in ARMS.items():  # interleaved: variance hits all arms
            t, c = timed(fn)
            runs[name].append(round(t, 2))
            checks.add(c)
    out = {
        "results_agree": len(checks) == 1,
        "totals": list(checks)[0] if len(checks) == 1 else sorted(checks),
    }
    for name, ts in runs.items():
        out[name] = {"sec": ts, "min": min(ts)}
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark("tri_ab", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = {}
    if which in ("bench", "both"):
        tt = spark.read.parquet(FIXTURE)
        edges = pipeline.build_edges(tt, None, min_amount=1e12).cache()
        out["bench_corpus"] = {"n_edges": edges.count(), **run_arm(edges, reps)}
        edges.unpersist()
    if which in ("skew", "both"):
        edges = skewed_edges(spark).cache()
        out["skewed_corpus"] = {"n_edges": edges.count(), **run_arm(edges, reps)}
        edges.unpersist()
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
