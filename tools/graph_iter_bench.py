"""Scale check for the iterative graph kernels: connected components and
PageRank on a synthetic multi-million-edge graph.

Corpus: a chain-of-clusters graph — `n_comp` disjoint communities, each
an expander-ish random cluster — so CC has real work (many components,
non-trivial diameter inside each) and PageRank has skew (each cluster
has a hub). Deterministic (hash-derived edges, no RNG).

Usage: python tools/graph_iter_bench.py [n_edges] [kernel]
  kernel: cc | pagerank | both (default both)
Prints one JSON line per kernel with wall seconds and result invariants
(component count / rank mass) so a rerun can diff correctness too.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from anomaly_detector_faironchain_spark.operators import graph  # noqa: E402
from anomaly_detector_faironchain_spark.session import get_spark  # noqa: E402


def build_edges(spark, n_edges: int, n_comp: int = 1000):
    """Deterministic clustered graph: edge i joins two pseudo-random
    members of community (i % n_comp); node space ~ n_edges / 4."""
    per_comp = max(n_edges // (4 * n_comp), 2)
    return spark.range(n_edges).select(
        F.concat(
            F.lit("c"), (F.col("id") % n_comp), F.lit("_"),
            F.abs(F.xxhash64("id")) % per_comp,
        ).alias("src"),
        F.concat(
            F.lit("c"), (F.col("id") % n_comp), F.lit("_"),
            F.abs(F.xxhash64(F.col("id") + 1_000_000_000)) % per_comp,
        ).alias("dst"),
    )


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    kernel = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark("graph-iter-bench", cores=32, shuffle_partitions=64)
    edges = build_edges(spark, n_edges)
    edges.write.mode("overwrite").parquet("/tmp/graph_iter_bench_edges")
    edges = spark.read.parquet("/tmp/graph_iter_bench_edges")

    if kernel in ("cc", "both"):
        t0 = time.time()
        cc = graph.connected_components(edges, max_iter=25)
        row = cc.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.countDistinct("component").alias("components"),
        ).collect()[0]
        print(json.dumps({
            "kernel": "connected_components", "edges": n_edges,
            "nodes": row.nodes, "components": row.components,
            "wall_sec": round(time.time() - t0, 2),
        }))

    if kernel in ("pagerank", "both"):
        t0 = time.time()
        pr = graph.pagerank(edges, n_iter=5)
        row = pr.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.sum("pagerank").alias("mass"),
            F.max("pagerank").alias("max_pr"),
        ).collect()[0]
        print(json.dumps({
            "kernel": "pagerank", "edges": n_edges, "iters": 5,
            "nodes": row.nodes, "mass": round(row.mass, 9),
            "max_pr": round(row.max_pr, 9),
            "wall_sec": round(time.time() - t0, 2),
        }))


if __name__ == "__main__":
    main()
