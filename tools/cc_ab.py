"""Interleaved A/B of connected_components min strategies (agg vs
window) on two corpora:

  * uniform — the 1000-community clustered graph from graph_iter_bench
    (no hubs; measures the agg strategy's extra-exchange premium);
  * skew — one giant star (hub → half the edges) over the same node
    space (measures the window strategy's single-task-hub penalty).

Same-session, interleaved, min-of-repeats — the only trustworthy
comparison on this host (see BENCH/BASELINE.md variance warning).
Asserts both strategies produce the identical (node count, component
count, label checksum) before timing counts.

Usage: python tools/cc_ab.py [n_edges] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from anomaly_detector_faironchain_spark.operators import graph  # noqa: E402
from anomaly_detector_faironchain_spark.session import get_spark  # noqa: E402
from tools.graph_iter_bench import build_edges  # noqa: E402


def build_skew_edges(spark, n_edges: int):
    """Half the edges fan out of one hub; the rest are scattered chains.
    The hub's component swallows ~half the node space."""
    half = n_edges // 2
    star = spark.range(half).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("s"), F.abs(F.xxhash64("id")) % (half // 2)).alias("dst"),
    )
    chains = spark.range(half).select(
        F.concat(F.lit("t"), F.col("id") % (half // 4)).alias("src"),
        F.concat(F.lit("t"), (F.col("id") + 1) % (half // 4)).alias("dst"),
    )
    return star.union(chains)


def signature(result):
    row = result.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("c"),
        F.sum(F.xxhash64("id", "component").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row.n, row.c, int(row.h))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("cc-ab", cores=32, shuffle_partitions=64)
    corpora = {}
    for name, df in (
        ("uniform", build_edges(spark, n_edges)),
        ("skew", build_skew_edges(spark, n_edges)),
    ):
        path = f"/tmp/cc_ab_{name}"
        df.write.mode("overwrite").parquet(path)
        corpora[name] = spark.read.parquet(path)

    sigs = {}
    times = {}
    for r in range(repeats):
        for corpus, edges in corpora.items():
            for strat in ("agg", "window"):
                t0 = time.time()
                res = graph.connected_components(edges, min_strategy=strat)
                sig = signature(res)
                dt = round(time.time() - t0, 2)
                key = (corpus, strat)
                times.setdefault(key, []).append(dt)
                prev = sigs.setdefault(corpus, sig)
                assert prev == sig, f"strategies disagree on {corpus}: {prev} vs {sig}"
                print(json.dumps({
                    "corpus": corpus, "strategy": strat, "repeat": r,
                    "edges": n_edges, "nodes": sig[0], "components": sig[1],
                    "wall_sec": dt,
                }), flush=True)
    for (corpus, strat), ts in sorted(times.items()):
        print(json.dumps({
            "summary": f"{corpus}/{strat}", "min_sec": min(ts), "all": ts,
        }))


if __name__ == "__main__":
    main()
