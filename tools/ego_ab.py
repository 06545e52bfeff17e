"""Interleaved A/B: egonet m-count expanding every edge through dst
(round-2 shape) vs routing each edge through its smaller-degree endpoint.
Same cached edgelist, alternating runs in one session.

Usage: python tools/ego_ab.py [reps] [bench|skew|both]
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

from tri_ab import FIXTURE, skewed_edges  # noqa: E402

ARMS = {
    "via_dst": lambda e: graph.egonet_features(e, method="expand", route_by_degree=False),
    "min_degree_route": lambda e: graph.egonet_features(e, method="expand", route_by_degree=True),
    "wedge": lambda e: graph.egonet_features(e, method="wedge"),
}


def run_arm(edges, reps: int) -> dict:
    def timed(fn):
        t0 = time.time()
        out = fn(edges).agg(
            F.sum("ego_n").alias("n"), F.sum("ego_m").alias("m"),
            F.round(F.sum("ego_density"), 4).alias("d"),
        ).collect()[0]
        return time.time() - t0, (out.n, out.m, float(out.d))

    for fn in ARMS.values():
        timed(fn)
    runs: dict[str, list[float]] = {k: [] for k in ARMS}
    checks = set()
    for _ in range(reps):
        for name, fn in ARMS.items():
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark("ego_ab", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
