"""Stage-level wall-clock profile of the EP2 anomaly-analysis pipeline.

Times each *driver action* of run_anomaly_analysis separately on the bench
corpus (2M transfers / 20k accounts, same fixture bench.py uses), so the
76 s EP2 bench number can be attributed: edge aggregation, fused feature
join (motifs dominate), fused threshold+z stats, Mahalanobis covariance,
iforest fit + Arrow scoring, the rank layer, and the two localCheckpoints.

Usage:  python tools/ep2_profile.py [--runs N]
Prints one JSON line per stage plus a total; run only in a quiet window
(cpu canary stamped, like bench.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    import bench
    from anomaly_detector_faironchain_spark.analysis import pipeline
    from anomaly_detector_faironchain_spark.operators import (
        graph, iforest, mahalanobis, scoring,
    )

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("ep2-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    canary0 = bench.cpu_canary(int(cores))
    tag = f"/tmp/bench_transfers/r{bench.TRANSFER_ROWS}_v2"
    tt = spark.read.parquet(tag)
    tt.count()  # warm FS cache

    if "--warm" in sys.argv:
        # one full warm-up pass so the timed pass sees a JIT-warm JVM and
        # page-cached parquet, matching bench.py's warm-up + timed protocol
        res = pipeline.run_anomaly_analysis(
            tt, min_amount=1e12, iforest_params={"max_samples": 2048})
        res.count()

    stages: dict[str, float] = {}

    def tick(name: str, t0: float) -> float:
        now = time.time()
        stages[name] = round(now - t0, 3)
        return now

    t0 = time.time()
    edges = pipeline.build_edges(tt, None, 1e12, None).cache()
    edges.count()
    t0 = tick("edges_build_warm", t0)

    feats = pipeline.features_from_edges(edges)
    infra = []
    feats = feats.withColumn("is_infra", F.col("address").isin(infra).cast("int"))
    base = pipeline.add_log_features(
        feats.filter(F.col("is_infra") == 0)).cache()
    t, zstats = pipeline.fused_threshold_and_z_stats(base)
    t0 = tick("features_plus_fused_stats", t0)

    work = pipeline.heuristic_rules(base, t)
    work = pipeline.apply_z(work, zstats)
    zcols = [f"{c}_z" for c in pipeline.Z_FEATURES]
    work = mahalanobis.mahalanobis(work, zcols, "mahalanobis_distance")
    work.count()  # isolate: this action re-reads `base` cache + covar pass
    t0 = tick("rules_z_mahalanobis", t0)

    model = iforest.fit_iforest(work, zcols, n_estimators=300,
                                max_samples=2048, seed=42)
    t0 = tick("iforest_fit", t0)

    work = iforest.score_iforest(work, zcols, model)
    work = work.localCheckpoint(eager=True)
    t0 = tick("score_and_checkpoint", t0)

    work = scoring.hazen_percentile_agg(
        work, "iforest_score", "iforest_stats_score_100")
    work = pipeline.score(work, ["iforest_stats_score_100"])
    drop = [c for c in work.columns
            if c.endswith("_log") or c.endswith("_z") or c.endswith("_ratio")]
    work = work.drop(*drop)
    infra_rows = feats.filter(F.col("is_infra") == 1)
    out = work.unionByName(infra_rows, allowMissingColumns=True)
    out = out.localCheckpoint(eager=True)
    n = out.count()
    t0 = tick("rank_layer_and_final", t0)

    base.unpersist()
    edges.unpersist()
    canary1 = bench.cpu_canary(int(cores))
    print(json.dumps({
        "stages": stages,
        "total_sec": round(sum(stages.values()), 3),
        "rows_out": n,
        "cores": cores,
        "canary_pre_mips": canary0,
        "canary_post_mips": canary1,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
