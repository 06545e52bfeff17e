"""Round-5 dense-graph guard audit (VERDICT r4 item 2 done-criterion).

Re-runs the EXACT fixture that aborted in the round-4 scale audit —
20M transfers over a FIXED 20k accounts (degree ~1000, wedge volume
~100× the density-constant case; BENCH/scale_sf1_r4.json
`ep2_transfers_20M.dense_20M_20k_accounts_attempt` filled >60 GB of
wedge shuffle and died) — through the full EP2 pipeline with the new
automatic wedge guard, and records:

  * the guard's decision ladder (estimates per rung, hubs excluded);
  * wall time and completion (verdict-row counts);
  * the disk high-water mark (min free bytes sampled every 5 s), the
    quantity the unguarded run exhausted.

Usage:  python tools/dense_guard_audit_r5.py [wedge_budget]
Writes BENCH/dense_guard_r5.json. Run alone (no concurrent Spark jobs —
see the bench protocol notes in BASELINE.md).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

os.environ["BENCH_TRANSFER_ROWS"] = "20000000"
os.environ["BENCH_TRANSFER_ACCOUNTS"] = "20000"

WEDGE_BUDGET = int(float(sys.argv[1])) if len(sys.argv) > 1 else 200_000_000


def main() -> None:
    import bench
    from anomaly_detector_faironchain_spark.analysis import pipeline
    from anomaly_detector_faironchain_spark.etl import abstract, rawgen
    from anomaly_detector_faironchain_spark.session import get_spark

    spark = get_spark(
        "dense-guard-audit", cores=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "33554432",
                    "spark.driver.memory": "52g"},
    )
    rows, accounts = 20_000_000, 20_000
    tag = f"/tmp/bench_transfers/r{rows}_a{accounts}_v2"
    try:
        tt = spark.read.parquet(tag)
        if tt.count() != rows:
            raise ValueError("stale fixture")
    except Exception:  # noqa: BLE001 — (re)build
        shutil.rmtree(tag, ignore_errors=True)
        rt = rawgen.raw_native_transfers(
            spark, rows, rows // 50, n_accounts=accounts,
            shared_account_space=True,
        )
        abstract.build_abstract_token_transfer(
            abstract.clean_native_transfers(rt)
        ).write.parquet(tag)
        tt = spark.read.parquet(tag)

    free0 = shutil.disk_usage("/tmp").free
    low = [free0]
    stop = threading.Event()

    def watch() -> None:
        while not stop.is_set():
            low[0] = min(low[0], shutil.disk_usage("/tmp").free)
            stop.wait(5)

    th = threading.Thread(target=watch, daemon=True)
    th.start()

    reports: list[dict] = []
    pre = bench.cpu_canary(32)
    t0 = time.time()
    res = pipeline.run_anomaly_analysis(
        tt, min_amount=1e12, include_iforest=True,
        iforest_params={"max_samples": 2048},
        wedge_budget=WEDGE_BUDGET, on_guard=reports.append,
    )
    n_total = res.count()
    n_excl = res.filter("motif_excluded = 1").count()
    n_scored = res.filter(
        "motif_excluded = 0 AND final_score_0_100 IS NOT NULL").count()
    sec = time.time() - t0
    stop.set()
    th.join()
    post = bench.cpu_canary(32)

    out = {
        "what": ("EP2 on the r4-abort fixture (20M transfers, FIXED 20k "
                 "accounts, degree ~1000) WITH the automatic wedge guard "
                 "(run_anomaly_analysis wedge_budget)"),
        "r4_unguarded_outcome":
            "aborted: wedge shuffle filled all free disk (>60 GB) "
            "(BENCH/scale_sf1_r4.json)",
        "wedge_budget_rows": WEDGE_BUDGET,
        "sec": round(sec, 2),
        "transfers_per_sec": round(rows / sec, 1),
        "result_rows": n_total,
        "hub_excluded_rows": n_excl,
        "scored_rows": n_scored,
        "guard_report": reports[0] if reports else None,
        "disk_free_before_bytes": free0,
        "disk_free_low_water_bytes": low[0],
        "disk_consumed_peak_gib": round((free0 - low[0]) / 2**30, 2),
        "canary_pre_mips": pre,
        "canary_post_mips": post,
    }
    with open("/root/repo/BENCH/dense_guard_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
