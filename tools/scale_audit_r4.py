"""Round-4 scale audit (VERDICT r3 item 2): run the flagship surfaces at a
scale that can actually break them, not just the sf0.1 bench size.

Three phases, each in its own subprocess (fresh JVM, heap sized for the
phase), canary-stamped so a degraded host window is self-evident:

  A. north-rule suite at 20M rows (10x the bench fixture — "sf1.0")
  B. EP2 analysis pipeline at 20M transfers (10x the bench fixture)
  C. north-rule suite over a 64M-row HEAVY corpus (log-uniform 64..16k
     char bodies, ~25 GB parquet / ~330 GB of text — 4x the r3 audit's
     largest). 64M not the verdict's aspirational 160M because the
     sandbox disk has 73 GB free and the fixture+shuffle must share it;
     the briefing point (emergent spill/broadcast/AQE behavior) is
     already exercised at 64M, where the violation scan alone moves
     ~330 GB of decompressed text through the fused row pass.

Each phase also snapshots the physical-plan shape (scan/exchange/join
operator counts) of the fused profile pass at the LARGE size and at the
small reference size: the "plans audit clean at sf0.1" claim is only
worth something if the same shapes survive the scale-up (AQE may legally
re-plan sort-merge joins to broadcast, never the reverse).

Usage: python tools/scale_audit_r4.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # canary + ceiling

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scale_sf1_r4.json"

SUITE_WORKER = r"""
import json, re, sys, time
sys.path.insert(0, ".")
from anomaly_detector_faironchain_spark.session import get_spark
from anomaly_detector_faironchain_spark.datagen import source_files as gen
from anomaly_detector_faironchain_spark.operators import stats
from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.specs import north_rule_spec

rows, lo, hi = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(f"audit-suite-{rows}", cores=32,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "33554432",
                              "spark.driver.memory": "52g"})
tag = f"/tmp/bench_source_files/r{rows}_l{lo}_{hi}"
try:
    df = spark.read.parquet(f"{tag}/input")
    repos = spark.read.parquet(f"{tag}/repos")
    assert df.count() == rows
except Exception:
    import shutil
    shutil.rmtree(tag, ignore_errors=True)
    t0 = time.time()
    files = gen.generate_source_files(spark, rows, seed=42,
                                      len_exp_lo=lo, len_exp_hi=hi)
    man = gen.manifest(files)
    repos_df, _ = gen.companion_dims(files)
    files.join(man, "file_sid").repartition(256).write.parquet(f"{tag}/input")
    repos_df.write.parquet(f"{tag}/repos")
    print(json.dumps({"event": "generated", "sec": round(time.time() - t0, 1)}),
          file=sys.stderr)
    df = spark.read.parquet(f"{tag}/input")
    repos = spark.read.parquet(f"{tag}/repos")

def plan_shape(d):
    p = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted")
    return {k: len(re.findall(rf"^\(\d+\) {k}", p, re.M)) for k in
            ("Scan parquet", "Exchange", "BroadcastHashJoin",
             "SortMergeJoin", "ShuffledHashJoin", "HashAggregate",
             "ObjectHashAggregate", "WindowExec")}

shape = plan_shape(stats.profile_table(df, north_rule_spec()))

def run():
    t0 = time.time()
    res = validate_table(df, north_rule_spec(), refs={"repos": repos},
                         materialize_violations=True)
    res.materialize()
    n_verd = res.verdicts.count()
    n_viol = res.violations.count()
    res.unpersist()
    return time.time() - t0, n_verd, n_viol

w, nv, nvi = run()  # warm-up
t, _, _ = run()
best = min(w, t)
print(json.dumps({
    "rows": rows, "sec": round(best, 2),
    "files_per_sec": round(rows / best, 1),
    "warmup_sec": round(w, 2), "timed_sec": round(t, 2),
    "n_verdicts": nv, "n_violations": nvi,
    "profile_plan_shape": shape,
}))
"""

EP2_WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
import os
os.environ["BENCH_TRANSFER_ROWS"] = sys.argv[1]
from anomaly_detector_faironchain_spark.session import get_spark
import bench
spark = get_spark("audit-ep2", cores=32,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "33554432",
                              "spark.driver.memory": "52g"})
sec = bench.bench_analysis_pipeline(spark)
print(json.dumps({"transfer_rows": int(sys.argv[1]), "sec": round(sec, 2),
                  "transfers_per_sec": round(int(sys.argv[1]) / sec, 1)}))
"""


def run_worker(code: str, *args: str, timeout: int = 5400) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=timeout,
    )
    tail = out.stderr[-1500:]
    if out.returncode != 0:
        raise RuntimeError(f"worker failed rc={out.returncode}:\n{tail}")
    events = [l for l in out.stderr.splitlines() if l.startswith('{"event"')]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    if events:
        d["events"] = [json.loads(e) for e in events]
    return d


def main() -> None:
    report: dict = {
        "what": ("round-4 scale audit: flagship suite at 20M rows, EP2 at "
                 "20M transfers, heavy-corpus suite at 64M rows (~330 GB "
                 "text), local[32], fresh JVM per phase"),
        "canary_ceiling_mips": bench.CANARY_CEILING_MIPS,
        "phases": {},
    }
    # one corpus profile (the bench default, log-uniform 64..16k-char
    # bodies), three rungs: the bench-sized reference, 10x ("sf1.0"),
    # and 32x (the can-it-break size)
    phases = [
        ("suite_2M_reference", SUITE_WORKER, ("2000000", "6", "15")),
        ("suite_20M", SUITE_WORKER, ("20000000", "6", "15")),
        ("ep2_transfers_20M", EP2_WORKER, ("20000000",)),
        ("suite_64M", SUITE_WORKER, ("64000000", "6", "15")),
    ]
    for name, worker, args in phases:
        pre = bench.cpu_canary(32)
        t0 = time.time()
        try:
            d = run_worker(worker, *args)
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            d = {"error": str(e)[:2000]}
        post = bench.cpu_canary(32)
        d["canary_pre_mips"] = pre
        d["canary_post_mips"] = post
        d["wall_sec_incl_gen"] = round(time.time() - t0, 1)
        report["phases"][name] = d
        print(f"== {name}: {json.dumps({k: v for k, v in d.items() if k != 'profile_plan_shape'})[:300]}",
              file=sys.stderr)

    # same-shape assertion: the fused profile pass must plan identically
    # at the reference and the 10x/4x sizes (modulo AQE join upgrades)
    shapes = {n: p.get("profile_plan_shape") for n, p in report["phases"].items()
              if p.get("profile_plan_shape")}
    ref = shapes.get("suite_2M_reference")
    report["plan_shape_stable"] = bool(
        ref and shapes.get("suite_20M") == ref
        and shapes.get("suite_64M") == ref
    )
    canaries = [p[k] for p in report["phases"].values()
                for k in ("canary_pre_mips", "canary_post_mips") if k in p]
    report["window_healthy"] = bool(
        canaries and min(canaries) >= 0.75 * bench.CANARY_CEILING_MIPS
    )
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "phases"}))


if __name__ == "__main__":
    main()
