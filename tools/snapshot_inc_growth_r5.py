import json, shutil, sys, time
sys.path.insert(0, "/root/repo")
import bench
from anomaly_detector_faironchain_spark.plans.snapshots import SnapshotTable, validate_new_snapshots
from anomaly_detector_faironchain_spark.session import get_spark
from anomaly_detector_faironchain_spark.specs import north_rule_spec

spark = get_spark("snap-inc2", cores=32,
                  extra_conf={"spark.driver.memory": "52g",
                              "spark.sql.files.maxPartitionBytes": "33554432"})
FIX = "/tmp/bench_source_files/r64000000_l6_15"
df = spark.read.parquet(f"{FIX}/input"); repos = spark.read.parquet(f"{FIX}/repos")
snap, ckpt = "/tmp/snap_inc2", "/tmp/snap_inc2_ckpt"
shutil.rmtree(snap, ignore_errors=True); shutil.rmtree(ckpt, ignore_errors=True)
t = SnapshotTable.create(snap)
spec = north_rule_spec()
def timed(fn):
    t0 = time.time(); fn(); return round(time.time() - t0, 2)
pre = bench.cpu_canary(32)
a0 = timed(lambda: t.append(df.limit(32_000_000)))
v0 = timed(lambda: validate_new_snapshots(spark, t, spec, ckpt, refs={"repos": repos}))
a1 = timed(lambda: t.append(df.limit(8_000_000)))
v1 = timed(lambda: validate_new_snapshots(spark, t, spec, ckpt, refs={"repos": repos}))
a2 = timed(lambda: t.append(df.limit(8_000_000)))
v2 = timed(lambda: validate_new_snapshots(spark, t, spec, ckpt, refs={"repos": repos}))
post = bench.cpu_canary(32)
out = {"what": "same 8M increment validated twice while the table grows 32M->40M->48M",
       "append_base_sec": a0, "validate_base_32M_sec": v0,
       "validate_inc1_8M_table40M_sec": v1, "validate_inc2_8M_table48M_sec": v2,
       "append_inc_secs": [a1, a2],
       "inc_cost_table_size_independent": v2 <= v1 * 1.25,  # one-sided:
       # table-proportional cost would GROW with the table
       "fixed_overhead_estimate_sec": round(v1 - v0 * 8 / 32, 1),
       "canary_pre_mips": pre, "canary_post_mips": post}
shutil.rmtree(snap, ignore_errors=True); shutil.rmtree(ckpt, ignore_errors=True)
json.dump(out, open("/root/repo/BENCH/snapshot_inc_growth_r5.json", "w"), indent=2)
print(json.dumps(out))
