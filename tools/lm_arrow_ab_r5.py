"""LM-scoring Arrow-transfer A/B (VERDICT r4 item 6 done-criterion).

The r4 audit measured the pandas-vectorized cross_entropy_score kernel
at 38M grams/s/core but only 191.6M grams/s in-pipeline over 32 procs —
~83% of wall time was Arrow→pandas string materialization plus the
''.join/encode round-trips. Round 5 replaced the default path with a
mapInArrow kernel that reads the Arrow string buffers directly (the
values buffer IS the concatenated UTF-8 corpus; ASCII chunks use bytes
as codepoints, non-ASCII chunks go through a vectorized UTF-8 decode).

Arms, identical model/work on 200k heavy docs (the r4 audit's fixture):
  arrow        — NEW raw-buffer mapInArrow kernel (the default)
  arrow_pandas — r4 pandas-vectorized kernel (the control)
  arrow_loop   — dict-get loop
Scores must agree exactly (4-dp contract) across all arms — the A/B is
invalid otherwise. Done-criterion: arrow >= 1.5x arrow_pandas.

Usage: python tools/lm_arrow_ab_r5.py [out.json]   (run alone)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH/lm_arrow_ab_r5.json"
DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
FIXTURE = "/tmp/bench_source_files/r2000000_l6_15"


def main() -> None:
    from pyspark.sql import functions as F

    from anomaly_detector_faironchain_spark.operators import text as text_ops
    from anomaly_detector_faironchain_spark.session import get_spark

    spark = get_spark("lm-arrow-ab", cores=32,
                      extra_conf={"spark.driver.memory": "48g"})
    df = spark.read.parquet(f"{FIXTURE}/input")
    sample = df.limit(DOCS).select(
        "file_sid", df["content"].alias("text")
    ).repartition(64).cache()
    sample.count()
    model = text_ops.char_ngram_model(
        sample.limit(20_000).repartition(32), "text", n=3, top_k=50_000)
    total_ngrams = sample.selectExpr(
        "sum(greatest(length(text) - 2, 0)) as n").collect()[0].n

    def run(meth):
        out = text_ops.cross_entropy_score(
            sample, "file_sid", "text", model, n=3, method=meth)
        t0 = time.time()
        n = out.count()
        return time.time() - t0, n

    def checksum(meth):
        out = text_ops.cross_entropy_score(
            sample, "file_sid", "text", model, n=3, method=meth)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(
                "id", "n_ngrams",
                F.round(F.col("bits_per_ngram") * 10_000).cast("long")),
                F.lit(1_000_000_007))).alias("h"),
        ).collect()[0]
        return row.n, row.h

    report = {
        "what": (f"cross_entropy_score n=3 over {DOCS} heavy docs "
                 f"({total_ngrams / 1e6:.0f}M grams), local[32]"),
        "canary_pre_mips": bench.cpu_canary(32),
        "arms": {},
    }
    chks = {}
    for meth in ("arrow", "arrow_pandas", "arrow_loop"):
        run(meth)  # warm
        sec = min(run(meth)[0], run(meth)[0])
        chks[meth] = checksum(meth)
        report["arms"][meth] = {
            "sec": round(sec, 2),
            "mngrams_per_sec": round(total_ngrams / sec / 1e6, 1),
        }
    report["results_identical"] = len(set(chks.values())) == 1
    report["checksums"] = {k: list(v) for k, v in chks.items()}
    a = report["arms"]
    report["arrow_vs_pandas_speedup"] = round(
        a["arrow_pandas"]["sec"] / a["arrow"]["sec"], 2)
    report["arrow_vs_loop_speedup"] = round(
        a["arrow_loop"]["sec"] / a["arrow"]["sec"], 2)
    report["meets_1p5x_target"] = report["arrow_vs_pandas_speedup"] >= 1.5
    report["r4_in_pipeline_mngrams_per_sec_for_comparison"] = 191.6
    report["canary_post_mips"] = bench.cpu_canary(32)
    report["window_healthy"] = (
        min(report["canary_pre_mips"], report["canary_post_mips"])
        >= 0.75 * bench.CANARY_CEILING_MIPS)
    sample.unpersist()
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    assert report["results_identical"], chks


if __name__ == "__main__":
    main()
