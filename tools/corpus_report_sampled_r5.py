"""Sampled corpus report timing (VERDICT r4 item 7 done-criterion:
sampled report at 2M heavy rows in <20 s, exact mode unchanged).

Times render_corpus_report on the 2M heavy fixture in three modes:
exact (the r4 shape, 122.5 s in the r4 audit window), sampled 5%, and
sampled 1%. Also cross-checks the sampled header's scaled doc count
against the exact one (should agree within a few SE).

Usage: python tools/corpus_report_sampled_r5.py [out.json]  (run alone)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH/corpus_report_sampled_r5.json"
FIXTURE = "/tmp/bench_source_files/r2000000_l6_15"


def main() -> None:
    from anomaly_detector_faironchain_spark.plans.corpus_report import (
        render_corpus_report,
    )
    from anomaly_detector_faironchain_spark.session import get_spark

    spark = get_spark("corpus-report-r5", cores=32,
                      extra_conf={"spark.driver.memory": "48g"})
    df = spark.read.parquet(f"{FIXTURE}/input")
    df.count()  # page-cache warm

    def run(f):
        t0 = time.time()
        md = render_corpus_report(
            df, id_col="file_sid", text_col="content",
            lang_col="lang", source_col="repo", sample_fraction=f)
        return round(time.time() - t0, 2), md

    def docs_of(md):
        return int(re.search(r"\*\*([\d,]+) documents",
                             md).group(1).replace(",", ""))

    report = {
        "what": "corpus report exact vs sampled, 2M heavy rows, local[32]",
        "canary_pre_mips": bench.cpu_canary(32),
    }
    sec_exact, md_exact = run(None)
    sec_5, md_5 = run(0.05)
    sec_1, md_1 = run(0.01)
    n_exact = docs_of(md_exact)
    report.update({
        "exact_sec": sec_exact,
        "sampled_5pct_sec": sec_5,
        "sampled_1pct_sec": sec_1,
        "exact_docs": n_exact,
        "sampled_5pct_docs_scaled": docs_of(md_5),
        "sampled_1pct_docs_scaled": docs_of(md_1),
        "sampled_5pct_doc_err_pct": round(
            100 * abs(docs_of(md_5) - n_exact) / n_exact, 3),
        "sampled_1pct_doc_err_pct": round(
            100 * abs(docs_of(md_1) - n_exact) / n_exact, 3),
        "sampled_header_has_error_bars": "Error bars" in md_5,
        "meets_sub20s_target": sec_5 < 20.0,
        "r4_exact_sec_for_comparison": 122.5,
        "canary_post_mips": bench.cpu_canary(32),
    })
    report["window_healthy"] = (
        min(report["canary_pre_mips"], report["canary_post_mips"])
        >= 0.75 * bench.CANARY_CEILING_MIPS)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
