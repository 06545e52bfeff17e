"""spark-submit entrypoint:

    spark-submit --py-files adfs.zip -m anomaly_detector_faironchain_spark.cli \\
        validate --input /data/source_files --out /out/run1 \\
        --ref repos=/data/repos [--partition-col bucket] [--resume]

    ... cli etl --blocks raw_blocks --transfers raw_transfers --out DIR
        # reference EP1 (run_preprocessing + run_build_abstract): clean,
        # validate, build the five abstract tables, write parquet

    ... cli analyze --transfers abstract_token_transfer --out DIR \\
        [--tx PATH --blocks PATH] [--min-amount 1e12] [--infra a,b,...]
        # reference EP2 (run_graph_builder + run_feature_extraction +
        # run_anomaly_analysis_pipeline): graph features -> H1-H6 ->
        # detectors -> analysis_result parquet

Runs the north-rule constraint suite with checkpoint/resume; on a cluster
the same code executes unchanged — parallelism comes from the input's
file splits and spark.sql.shuffle.partitions set by the submitter.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from anomaly_detector_faironchain_spark.plans.checkpoint import run_with_checkpoint
from anomaly_detector_faironchain_spark.sources import load_table
from anomaly_detector_faironchain_spark.specs import north_rule_spec


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="adfs")
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate", help="run the constraint suite")
    v.add_argument("--input", required=True, help="path of source_files table")
    v.add_argument("--out", required=True, help="output/checkpoint dir")
    v.add_argument("--ref", action="append", default=[],
                   metavar="NAME=PATH", help="referenced dim tables")
    v.add_argument("--partition-col", default="bucket")
    v.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"],
                   help="default input format; per-ref `fmt:loc` prefixes "
                        "override (iceberg:/table: read catalog tables)")
    v.add_argument("--violation-limit", type=int, default=1000,
                   help="max materialized violation rows per (partition, check)")
    v.add_argument("--quarantine", default=None, metavar="DIR",
                   help="also split the input on the row-level checks: "
                        "violating rows (plus a failed_checks column) go "
                        "to DIR/quarantine, clean rows to DIR/clean — one "
                        "map-only pass per side, no shuffle")
    v.add_argument("--spec", default=None, metavar="SUITE_JSON",
                   help="run a declarative constraint suite from a JSON "
                        "file (plans.serde format) instead of the built-in "
                        "north-rule suite; the file's partition_col wins "
                        "over --partition-col")
    v.add_argument("--report", action="store_true",
                   help="also write a human-readable markdown report "
                        "(per-check pass rates, failing partitions, "
                        "violation samples) to OUT/report.md")
    v.add_argument("--snapshot", action="store_true",
                   help="treat --input as a plans.snapshots.SnapshotTable "
                        "dir and validate ONLY snapshots appended since "
                        "the last validated watermark (incremental mode)")
    e = sub.add_parser("etl", help="EP1: raw chain data → abstract tables")
    e.add_argument("--blocks", required=True, help="raw blocks table")
    e.add_argument("--transfers", required=True, help="raw native transfers")
    e.add_argument("--out", required=True, help="output dir (5 parquet tables)")
    e.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"])
    e.add_argument("--skip-checks", action="store_true",
                   help="skip the 20-check parity suite after the build")

    a = sub.add_parser("analyze", help="EP2: transfers → anomaly scores")
    a.add_argument("--transfers", required=True,
                   help="abstract_token_transfer table")
    a.add_argument("--out", required=True, help="result parquet dir")
    a.add_argument("--tx", help="abstract_transaction (timestamp lineage)")
    a.add_argument("--blocks", help="abstract_block (timestamp lineage)")
    a.add_argument("--min-amount", type=float, default=1e12,
                   help="Wei floor before graph build (reference default)")
    a.add_argument("--infra", default="",
                   help="comma-separated infra whitelist addresses")
    a.add_argument("--no-iforest", action="store_true")
    a.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"])
    a.add_argument("--csv", action="store_true",
                   help="also write the result as CSV next to the parquet "
                        "(reference output parity: every reference stage "
                        "writes CSV, run_anomaly_analysis_pipeline.py:99)")
    e.add_argument("--csv", action="store_true",
                   help="also write each abstract table as CSV")

    k = sub.add_parser("skew", help="pre-join skew diagnosis: top heavy "
                                    "keys via mergeable Misra-Gries "
                                    "summaries (bounded k-row shuffle)")
    k.add_argument("--input", required=True, help="table to diagnose")
    k.add_argument("--key", required=True, help="prospective join/group key")
    k.add_argument("--k", type=int, default=1024,
                   help="summary size (keys with freq > n/(k+1) guaranteed)")
    k.add_argument("--top", type=int, default=20)
    k.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"])

    sc = sub.add_parser(
        "screen",
        help="sample-first validation screen: certify per-partition "
             "row-check verdicts from a deterministic hash sample, exact-"
             "scan only the undecided partitions",
    )
    sc.add_argument("--input", required=True, help="table to screen")
    sc.add_argument("--out", required=True, help="verdict parquet dir")
    sc.add_argument("--key", required=True,
                    help="sample key column (stable row id)")
    sc.add_argument("--fraction", type=float, default=0.01,
                    help="sampling fraction (16-bit md5-prefix grain)")
    sc.add_argument("--tolerance", type=float, default=0.0,
                    help="max tolerated violation rate per (partition, check)")
    sc.add_argument("--partition-col", default="bucket")
    sc.add_argument("--spec", default=None, metavar="SUITE_JSON",
                    help="single-table suite document (default: the "
                         "north-rule spec)")
    sc.add_argument("--format", default="parquet",
                    choices=["parquet", "csv", "table"])

    g = sub.add_parser(
        "suggest",
        help="profile an unknown table and propose a constraint spec "
             "(plans/suggest.py): prints the evidence table, optionally "
             "writes a plans.serde suite JSON ready for `validate --spec`",
    )
    g.add_argument("--input", required=True, help="table to profile")
    g.add_argument("--name", default="table", help="table name in the spec")
    g.add_argument("--partition-col", default=None,
                   help="partition column recorded in the suggested spec")
    g.add_argument("--max-domain", type=int, default=20,
                   help="max distinct values for an InSet suggestion")
    g.add_argument("--exact", action="store_true",
                   help="exact distinct counts (certifies Unique; Expand-"
                        "heavy — use on a sample at scale). Default: HLL "
                        "screen that suggests approx_screen Unique checks")
    g.add_argument("--fd", action="append", default=[], metavar="DET->DEP",
                   help="functional-dependency candidate to screen, e.g. "
                        "commit->repo or path,commit->repo (repeatable)")
    g.add_argument("--out", default=None, metavar="SPEC_JSON",
                   help="write the suggested spec as a serde spec document")
    g.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"])

    cr = sub.add_parser(
        "corpus-report",
        help="markdown corpus curation report (size, language/source "
             "mix, BPE-ish token budgets, dup rate, quality histogram)",
    )
    cr.add_argument("--input", required=True, help="documents parquet path")
    cr.add_argument("--out", required=True, help="report .md output path")
    cr.add_argument("--id-col", default="doc_id")
    cr.add_argument("--text-col", default="text")
    cr.add_argument("--lang-col", default="lang")
    cr.add_argument("--source-col", default="source")
    cr.add_argument("--top-sources", type=int, default=15)
    cr.add_argument(
        "--sample-fraction", type=float, default=None,
        help="interactive mode: scan a deterministic fraction of docs "
             "and scale counts back up (report carries error bars; "
             "dup rate becomes a lower bound); omit for the exact report",
    )

    s = sub.add_parser("serve", help="EP3: HTTP endpoints over results")
    s.add_argument("--data-root", required=True,
                   help="root of {chain}/{YYYY}/{MM}/ monthly result parquet")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--max-sql-rows", type=int, default=10_000,
                   help="driver-side cap on /v1/sql result rows")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName(f"adfs-{args.cmd}").getOrCreate()

    if args.cmd == "etl":
        return _run_etl(spark, args)
    if args.cmd == "analyze":
        return _run_analyze(spark, args)
    if args.cmd == "serve":
        return _run_serve(spark, args)
    if args.cmd == "skew":
        return _run_skew(spark, args)
    if args.cmd == "screen":
        return _run_screen(spark, args)
    if args.cmd == "suggest":
        return _run_suggest(spark, args)
    if args.cmd == "corpus-report":
        return _run_corpus_report(spark, args)

    refs = {}
    for spec_str in args.ref:
        name, path = spec_str.split("=", 1)
        refs[name] = load_table(spark, path, args.format)
    if args.spec:
        from anomaly_detector_faironchain_spark.plans.serde import (
            suite_from_json,
        )

        with open(args.spec, encoding="utf-8") as fh:
            specs, inputs = suite_from_json(fh.read())
        if len(specs) > 1:
            return _run_suite_validate(spark, args, specs, inputs, refs)
        spec = next(iter(specs.values()))
        # refs declared inside the suite document load with the same
        # --format default as the primary input; --ref NAME=PATH wins
        for name, path in spec.refs.items():
            refs.setdefault(name, load_table(spark, path, args.format))
    else:
        spec = north_rule_spec(partition_col=args.partition_col)
    if args.snapshot:
        from anomaly_detector_faironchain_spark.plans.snapshots import (
            SnapshotTable,
            validate_new_snapshots,
        )

        table = SnapshotTable(args.input)
        sid, result = validate_new_snapshots(
            spark, table, spec, args.out, refs=refs,
            input_path=args.input,
            violation_limit_per_check=args.violation_limit,
        )
        if result is None:
            print(json.dumps({"status": "already_complete",
                              "snapshot": sid, "out": args.out}))
            return 0
        summary = {
            "status": "complete",
            "snapshot": sid,
            "out": args.out,
            "passed": result.passed(),
            "partitions": result.profile.count(),
        }
        print(json.dumps(summary))
        return 0 if summary["passed"] else 2

    df = load_table(spark, args.input, args.format)
    result = run_with_checkpoint(df, spec, args.out, refs=refs,
                                 input_path=args.input,
                                 violation_limit_per_check=args.violation_limit)
    if result is None:
        print(json.dumps({"status": "already_complete", "out": args.out}))
        return 0
    summary = {
        "status": "complete",
        "out": args.out,
        "passed": result.passed(),
        "partitions": result.profile.count(),
    }
    if args.report:
        from pathlib import Path

        from anomaly_detector_faironchain_spark.plans.report import (
            render_report,
        )

        rp = Path(args.out) / "report.md"
        rp.write_text(render_report(result), encoding="utf-8")
        summary["report"] = str(rp)
    if args.quarantine:
        from anomaly_detector_faironchain_spark.plans.quarantine import (
            split_rows,
        )

        clean, quarantined = split_rows(df, spec)
        q_dir = args.quarantine.rstrip("/")
        quarantined.write.mode("overwrite").parquet(f"{q_dir}/quarantine")
        clean.write.mode("overwrite").parquet(f"{q_dir}/clean")
        summary["quarantine"] = {
            "dir": q_dir,
            "quarantined": spark.read.parquet(
                f"{q_dir}/quarantine"
            ).count(),
            "clean": spark.read.parquet(f"{q_dir}/clean").count(),
        }
    print(json.dumps(summary))
    return 0 if summary["passed"] else 2


def _run_suite_validate(spark: SparkSession, args, specs, inputs,
                        refs) -> int:
    """Multi-table suite: every table validated CONCURRENTLY
    (plans/multi.validate_suite — driver threads overlap the
    independent Spark jobs), verdicts + violations land under
    {out}/{table}/. Table inputs come from the suite doc's "input"
    fields, falling back to {--input}/{table}."""
    from anomaly_detector_faironchain_spark.plans.multi import (
        validate_suite,
    )

    tables = {
        name: load_table(
            spark, inputs.get(name, f"{args.input.rstrip('/')}/{name}"),
            args.format,
        )
        for name in specs
    }
    results = validate_suite(
        tables, specs, refs=refs,
        violation_limit_per_check=args.violation_limit,
    )
    summary = {"status": "complete", "out": args.out, "tables": {}}
    all_passed = True
    for name, res in results.items():
        res.verdicts.write.mode("overwrite").parquet(
            f"{args.out}/{name}/verdicts"
        )
        res.violations.write.mode("overwrite").parquet(
            f"{args.out}/{name}/violations"
        )
        ok = res.passed()
        all_passed &= ok
        summary["tables"][name] = {
            "passed": ok,
            "partitions": res.profile.count(),
        }
        res.unpersist()
    summary["passed"] = all_passed
    print(json.dumps(summary))
    return 0 if all_passed else 2


def _run_screen(spark: SparkSession, args) -> int:
    """Sample-first screen over one table: the 100 TB fast path when an
    exact count is only needed inside the undecided band. Writes the
    verdict frame and prints a JSON summary with the certified/escalated
    split — the decision evidence for whether a full `validate` run is
    even required."""
    from pyspark.sql import functions as F

    from anomaly_detector_faironchain_spark.operators.sampled import (
        sampled_row_screen,
    )

    if args.spec:
        from anomaly_detector_faironchain_spark.plans.serde import (
            suite_from_json,
        )

        with open(args.spec, encoding="utf-8") as fh:
            specs, _inputs = suite_from_json(fh.read())
        if len(specs) != 1:
            print(json.dumps({"error": "screen takes a single-table suite"}))
            return 1
        spec = next(iter(specs.values()))
    else:
        spec = north_rule_spec(partition_col=args.partition_col)

    df = load_table(spark, args.input, args.format)
    verdicts = sampled_row_screen(
        df, spec, sample_key=args.key,
        fraction=args.fraction, tolerance=args.tolerance,
    )
    verdicts.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    agg = back.groupBy("method").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("passed")).cast("long")).alias("failed"),
        F.sum("n_scanned").alias("rows_scanned"),
    ).collect()
    summary = {
        "status": "complete",
        "out": args.out,
        "fraction": args.fraction,
        "tolerance": args.tolerance,
        "passed": back.filter(~F.col("passed")).limit(1).count() == 0,
        "by_method": {
            r["method"]: {
                "verdicts": r["n"],
                "failed": int(r["failed"]),
                "rows_scanned": int(r["rows_scanned"]),
            }
            for r in agg
        },
    }
    print(json.dumps(summary))
    return 0 if summary["passed"] else 2


def _run_suggest(spark: SparkSession, args) -> int:
    """Profile → suggested TableSpec → (optionally) a serde spec JSON
    that `validate --spec` runs unchanged. The human reviews the printed
    evidence table before promoting the spec — suggestions generalize
    OBSERVED behavior, they are not ground truth."""
    from anomaly_detector_faironchain_spark.plans.serde import spec_to_json
    from anomaly_detector_faironchain_spark.plans.suggest import (
        suggest_constraints,
    )

    fd_candidates = []
    for spec_str in args.fd:
        det, _, dep = spec_str.partition("->")
        if not dep:
            raise SystemExit(f"--fd wants DET->DEP, got: {spec_str}")
        fd_candidates.append((tuple(det.split(",")), dep))

    df = load_table(spark, args.input, args.format)
    rep = suggest_constraints(
        df, args.name, max_domain=args.max_domain,
        distinct_mode="exact" if args.exact else "approx",
        fd_candidates=tuple(fd_candidates),
    )
    for s in rep.suggestions:
        print(f"{s.column:24s} {s.kind:16s} {s.constraint.check_id():40s}"
              f" # {s.evidence}")
    summary = {
        "status": "complete", "table": args.name, "rows": rep.n_rows,
        "distinct_mode": rep.distinct_mode,
        "n_suggestions": len(rep.suggestions),
    }
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(spec_to_json(rep.spec(partition_col=args.partition_col)))
        summary["spec"] = args.out
    print(json.dumps(summary))
    return 0


def _run_etl(spark: SparkSession, args) -> int:
    """EP1: clean → five abstract tables → parquet (+ parity suite)."""
    from anomaly_detector_faironchain_spark.etl import abstract, checks

    raw_blocks = load_table(spark, args.blocks, args.format)
    raw_transfers = load_table(spark, args.transfers, args.format)
    tables = abstract.build_all(raw_blocks, raw_transfers)
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        if args.csv:
            spark.read.parquet(f"{args.out}/{name}").write.mode(
                "overwrite").option("header", True).csv(f"{args.out}/csv/{name}")
    summary = {"status": "complete", "out": args.out,
               "tables": {n: spark.read.parquet(f"{args.out}/{n}").count()
                          for n in tables}}
    if not args.skip_checks:
        persisted = {n: spark.read.parquet(f"{args.out}/{n}") for n in tables}
        results = checks.run_parity_suite(persisted)
        summary["checks_passed"] = all(r.passed() for r in results.values())
    print(json.dumps(summary))
    return 0 if summary.get("checks_passed", True) else 2


def _run_analyze(spark: SparkSession, args) -> int:
    """EP2: graph features → detectors → analysis_result parquet."""
    from anomaly_detector_faironchain_spark.analysis import pipeline

    tt = load_table(spark, args.transfers, args.format)
    tx = load_table(spark, args.tx, args.format) if args.tx else None
    blocks = load_table(spark, args.blocks, args.format) if args.blocks else None
    infra = [s for s in args.infra.split(",") if s.strip()]
    result = pipeline.run_anomaly_analysis(
        tt,
        infra_addresses=infra,
        include_iforest=not args.no_iforest,
        min_amount=args.min_amount,
        tx=tx,
        blocks=blocks,
    )
    result.write.mode("overwrite").parquet(args.out)
    if args.csv:
        spark.read.parquet(args.out).write.mode("overwrite").option(
            "header", True).csv(f"{args.out.rstrip('/')}_csv")
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"status": "complete", "out": args.out, "accounts": n}))
    return 0


def _run_skew(spark: SparkSession, args) -> int:
    """Print the heavy-hitter head of a prospective key as JSON — run
    BEFORE planning a big join to pick broadcast vs salt vs AQE."""
    import json as _json

    from anomaly_detector_faironchain_spark.operators.heavyhitters import (
        heavy_hitters,
    )
    from anomaly_detector_faironchain_spark.sources import load_table

    df = load_table(spark, args.input, args.format)
    rows = heavy_hitters(df, args.key, k=args.k, top_n=args.top).collect()
    print(_json.dumps({
        "key_col": args.key,
        "k": args.k,
        "hitters": [
            {"key": r.key, "est_count": r.est_count,
             "err_bound": r.err_bound}
            for r in rows
        ],
    }))
    return 0


def _run_corpus_report(spark: SparkSession, args) -> int:
    import json
    from pathlib import Path

    from anomaly_detector_faironchain_spark.plans.corpus_report import (
        render_corpus_report,
    )

    docs = spark.read.parquet(args.input)
    md = render_corpus_report(
        docs, id_col=args.id_col, text_col=args.text_col,
        lang_col=args.lang_col, source_col=args.source_col,
        top_sources=args.top_sources,
        sample_fraction=args.sample_fraction,
    )
    Path(args.out).write_text(md, encoding="utf-8")
    print(json.dumps({"status": "ok", "report": args.out,
                      "chars": len(md)}))
    return 0


def _run_serve(spark: SparkSession, args) -> int:
    """EP3: serve /v1/top, /v1/address, /v1/sql over monthly result
    parquet (reference api/app.py:18-188)."""
    from anomaly_detector_faironchain_spark.plans import httpserve

    server = httpserve.serve(spark, args.data_root, args.host, args.port,
                             max_sql_rows=args.max_sql_rows)
    host, port = server.server_address[:2]
    print(json.dumps({"status": "serving", "host": host, "port": port,
                      "data_root": args.data_root}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
