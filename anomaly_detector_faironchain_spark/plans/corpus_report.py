"""Human-readable corpus curation report.

The curation-side sibling of plans/report.py: one markdown file that
answers "what is in this corpus and is it fit to train on" — size,
language/source mix, token budgets (whitespace AND BPE-ish), exact-dup
rate, and the quality-score distribution.

Pass discipline (the 100 TB contract every driver-facing surface in
this engine follows): the per-lang metrics run as THREE codegen'd
scan-and-reduce jobs (counts/sizes, quality histogram, HLL digests)
plus one per-source job — measured at 2M heavy docs, fusing all the
stat families into one projection knocks the stage out of whole-stage
codegen and runs ~15x slower than the three scans it replaces (a
>9-minute stall vs 105 s; BENCH/curation_ops_scale_audit_r3.json).
Every job map-side-combines to #langs (or #sources) rows; bodies
never shuffle; the dup rate is approx_count_distinct over md5 (an
imperative aggregate deliberately isolated with cheap inputs, since
ObjectHashAggregate also disables codegen for its stage). Driver-side
cost is (#langs + #top_sources) rows — KBs at any scale.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import text as text_ops

_QUALITY_BUCKETS = 10


def corpus_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> tuple[DataFrame, DataFrame]:
    """(per_lang, per_source) aggregate frames for the corpus report.

    per_lang: one row per language — doc/char/token totals, approx
    distinct digests, mean quality, and a 10-bucket quality histogram.
    per_source: one row per source — doc count and token total.
    """
    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(text_ops.BPE_SPLIT_PATTERN), F.lit(0)
    )
    stats = text_ops.token_stat_cols(text_col)
    # NULL langs/sources must survive the l1⋈l2⋈l3 equi-joins (null keys
    # never match an inner join), so group on a sentinel instead.
    lang_key = F.coalesce(F.col(lang_col), F.lit("und")).alias("lang")
    source_key = F.coalesce(F.col(source_col), F.lit("unknown")).alias("source")
    # Scan discipline (measured, see BENCH/curation_ops_scale_audit_r3):
    # fusing ALL per-doc stat families into one projection knocks the
    # stage out of whole-stage codegen (the combined tree is ~15x
    # slower than the sum of its parts — each family alone runs at
    # codegen speed). So the report pays THREE cheap codegen'd
    # scan-and-reduce jobs instead of one interpreted mega-scan:
    #   L1 counts/sizes, L2 quality score + histogram, L3 HLL digests
    # (imperative agg, kept away from heavy inputs on purpose).
    # Each reduces to #langs rows map-side; the joins are negligible.
    l1 = docs.select(
        lang_key,
        stats["n_chars"].alias("n_chars"),
        stats["n_tokens"].alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_ws_tokens").alias("n_ws_tokens"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
    )
    qs = text_ops.quality_score_col(text_col)
    qdoc = docs.select(lang_key, qs.alias("qscore"))
    qdoc = qdoc.select(
        "lang", "qscore",
        F.least(
            F.floor(F.col("qscore") * _QUALITY_BUCKETS).cast("int"),
            F.lit(_QUALITY_BUCKETS - 1),
        ).alias("qbucket"),
    )
    hist_cols = [
        F.sum((F.col("qbucket") == b).cast("long")).alias(f"q{b}")
        for b in range(_QUALITY_BUCKETS)
    ]
    l2 = qdoc.groupBy("lang").agg(
        F.round(F.avg("qscore"), 4).alias("mean_quality"), *hist_cols
    )
    l3 = docs.select(
        lang_key, F.md5(F.col(text_col)).alias("digest")
    ).groupBy("lang").agg(
        F.approx_count_distinct("digest").alias("approx_distinct")
    )
    per_lang = l1.join(l2, "lang").join(l3, "lang")
    per_source = docs.select(
        source_key,
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
    )
    return per_lang, per_source


def render_corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    top_sources: int = 15,
) -> str:
    """Markdown corpus report. Two jobs total: the per-lang agg and the
    per-source top-N (TakeOrdered — the full source distribution is
    never sorted or collected)."""
    per_lang, per_source = corpus_profile(
        docs, id_col, text_col, lang_col, source_col
    )
    langs = sorted(per_lang.collect(), key=lambda r: -r.n_docs)
    top = per_source.orderBy(
        F.col("n_bpe_tokens").desc(), F.col("source")
    ).limit(top_sources).collect()

    n_docs = sum(r.n_docs for r in langs)
    n_bpe = sum(r.n_bpe_tokens for r in langs)
    n_ws = sum(r.n_ws_tokens for r in langs)
    n_chars = sum(r.n_chars for r in langs)
    approx_distinct = sum(r.approx_distinct for r in langs)
    dup_pct = 100.0 * max(n_docs - approx_distinct, 0) / n_docs if n_docs else 0.0

    lines = [
        "# Corpus report",
        "",
        f"**{n_docs:,} documents · {n_chars:,} chars · "
        f"{n_bpe:,} BPE-ish tokens ({n_ws:,} whitespace) · "
        f"≈{dup_pct:.2f}% exact-dup (approx, per-lang digest sketch)**",
        "",
        "## Languages",
        "",
        "| lang | docs | share | BPE tokens | mean quality | quality histogram (0→1) |",
        "|---|---|---|---|---|---|",
    ]
    for r in langs:
        hist = [getattr(r, f"q{b}") for b in range(_QUALITY_BUCKETS)]
        peak = max(hist) or 1
        spark_bar = "".join(
            " ▁▂▃▄▅▆▇█"[min(8, (8 * h + peak - 1) // peak)] for h in hist
        )
        lines.append(
            f"| {r.lang} | {r.n_docs:,} | {100.0 * r.n_docs / n_docs:.1f}% "
            f"| {r.n_bpe_tokens:,} | {r.mean_quality:.3f} | `{spark_bar}` |"
        )
    lines += [
        "",
        f"## Top {len(top)} sources by token volume",
        "",
        "| source | docs | BPE tokens | token share |",
        "|---|---|---|---|",
    ]
    for r in top:
        lines.append(
            f"| {r.source} | {r.n_docs:,} | {r.n_bpe_tokens:,} "
            f"| {(100.0 * r.n_bpe_tokens / n_bpe) if n_bpe else 0.0:.2f}% |"
        )
    lines.append("")
    return "\n".join(lines)
