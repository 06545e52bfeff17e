"""Constraint-suggestion engine: profile an unknown table, propose a spec.

The reference hand-writes its validation rules per loader (reference
`etl/test.py:60-128`, `tests/test_etl.py:25-65`) — viable for five known
tables, not for a lake of thousands. This module closes the loop the
north rule implies: point the engine at a table it has never seen,
get back a reviewable `TableSpec` (the same dataclasses
`plans/compiler.validate_table` executes and `plans/serde` ships as
JSON), each suggestion carrying the profile evidence that justified it.
The public pattern is AWS Deequ's ConstraintSuggestionRunner; the rules
here are re-derived for this engine's constraint vocabulary.

Scale shape (the 10^12-row story):
  * Pass 1 — ONE fused aggregation over the table: null counts, numeric
    min/max, string length min/max, candidate-format match counts, and
    per-column distinct estimates. In the default `distinct_mode=
    "approx"` the distinct estimates are HLL sketches
    (approx_count_distinct), which are algebraic — everything map-side
    combines, raw rows never shuffle, and the scan is column-pruned to
    the profiled columns. `distinct_mode="exact"` swaps in countDistinct
    — bit-exact (it is the oracle mode) but each distinct aggregate
    multiplies the input through an Expand node, so at scale it is for
    CONFIRMING a candidate spec on a sampled slice, not for the full
    corpus.
  * Pass 2 — domain collection, only for the string columns pass 1
    flagged as enum-like (distinct <= max_domain): one aggregation of
    sort_array(collect_set(col)) over just those columns. Parquet column
    pruning makes this a narrow scan; the result is O(max_domain) per
    column. Skipped entirely when nothing qualifies.
  * Regex candidates are gated by `regex_max_len` (default 256): running
    rlike over multi-KB document bodies costs real CPU and a format
    suggestion on free text is meaningless, so long columns skip the
    match counters at plan-build time.

Suggestion rules (deterministic — same profile in, same spec out):
  column kind      | rule                                   | suggests
  -----------------|----------------------------------------|---------------------------
  any              | zero nulls (n_rows > 0)                | NotNull(col)
  any              | distinct == non-null count, no nulls   | Unique(col)  [approx mode:
                   | (approx: within rsd_margin*rsd)        |  Unique(col, approx_screen)]
  string           | 2 <= distinct <= max_domain            | InSet(col, observed domain)
  string, not enum | every non-null value is all-digits     | Regex(col, "[0-9]+" or
                   | (or all lowercase-hex)                 |  "[0-9a-f]{n}" when fixed n)
  string, not enum | observed length bounds                 | LengthInRange(col, lo, hi)
  numeric          | observed value bounds (min < max ok,   | InRange(col, min, max)
                   | min == max also valid)                 |
  array<float/dbl> | every row has the same size            | VectorShape(col, dim)
  fd candidate     | mapping single-valued on observed keys | FunctionalDependency(det, dep)

A column whose every value is NULL gets no suggestions (there is no
evidence to generalize). The suggested spec is self-consistent by
construction: `validate_table(df, report.spec())` passes on the exact
input that produced it — asserted by `tests/test_suggest.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F, types as T

from anomaly_detector_faironchain_spark.plans.spec import (
    Constraint,
    FunctionalDependency,
    InRange,
    InSet,
    LengthInRange,
    NotNull,
    Regex,
    TableSpec,
    Unique,
    VectorShape,
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_DIGITS = "^[0-9]+$"
_HEX = "^[0-9a-f]+$"


@dataclass(frozen=True)
class Suggestion:
    """One proposed constraint plus the profile evidence behind it."""

    column: str
    kind: str  # not_null | unique | in_set | in_range | length_in_range | regex | vector_shape
    constraint: Constraint
    evidence: str
    lo: float | None = None
    hi: float | None = None
    domain: tuple[str, ...] | None = None


@dataclass(frozen=True)
class SuggestionReport:
    table: str
    n_rows: int
    distinct_mode: str
    suggestions: tuple[Suggestion, ...]

    def spec(self, partition_col: str | None = None) -> TableSpec:
        return TableSpec(
            name=self.table,
            constraints=tuple(s.constraint for s in self.suggestions),
            partition_col=partition_col,
        )

    def to_rows(self) -> list[tuple]:
        """(col_name, kind, lo, hi, detail) rows, deterministically
        sorted — the display/oracle projection. detail carries the
        suggested domain (csv) for in_set and the pattern for regex."""
        rows = []
        for s in self.suggestions:
            detail = None
            if s.domain is not None:
                detail = ",".join(s.domain)
            elif s.kind == "regex":
                detail = s.constraint.pattern
            elif s.kind == "functional_dependency":
                detail = s.constraint.dependent
            rows.append((
                s.column,
                s.kind,
                None if s.lo is None else float(s.lo),
                None if s.hi is None else float(s.hi),
                detail,
            ))
        return sorted(rows, key=lambda r: (r[0], r[1]))


def _profile(
    df: DataFrame,
    distinct_mode: str,
    rsd: float,
    regex_max_len: int,
) -> tuple[dict, dict]:
    """Pass 1: one fused aggregation. Returns (metrics-row-as-dict,
    {col: dtype})."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for col, dt in dtypes.items():
        c = F.col(col)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"null__{col}"))
        if distinct_mode == "exact":
            aggs.append(F.countDistinct(c).alias(f"dist__{col}"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"dist__{col}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"min__{col}"))
            aggs.append(F.max(c).cast("double").alias(f"max__{col}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.length(c)).alias(f"lmin__{col}"))
            aggs.append(F.max(F.length(c)).alias(f"lmax__{col}"))
            # format counters only where the column can plausibly be a
            # code: bounded length keeps rlike off document bodies. The
            # gate must be plan-static, so it keys on nothing row-level —
            # the counter itself caps the length first.
            short = F.when(F.length(c) <= regex_max_len, c)
            aggs.append(
                F.sum(short.rlike(_DIGITS).cast("long")).alias(f"dig__{col}")
            )
            aggs.append(
                F.sum(short.rlike(_HEX).cast("long")).alias(f"hex__{col}")
            )
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, (T.FloatType, T.DoubleType)
        ):
            aggs.append(F.min(F.size(c)).alias(f"vmin__{col}"))
            aggs.append(F.max(F.size(c)).alias(f"vmax__{col}"))
    row = df.agg(*aggs).first().asDict()
    return row, dtypes


def _collect_domains(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Pass 2: exact domains for the enum-like columns — one narrow,
    column-pruned aggregation."""
    if not cols:
        return {}
    row = df.agg(
        *[F.sort_array(F.collect_set(F.col(c))).alias(c) for c in cols]
    ).first()
    return {c: tuple(row[c]) for c in cols}


def suggest_constraints(
    df: DataFrame,
    name: str = "table",
    *,
    max_domain: int = 20,
    distinct_mode: str = "approx",  # 'approx' (scale) | 'exact' (oracle)
    rsd: float = 0.02,
    rsd_margin: float = 3.0,
    regex_max_len: int = 256,
    fd_candidates: tuple = (),
) -> SuggestionReport:
    """Profile `df` and propose a TableSpec. See module docstring for
    the rule table and the two-pass scale shape.

    fd_candidates: (determinant, dependent) pairs to screen for
    functional dependencies (determinant may be a column name or a
    tuple of them) — e.g. the north-rule pairs (commit -> repo,
    path -> repo). FD discovery over ALL column pairs is O(cols^2)
    full scans, so candidates are caller-named; each screen reuses the
    hash-compacted exact kernel from operators/uniqueness (two
    xxhash64 per row shuffle, real columns regrouped only for
    multi-valued key hashes) and suggests FunctionalDependency when
    the observed mapping is single-valued."""
    if distinct_mode not in ("approx", "exact"):
        raise ValueError(f"distinct_mode must be approx|exact: {distinct_mode}")
    m, dtypes = _profile(df, distinct_mode, rsd, regex_max_len)
    n = int(m["__n"])
    out: list[Suggestion] = []
    if n == 0:
        return SuggestionReport(name, 0, distinct_mode, ())

    enum_cols: list[str] = []
    pending: dict[str, list[Suggestion]] = {c: [] for c in dtypes}
    for col, dt in dtypes.items():
        nulls = int(m[f"null__{col}"])
        non_null = n - nulls
        if non_null == 0:
            continue  # all-null column: no evidence to generalize
        dist = int(m[f"dist__{col}"])
        sug = pending[col]
        if nulls == 0:
            sug.append(Suggestion(col, "not_null", NotNull(col),
                                  f"0 nulls in {n} rows"))
        # candidate key: every non-null value distinct AND no nulls
        # (a nullable key cannot be Unique — the check counts key nulls
        # as violations). Approx mode can only flag a CANDIDATE: an HLL
        # cannot certify uniqueness, so it suggests the approx_screen
        # monitoring form and the evidence says to confirm exactly.
        if nulls == 0:
            if distinct_mode == "exact" and dist == non_null:
                sug.append(Suggestion(
                    col, "unique", Unique(col),
                    f"distinct {dist} == rows {non_null} (exact)"))
            elif (
                distinct_mode == "approx"
                and dist >= (1.0 - rsd_margin * rsd) * non_null
            ):
                sug.append(Suggestion(
                    col, "unique", Unique(col, mode="approx_screen", rsd=rsd),
                    f"approx distinct {dist} ~ rows {non_null} "
                    f"(HLL rsd={rsd}; confirm with mode='exact')"))
        if isinstance(dt, _NUMERIC):
            lo, hi = float(m[f"min__{col}"]), float(m[f"max__{col}"])
            sug.append(Suggestion(
                col, "in_range", InRange(col, lo, hi),
                f"observed [{lo}, {hi}]", lo=lo, hi=hi))
        elif isinstance(dt, T.StringType):
            if 2 <= dist <= max_domain:
                enum_cols.append(col)  # domain filled in pass 2
            else:
                lmin, lmax = int(m[f"lmin__{col}"]), int(m[f"lmax__{col}"])
                dig, hexn = int(m[f"dig__{col}"] or 0), int(m[f"hex__{col}"] or 0)
                if dig == non_null:
                    sug.append(Suggestion(
                        col, "regex", Regex(col, "[0-9]+"),
                        f"all {non_null} non-null values are digits"))
                elif hexn == non_null:
                    # fixed-width hex (the commit-hash shape) pins length
                    pat = (f"[0-9a-f]{{{lmin}}}" if lmin == lmax
                           else "[0-9a-f]+")
                    sug.append(Suggestion(
                        col, "regex", Regex(col, pat),
                        f"all {non_null} non-null values are lowercase hex"))
                sug.append(Suggestion(
                    col, "length_in_range", LengthInRange(col, lmin, lmax),
                    f"observed lengths [{lmin}, {lmax}]",
                    lo=float(lmin), hi=float(lmax)))
        elif f"vmin__{col}" in m and m[f"vmin__{col}"] is not None:
            vmin, vmax = int(m[f"vmin__{col}"]), int(m[f"vmax__{col}"])
            if vmin == vmax and vmin > 0:
                sug.append(Suggestion(
                    col, "vector_shape", VectorShape(col, vmin),
                    f"all vectors are {vmin}-dim", lo=float(vmin),
                    hi=float(vmin)))

    domains = _collect_domains(df, enum_cols)
    for col, dom in domains.items():
        dist = len(dom)
        pending[col].append(Suggestion(
            col, "in_set", InSet(col, dom),
            f"{dist} distinct values <= max_domain {max_domain}",
            domain=dom))

    for col in dtypes:  # schema order, suggestions grouped per column
        out.extend(pending[col])

    for det, dep in fd_candidates:
        det_t = (det,) if isinstance(det, str) else tuple(det)
        fdc = FunctionalDependency(*det_t, dependent=dep)
        # empty candidate frame == the mapping is single-valued on every
        # observed key (exactness argument in the kernel's docstring)
        from anomaly_detector_faironchain_spark.operators.uniqueness import (
            functional_dependency_groups,
        )

        probe = TableSpec(name=name, constraints=(fdc,))
        if functional_dependency_groups(df, probe, fdc).limit(1).count() == 0:
            out.append(Suggestion(
                ",".join(det_t), "functional_dependency", fdc,
                f"({','.join(det_t)}) -> {dep} single-valued on all "
                f"observed keys"))
    return SuggestionReport(name, n, distinct_mode, tuple(out))
