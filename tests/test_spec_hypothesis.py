"""Property-fuzz of the constraint compiler (VERDICT r3 item 7).

Random TableSpecs × randomly corrupted tables, three properties:

(a) verdict/violation consistency — for every row-level check,
    validate_table's per-partition n_violations equals an independent
    pure-Python count, passed == (count == 0), and the materialized
    violation rows carry exactly the expected (partition_id, check_id)
    multiset.
(b) quarantine split partitions rows exactly — clean ∪ quarantine is the
    input, each quarantined row's __failed_checks__ is exactly the
    sorted set of checks it violates, clean rows violate nothing.
(c) serde round-trip idempotence — spec → json → spec is identity, and
    re-serializing yields byte-identical json (driver-only, 200 cases).

The Python mirror re-implements the compiler's null semantics exactly:
format/domain/range checks skip nulls, NotNull/VectorShape handle them
as documented in operators/stats.violation_predicate.
"""
from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.quarantine import split_rows
from anomaly_detector_faironchain_spark.plans.serde import (
    spec_from_json,
    spec_to_json,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    Freshness,
    InRange,
    InSet,
    LengthInRange,
    NotNull,
    Regex,
    RowCheck,
    TableSpec,
    Unique,
    VectorShape,
)

# ---- strategies ------------------------------------------------------------

_S_ALPHABET = "ab01 -"
_PATTERNS = ("[a-z]+", "[0-9]+", "[a-z0-9]{2,5}", "a.*", "[^ ]*")

_s_value = st.one_of(st.none(), st.text(_S_ALPHABET, max_size=6))
_x_value = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)
_v_value = st.one_of(
    st.none(),
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=32),
            st.just(None),
        ),
        min_size=0,
        max_size=4,
    ),
)
_row = st.tuples(_s_value, _x_value, _v_value)
_rows = st.lists(_row, min_size=1, max_size=40)


@st.composite
def _specs(draw):
    cons = []
    if draw(st.booleans()):
        cols = draw(
            st.sets(st.sampled_from(["s", "x", "v"]), min_size=1, max_size=3)
        )
        cons.append(NotNull(*sorted(cols)))
    if draw(st.booleans()):
        cons.append(Regex("s", draw(st.sampled_from(_PATTERNS))))
    if draw(st.booleans()):
        lo = draw(st.floats(-100, 100))
        hi = lo + draw(st.floats(0, 100))
        cons.append(InRange("x", lo, hi))
    if draw(st.booleans()):
        vals = draw(
            st.sets(st.text(_S_ALPHABET, max_size=4), min_size=1, max_size=5)
        )
        cons.append(InSet("s", tuple(sorted(vals))))
    if draw(st.booleans()):
        lo = draw(st.integers(0, 4))
        cons.append(LengthInRange("s", lo, lo + draw(st.integers(0, 6))))
    if draw(st.booleans()):
        cons.append(
            VectorShape(
                "v",
                dim=draw(st.integers(0, 4)),
                norm_lo=draw(st.floats(0, 2)),
                norm_hi=draw(st.floats(2, 1e6)),
            )
        )
    if not cons:
        cons.append(NotNull("s"))
    return TableSpec(
        name="fuzz", constraints=tuple(cons), partition_col="grp"
    )


# ---- pure-Python mirror of violation_predicate -----------------------------


def _is_bad_elem(e) -> bool:
    return e is None or math.isnan(e) or math.isinf(e)


def _violates(c, row) -> bool:
    s, x, v = row["s"], row["x"], row["v"]
    if isinstance(c, NotNull):
        return any(row[col] is None for col in c.cols)
    if isinstance(c, Regex):
        import re

        return s is not None and re.fullmatch(c.pattern, s) is None
    if isinstance(c, InRange):
        return x is not None and not (c.lo <= x <= c.hi)
    if isinstance(c, InSet):
        return s is not None and s not in c.values
    if isinstance(c, LengthInRange):
        return s is not None and not (c.lo <= len(s) <= c.hi)
    if isinstance(c, VectorShape):
        if v is None:
            return False
        if len(v) != c.dim or any(_is_bad_elem(e) for e in v):
            return True
        norm = 0.0
        for e in v:
            norm += e * e
        return not (c.norm_lo <= math.sqrt(norm) <= c.norm_hi)
    raise AssertionError(f"unmirrored constraint {c}")


def _mk_df(spark, rows):
    data = [
        (i, f"g{i % 3}", s, x, v) for i, (s, x, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "pk long, grp string, s string, x double, v array<double>",
    )


def _expected(spec, rows):
    """{(partition_id, check_id): count} and per-row failed sets."""
    counts: dict[tuple[str, str], int] = {}
    per_row: list[list[str]] = []
    for i, (s, x, v) in enumerate(rows):
        row = {"s": s, "x": x, "v": v}
        failed = sorted(
            c.check_id() for c in spec.constraints if _violates(c, row)
        )
        per_row.append(failed)
        for cid in failed:
            key = (f"g{i % 3}", cid)
            counts[key] = counts.get(key, 0) + 1
    return counts, per_row


# ---- properties ------------------------------------------------------------


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=_rows, spec=_specs())
def test_verdicts_match_python_mirror(spark, rows, spec):
    df = _mk_df(spark, rows)
    exp_counts, _ = _expected(spec, rows)
    res = validate_table(df, spec, materialize_violations=True)
    check_ids = {c.check_id() for c in spec.constraints}
    got = {
        (r.partition_id, r.check_id): (r.n_violations, r.passed)
        for r in res.verdicts.collect()
        if r.check_id in check_ids
    }
    # every (partition present in data) × check has a verdict row
    parts = {f"g{i % 3}" for i in range(len(rows))}
    assert {k for k in got} == {(p, c) for p in parts for c in check_ids}
    for (p, cid), (n, passed) in got.items():
        want = exp_counts.get((p, cid), 0)
        assert n == want, (p, cid, n, want)
        assert passed == (want == 0)
    # materialized violation rows carry the same multiset
    viol = {}
    for r in res.violations.collect():
        viol[(r.partition_id, r.check_id)] = (
            viol.get((r.partition_id, r.check_id), 0) + 1
        )
    assert viol == {k: v for k, v in exp_counts.items() if v}
    res.unpersist()


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(rows=_rows, spec=_specs())
def test_quarantine_partitions_rows_exactly(spark, rows, spec):
    df = _mk_df(spark, rows)
    _, per_row = _expected(spec, rows)
    clean, quarantine = split_rows(df, spec)
    got_clean = {r.pk for r in clean.collect()}
    got_q = {r.pk: list(r.failed_checks) for r in quarantine.collect()}
    assert got_clean.isdisjoint(got_q)
    assert got_clean | set(got_q) == set(range(len(rows)))
    for pk, failed in enumerate(per_row):
        if failed:
            assert got_q.get(pk) == failed, (pk, got_q.get(pk), failed)
        else:
            assert pk in got_clean


@settings(max_examples=220, deadline=None)
@given(spec=_specs(), extra=st.booleans())
def test_serde_round_trip_idempotent(spec, extra):
    if extra:
        # widen coverage with the non-row-level constraint types
        spec = TableSpec(
            name=spec.name,
            constraints=spec.constraints
            + (
                Unique("pk"),
                RowCheck("p", "x >= 0", "x must be non-negative"),
                Freshness("x", max_age=3600.0, as_of=0.0),
            ),
            partition_col=spec.partition_col,
        )
    j = spec_to_json(spec)
    back = spec_from_json(j)
    assert back == spec
    assert spec_to_json(back) == j
