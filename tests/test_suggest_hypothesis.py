"""Property-fuzz of the suggestion engine (VERDICT r4 item 9).

Defining property, over randomized tables: a suggested spec must accept
its own evidence — `validate_table(df, suggest_constraints(df).spec())`
produces ZERO failed verdicts and zero violations on the exact input
that produced the spec. Plus serde: every suggested spec survives
spec → json → spec identity with byte-identical re-serialization.

Tables are adversarial by construction: random column kinds (enum-ish
strings, digit strings, hex-ish strings, free text, ints-as-doubles,
longs, float vectors of fixed or ragged size, all-NULL columns), random
null rates, duplicate rows, empty tables, and optional FD candidate
pairs. 30 Spark-validated cases + 200 driver-side serde cases per run
(each Spark case is ~5 jobs; the serde property reuses Spark only to
build the profile once per case-batch via cached example specs).
"""
from __future__ import annotations

from hypothesis import HealthCheck, given, seed, settings
from hypothesis import strategies as st

from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.serde import (
    spec_from_json,
    spec_to_json,
)
from anomaly_detector_faironchain_spark.plans.suggest import suggest_constraints

# ---- random-table strategies ----------------------------------------------

_ENUM = ("open", "closed", "stale", "ok")
_COL_KINDS = ("enum", "digits", "hexish", "text", "num", "int", "vec", "null")


def _cell(kind: str, rng) -> object:
    if rng.random() < 0.15 and kind != "null":
        return None
    if kind == "enum":
        return _ENUM[rng.randrange(len(_ENUM))]
    if kind == "digits":
        return str(rng.randrange(10 ** rng.randrange(1, 6)))
    if kind == "hexish":
        return f"{rng.randrange(1 << 32):08x}"
    if kind == "text":
        return "".join(rng.choice("ab c-Z.9") for _ in range(rng.randrange(12)))
    if kind == "num":
        return float(rng.randrange(-1000, 1000))  # exact in double
    if kind == "int":
        return rng.randrange(-50, 50)
    if kind == "vec":
        return [float(rng.randrange(100)) for _ in range(4)]
    return None  # all-NULL column


_SPARK_T = {"enum": "string", "digits": "string", "hexish": "string",
            "text": "string", "num": "double", "int": "long",
            "vec": "array<double>", "null": "string"}

_s_table = st.builds(
    lambda seed_, kinds, n_rows, ragged, dup: (seed_, kinds, n_rows,
                                               ragged, dup),
    st.integers(0, 2**31),
    st.lists(st.sampled_from(_COL_KINDS), min_size=1, max_size=4),
    st.integers(0, 40),
    st.booleans(),
    st.booleans(),
)


def _build(spark, params):
    import random

    seed_, kinds, n_rows, ragged, dup = params
    rng = random.Random(seed_)
    rows = [tuple(_cell(k, rng) for k in kinds) for _ in range(n_rows)]
    if ragged:  # ragged vectors must suppress VectorShape
        rows = [tuple(v[:-1] if isinstance(v, list) and rng.random() < 0.5
                      else v for v in r) for r in rows]
    if dup and rows:  # duplicates must suppress Unique
        rows = rows + [rows[0]]
    schema = ", ".join(f"c{i} {_SPARK_T[k]}" for i, k in enumerate(kinds))
    return spark.createDataFrame(rows, schema), kinds


_collected_specs: list = []


@seed(20260821)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(params=_s_table, use_fd=st.booleans())
def test_suggested_spec_accepts_its_own_evidence(spark, params, use_fd):
    df, kinds = _build(spark, params)
    fd = ()
    str_cols = [f"c{i}" for i, k in enumerate(kinds)
                if k in ("enum", "digits", "hexish", "text")]
    if use_fd and len(str_cols) >= 2:
        fd = ((str_cols[0], str_cols[1]),)
    rep = suggest_constraints(df, "fuzz", distinct_mode="exact",
                              fd_candidates=fd)
    spec = rep.spec()
    _collected_specs.append(spec)
    res = validate_table(df, spec, materialize_violations=True)
    verdicts = res.verdicts.collect()
    bad = [r for r in verdicts if not r["passed"]]
    assert bad == [], f"suggested spec rejects its own evidence: {bad}"
    assert res.violations.count() == 0
    # all-NULL columns must contribute no suggestions
    for i, k in enumerate(kinds):
        if k == "null":
            assert not [s for s in rep.suggestions if s.column == f"c{i}"]


@settings(max_examples=200, deadline=None)
@given(idx=st.integers(0, 10**6), pcol=st.booleans())
def test_suggested_specs_serde_round_trip(idx, pcol):
    """Serde identity over the specs the Spark property produced (the
    pool holds 30 randomized suggested specs; 200 draws re-check each
    with and without a partition column)."""
    if not _collected_specs:  # property above must run first (file order)
        return
    spec = _collected_specs[idx % len(_collected_specs)]
    if pcol and spec.constraints:
        spec = type(spec)(
            name=spec.name, partition_col=spec.constraints[0].columns()[0]
            if hasattr(spec.constraints[0], "columns") else None,
            constraints=spec.constraints,
        )
    j = spec_to_json(spec)
    back = spec_from_json(j)
    assert back == spec
    assert spec_to_json(back) == j
