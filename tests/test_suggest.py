"""Constraint-suggestion engine (plans/suggest.py).

The rules must be deterministic, the suggested spec must round-trip
through plans/serde unchanged, and — the defining property — the spec
must be self-consistent: validating the exact input that produced it
passes every suggested check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.serde import (
    spec_from_json,
    spec_to_json,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    InRange,
    InSet,
    LengthInRange,
    NotNull,
    Regex,
    Unique,
    VectorShape,
)
from anomaly_detector_faironchain_spark.plans.suggest import (
    suggest_constraints,
)


def _fixture(spark):
    """Six columns, one per rule family:
      id        - unique, no nulls            -> NotNull, Unique, InRange
      status    - 3-value enum, no nulls      -> NotNull, InSet
      commit    - fixed-width hex, no nulls   -> NotNull, Regex([0-9a-f]{8}), LengthInRange
      seq       - all-digits string w/ nulls  -> Regex([0-9]+), LengthInRange (no NotNull)
      score     - numeric with nulls          -> InRange only
      deadcol   - all NULL                    -> nothing
    """
    rows = [
        (
            i,
            ["open", "closed", "stale"][i % 3],
            f"{i * 2654435761 % (1 << 32):08x}",
            str(i * 7) if i % 5 else None,
            float(i) / 4.0 if i % 3 else None,
            None,
        )
        for i in range(1, 101)
    ]
    return spark.createDataFrame(
        rows,
        "id long, status string, commit string, seq string, "
        "score double, deadcol string",
    )


def test_exact_mode_rule_table(spark):
    rep = suggest_constraints(_fixture(spark), "t", distinct_mode="exact")
    by = {(s.column, s.kind): s for s in rep.suggestions}

    assert by[("id", "not_null")].constraint == NotNull("id")
    assert by[("id", "unique")].constraint == Unique("id")
    assert by[("id", "in_range")].constraint == InRange("id", 1.0, 100.0)

    assert by[("status", "not_null")].constraint == NotNull("status")
    assert by[("status", "in_set")].constraint == InSet(
        "status", ("closed", "open", "stale")
    )
    # enum columns get no length/regex suggestions
    assert ("status", "length_in_range") not in by
    assert ("status", "regex") not in by

    # fixed-width hex pins the length in the pattern; unique fires too
    # (every commit distinct)
    assert by[("commit", "regex")].constraint == Regex("commit", "[0-9a-f]{8}")
    assert by[("commit", "length_in_range")].constraint == LengthInRange(
        "commit", 8, 8
    )
    assert ("commit", "unique") in by

    # nullable column: no NotNull, no Unique, but format still suggested
    assert ("seq", "not_null") not in by
    assert ("seq", "unique") not in by
    assert by[("seq", "regex")].constraint == Regex("seq", "[0-9]+")

    assert ("score", "not_null") not in by
    assert by[("score", "in_range")].kind == "in_range"

    # the all-null column contributes nothing
    assert not [s for s in rep.suggestions if s.column == "deadcol"]


def test_suggested_spec_is_self_consistent(spark):
    df = _fixture(spark)
    rep = suggest_constraints(df, "t", distinct_mode="exact")
    res = validate_table(df, rep.spec(), materialize_violations=False)
    bad = [r for r in res.verdicts.collect() if not r["passed"]]
    assert bad == [], f"suggested spec fails on its own input: {bad}"


def test_serde_round_trip(spark):
    rep = suggest_constraints(_fixture(spark), "t", distinct_mode="exact")
    spec = rep.spec(partition_col="status")
    assert spec_from_json(spec_to_json(spec)) == spec


def test_approx_mode_suggests_screen_unique(spark):
    rep = suggest_constraints(_fixture(spark), "t", distinct_mode="approx")
    uniq = {s.column: s for s in rep.suggestions if s.kind == "unique"}
    # at 100 rows the HLL estimate sits well within 3*rsd of the count
    assert "id" in uniq
    assert uniq["id"].constraint.mode == "approx_screen"
    # non-key columns must NOT be flagged (status: 3 distinct)
    assert "status" not in uniq


def test_vector_shape_and_empty_table(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(10)],
        "vid long, vec array<double>",
    )
    rep = suggest_constraints(emb, "e", distinct_mode="exact")
    by = {(s.column, s.kind): s for s in rep.suggestions}
    assert by[("vec", "vector_shape")].constraint == VectorShape("vec", 3)

    empty = emb.filter(F.lit(False))
    assert suggest_constraints(empty, "e").suggestions == ()


def test_fd_candidate_screen(spark):
    # city -> country holds; country -> city does not (one-to-many)
    df = spark.createDataFrame(
        [("paris", "fr"), ("lyon", "fr"), ("berlin", "de"),
         ("paris", "fr"), ("munich", "de")],
        "city string, country string",
    )
    rep = suggest_constraints(
        df, "t", distinct_mode="exact",
        fd_candidates=(("city", "country"), ("country", "city")),
    )
    fds = [s for s in rep.suggestions if s.kind == "functional_dependency"]
    assert len(fds) == 1
    assert fds[0].constraint.determinant == ("city",)
    assert fds[0].constraint.dependent == "country"
    # suggested FD validates clean on its own input
    res = validate_table(df, rep.spec(), materialize_violations=False)
    assert all(r["passed"] for r in res.verdicts.collect())


def test_regex_gated_by_length_cap(spark):
    # values longer than regex_max_len never match, so an all-digits
    # column with one long value loses the format suggestion instead of
    # paying rlike over megabyte bodies at scale
    rows = [(str(10**9 + i),) for i in range(30)] + [("2" * 300,)]
    df = spark.createDataFrame(rows, "v string")  # 31 distinct: not enum
    rep = suggest_constraints(df, "t", distinct_mode="exact",
                              regex_max_len=256)
    assert not [s for s in rep.suggestions if s.kind == "regex"]
    # dropping the long row restores the suggestion
    rep2 = suggest_constraints(
        df.filter(F.length("v") < 256), "t", distinct_mode="exact"
    )
    assert [s.constraint for s in rep2.suggestions if s.kind == "regex"] == [
        Regex("v", "[0-9]+")
    ]
