"""Declarative constraint suites: TableSpec <-> JSON.

The reference keeps its validation rules as Python code inside each
loader (reference `preprocessing/validation/validate_*.py`); here the
same rules are DATA — a JSON document reviewed in PRs, shipped to
`spark-submit --files`, and versioned alongside the table it governs.
`cli validate --spec suite.json` runs a serialized suite unchanged.

Format (one table per document):

    {
      "table": "source_files",
      "partition_col": "bucket",
      "profile_len_cols": ["path", "content"],   // or null = all strings
      "refs": {"repos": "/data/repos"},          // optional name -> path
      "constraints": [
        {"type": "NotNull", "cols": ["repo", "path"]},
        {"type": "Regex", "col": "commit", "pattern": "[0-9a-f]{40}"},
        {"type": "ForeignKey", "cols": ["repo"], "ref_table": "repos",
         "ref_cols": ["repo"]},
        ...
      ]
    }

Encoding rules (all mechanical, no per-type code):
  * `type` is the constraint class name; every other key is a dataclass
    field. Omitted fields take the dataclass default.
  * tuples encode as JSON arrays (nested for SchemaMatch's
    (col, ddl_type) pairs); decode converts arrays back to tuples
    recursively so frozen-dataclass hashing keeps working.
  * non-finite floats encode as the strings "inf"/"-inf"/"nan"
    (VectorShape.norm_hi defaults to +inf; strict JSON has no Infinity).

Unknown constraint types and unknown fields fail loudly at load time —
a typo in a config must never silently drop a check.
"""

from __future__ import annotations

import dataclasses
import json
import math

from anomaly_detector_faironchain_spark.plans import spec as spec_mod
from anomaly_detector_faironchain_spark.plans.spec import Constraint, TableSpec


def _registry() -> dict[str, type]:
    return {
        cls.__name__: cls
        for cls in vars(spec_mod).values()
        if isinstance(cls, type)
        and issubclass(cls, Constraint)
        and cls is not Constraint
    }


def _encode_value(v):
    if isinstance(v, tuple):
        return [_encode_value(x) for x in v]
    if isinstance(v, float) and not math.isfinite(v):
        if math.isnan(v):
            return "nan"
        return "inf" if v > 0 else "-inf"
    return v


def _decode_value(v, typ: str):
    # `typ` is the dataclass field's annotation string (PEP 563 — the
    # spec module uses `from __future__ import annotations` implicitly
    # via dataclass defaults; annotations arrive as strings either way
    # under get_type_hints-free introspection). Containers are decided
    # by the VALUE shape: JSON arrays become tuples recursively.
    if isinstance(v, list):
        return tuple(_decode_value(x, typ) for x in v)
    if isinstance(v, str) and v in ("inf", "-inf", "nan") and "float" in typ:
        return float(v)
    return v


def constraint_to_dict(c: Constraint) -> dict:
    d: dict = {"type": type(c).__name__}
    for f in dataclasses.fields(c):
        d[f.name] = _encode_value(getattr(c, f.name))
    return d


def constraint_from_dict(d: dict) -> Constraint:
    d = dict(d)
    try:
        tname = d.pop("type")
    except KeyError:
        raise ValueError(f"constraint entry missing 'type': {d!r}") from None
    reg = _registry()
    cls = reg.get(tname)
    if cls is None:
        raise ValueError(
            f"unknown constraint type {tname!r}; known: {sorted(reg)}"
        )
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(d) - set(fields)
    if unknown:
        raise ValueError(
            f"{tname}: unknown fields {sorted(unknown)}; "
            f"accepts {sorted(fields)}"
        )
    # Several constraint classes expose varargs constructors
    # (NotNull(*cols), MonotonicPerKey(*key_cols, ...)) for Python
    # ergonomics, so construction goes field-by-field instead of via
    # __init__; __post_init__ validation (where defined) still runs.
    missing = [
        n
        for n, f in fields.items()
        if n not in d
        and f.default is dataclasses.MISSING
        and f.default_factory is dataclasses.MISSING
    ]
    if missing:
        raise ValueError(f"{tname}: missing required fields {missing}")
    obj = object.__new__(cls)
    for n, f in fields.items():
        if n in d:
            val = _decode_value(d[n], str(f.type))
        elif f.default is not dataclasses.MISSING:
            val = f.default
        else:
            val = f.default_factory()
        object.__setattr__(obj, n, val)
    post = getattr(obj, "__post_init__", None)
    if post is not None:
        post()
    return obj


def spec_to_dict(spec: TableSpec) -> dict:
    return {
        "table": spec.name,
        "partition_col": spec.partition_col,
        "profile_len_cols": (
            None
            if spec.profile_len_cols is None
            else list(spec.profile_len_cols)
        ),
        "refs": dict(spec.refs),
        "constraints": [constraint_to_dict(c) for c in spec.constraints],
    }


def spec_from_dict(d: dict) -> TableSpec:
    extra = set(d) - {
        "table", "partition_col", "profile_len_cols", "refs", "constraints"
    }
    if extra:
        raise ValueError(f"unknown TableSpec fields {sorted(extra)}")
    if "table" not in d or "constraints" not in d:
        raise ValueError("spec document needs 'table' and 'constraints'")
    plc = d.get("profile_len_cols")
    return TableSpec(
        name=d["table"],
        partition_col=d.get("partition_col"),
        profile_len_cols=None if plc is None else tuple(plc),
        refs=dict(d.get("refs") or {}),
        constraints=tuple(
            constraint_from_dict(c) for c in d["constraints"]
        ),
    )


def spec_to_json(spec: TableSpec, indent: int | None = 2) -> str:
    return json.dumps(spec_to_dict(spec), indent=indent)


def spec_from_json(text: str) -> TableSpec:
    d = json.loads(text)
    if "suite" in d:
        raise ValueError(
            "this is a multi-table suite document; load it with "
            "suite_from_json"
        )
    return spec_from_dict(d)


def suite_to_json(
    specs: dict[str, TableSpec],
    inputs: dict[str, str] | None = None,
    indent: int | None = 2,
) -> str:
    """Multi-table document: {"suite": [<table doc> ...]}, each table
    doc optionally carrying "input" (the table's path) so
    `cli validate --spec suite.json` needs no per-table flags."""
    inputs = inputs or {}
    docs = []
    for name, spec in specs.items():
        d = spec_to_dict(spec)
        if name in inputs:
            d["input"] = inputs[name]
        docs.append(d)
    return json.dumps({"suite": docs}, indent=indent)


def suite_from_json(
    text: str,
) -> tuple[dict[str, TableSpec], dict[str, str]]:
    """Returns ({table_name: TableSpec}, {table_name: input_path}) —
    the second dict holds only tables whose doc declared "input"."""
    d = json.loads(text)
    if "suite" not in d:
        # a single-table document is a suite of one
        spec = spec_from_dict(d)
        return {spec.name: spec}, {}
    extra = set(d) - {"suite"}
    if extra:
        raise ValueError(f"unknown suite-document fields {sorted(extra)}")
    specs: dict[str, TableSpec] = {}
    inputs: dict[str, str] = {}
    for doc in d["suite"]:
        doc = dict(doc)
        inp = doc.pop("input", None)
        spec = spec_from_dict(doc)
        if spec.name in specs:
            raise ValueError(f"duplicate table {spec.name!r} in suite")
        specs[spec.name] = spec
        if inp is not None:
            inputs[spec.name] = inp
    return specs, inputs
