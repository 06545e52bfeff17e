"""Self-check: run every suite query on Spark and its oracle on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Mimics the driver's correctness gate so mismatches surface before a round
ends. Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from anomaly_detector_faironchain_spark.session import get_spark  # noqa: E402
from anomaly_detector_faironchain_spark import suite  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        # exact double identity, not display rounding
        return repr(v)
    if isinstance(v, bool):
        return f"b:{v}"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(canon_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    n_run = 0
    for name, fn in suite.QUERIES.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        sql = suite.ORACLES.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check), rows={len(s_rows)}")
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            a = canon_rows(s_cols, s_rows)
            b = canon_rows(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                extra_a = [r for r in a if r not in set(map(tuple, b))][:2]
                problems.append(f"values differ; first diffs={diff} only_spark={extra_a}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: rows={len(s_rows)}")
    print(f"\n{n_run - len(failures)}/{n_run} queries match"
          + ("" if not only else f" (of {len(suite.QUERIES)} registered)"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
