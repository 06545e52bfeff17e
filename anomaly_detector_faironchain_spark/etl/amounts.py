"""Unbounded (uint256 / Wei) amount handling.

The reference parses 64-hex-digit Wei values with Python `int(x, 16)`
(reference: etl/abstract/build_abstract_token_transfer.py:44) and stores
them as STRINGS in parquet because they can exceed int64
(reference: etl/abstract/convert_abstract_csv_to_parquet.py:29-30).

Spark has no 256-bit integer (SURVEY.md §1.2). Policy here:
  * `amount_digits` — exact decimal-digit string for any 0x-hex up to 64
    nibbles, via a VECTORIZED Arrow UDF (`int(x,16)` per batch; the only
    place Python is allowed because no builtin covers 2^256);
  * `amount_dec38` — Decimal(38,0) materialization for arithmetic, exact
    whenever the value has ≤ 38 digits (~1.7e20 ETH — beyond any real
    total supply), NULL + overflow flag otherwise;
  * `hex_to_long` — pure-SQL fast path for values known to fit int64
    (≤ 15 nibbles), zero Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_DEC38_DIGITS = 38


@F.pandas_udf(T.StringType())
def _hex_to_digits(s: pd.Series) -> pd.Series:
    """Arrow-batched exact conversion: '0x…' hex → decimal digit string.
    Null-safe; invalid hex → null (mirrors pd.to_numeric errors='coerce')."""

    def conv(x):
        if x is None:
            return None
        try:
            return str(int(x, 16))
        except (ValueError, TypeError):
            return None

    return s.map(conv)


def hex_to_digits(col: Column) -> Column:
    return _hex_to_digits(col)


def hex_to_long(col: Column) -> Column:
    """Pure-SQL path for hex values that fit int64: conv() is exact up to
    unsigned 64-bit; the cast guards the signed boundary."""
    return F.conv(F.regexp_replace(col, "^0x", ""), 16, 10).cast("long")


def amount_columns(hex_col: Column) -> list[Column]:
    """The standard amount triple: digits (exact), dec38 (arithmetic),
    overflow flag."""
    digits = hex_to_digits(hex_col)
    return [
        digits.alias("amount_digits"),
        F.when(F.length(digits) <= MAX_DEC38_DIGITS, digits)
        .otherwise(F.lit(None))
        .cast(T.DecimalType(38, 0))
        .alias("amount_dec38"),
        (F.length(digits) > MAX_DEC38_DIGITS).alias("amount_overflow"),
    ]


def wei_to_eth(col: Column) -> Column:
    """Display conversion, 6 dp fixed — reference api/utils.py:6-15
    (f"{wei/1e18:.6f}", no thousands grouping). The 6dp rounding is made
    explicit at integer micro-ETH scale (floor(x/1e12 + 0.5), HALF_UP) so
    every engine renders the identical string; the reference's f-string
    delegates exact ties to the platform float formatter instead."""
    micro = F.floor(col.cast("double") / 1e12 + F.lit(0.5))
    return F.format_string("%.6f", micro / 1e6)
