"""Temporal joins the built-in operators don't express directly:

- ``asof_join`` — for every left row, the latest right row with
  ``right.ts <= left.ts`` per key (pandas ``merge_asof`` / DuckDB
  ``ASOF JOIN`` semantics), built as ONE union + ONE keyed window:
  no range explosion, no per-key cross product, one shuffle total.
- ``interval_join`` — left rows matched to right rows whose timestamp
  falls in ``(left.ts + lower, left.ts + upper]``, built as a bucketed
  equi-join: time is floored to buckets of the interval width so each
  left row probes at most 3 buckets, keeping the candidate set
  time-local instead of fanning out a whole key's history.

Why not a plain inequality join: Catalyst turns a pure range predicate
into BroadcastNestedLoopJoin (O(n·m) per key pair), and even with an
equi-key a hot key (one user with 10^6 events) produces 10^12
candidate pairs before the range filter. The union-window as-of is
O(n log n) per key partition-locally; the bucketed interval join bounds
candidates to rows within ~2 interval-widths of each other.

These generalize the reference's stage-wise timestamp attachment
(reference: graph/construction/load_clean_edgelist.py:41-54 joins
transfers to the block table on exact ids; a production chain feed needs
the nearest-block-at-or-before semantics implemented here).

Scale notes (100 TB):
- asof_join shuffles left+right ONCE on the key columns; per-key state
  is a sort within the partition (Spark's window sort spills to disk).
  Skewed keys serialize within the key — unavoidable for as-of
  semantics (the match depends on every earlier right row), mitigated
  upstream by deduplicating the right side per (key, ts).
- interval_join shuffles on (key, bucket); a hot key is spread across
  its time buckets, so a single account's years of history never land
  in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join", "monotonic_violations"]


def _epoch_seconds(col: F.Column, dtype: str) -> F.Column:
    """Seconds-since-epoch as double, microsecond-exact, for numeric or
    TIMESTAMP/TIMESTAMP_NTZ columns (Spark 4 forbids a direct
    timestamp→double cast). NTZ wall-clock is interpreted in the session
    time zone — session.py pins it to UTC, the same convention DuckDB's
    epoch() uses for naive timestamps."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp_ltz")) / F.lit(1_000_000.0)
    return col.cast("double")


def _auto_segment_width(
    left: DataFrame, right: DataFrame, on: list[str],
    left_ts: str, right_ts: str, ts_t: str,
    target_rows: int = 12288, hot_factor: int = 4,
) -> float | None:
    """Derive a segment width from a per-key (count, timespan) profile —
    the docstring's manual prescription ("hot keys ~10^2-10^4 rows per
    segment"), automated. One aggregation job over (keys, ts) of both
    sides (map-side combined, key-cardinality output):

      * no key holds more than hot_factor·target_rows rows → None (the
        single-shuffle unsegmented plan; segmentation's second right
        shuffle would buy nothing);
      * else width = min over hot keys of span·target_rows/count, i.e.
        the widest segments that still cap EVERY hot key's expected
        rows-per-segment at target_rows (measured sweet spot ~12k on
        the 50%-hot-key A/B fixture, tools/asof_ab.py; uniform-arrival
        estimate —
        burstier keys still serialize within a burst's segment, which
        tolerance/width tuning can't fix without data-dependent cuts).
        Keys whose rows share one timestamp (span 0) are unsplittable
        and ignored; if every hot key is like that → None.
    """
    u = left.select(
        *on, _epoch_seconds(F.col(left_ts), ts_t).alias("__t__")
    ).unionByName(right.select(
        *on,
        _epoch_seconds(F.col(right_ts).cast(ts_t), ts_t).alias("__t__"),
    ))
    cnt = F.count(F.lit(1))
    span = F.max("__t__") - F.min("__t__")
    prof = u.groupBy(*on).agg(cnt.alias("__n__"), span.alias("__span__"))
    row = prof.agg(
        F.min(
            F.when(
                (F.col("__n__") > hot_factor * target_rows)
                & (F.col("__span__") > 0),
                F.col("__span__") * target_rows / F.col("__n__"),
            )
        ).alias("w")
    ).first()
    return float(row["w"]) if row["w"] is not None else None


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_asof",
    segment_width: float | str | None = None,
) -> DataFrame:
    """Backward as-of join: attach, to every left row, ``value_cols``
    from the latest right row with ``right.ts <= left.ts`` (inclusive)
    sharing the ``on`` keys, plus the matched timestamp as
    ``{left_ts}{suffix}``.

    ``segment_width`` (seconds) opts into the skew-mitigating plan: each
    key's timeline is cut into segments of that width and the keyed
    window runs per (key, segment) instead of per key, so one hot key's
    years of history no longer serialize in a single task. Correctness
    across segment boundaries is preserved by injecting, into every
    segment that has left rows, one synthetic "carry-in" right row — the
    latest right row from any STRICTLY earlier segment — computed with a
    per-segment groupBy + a key-level running max over the (tiny,
    one-row-per-populated-segment) summaries. Cost: the right side is
    shuffled twice (once for the summaries, once in the main window)
    instead of once; choose a width that gives hot keys ~10^2-10^4 rows
    per segment. Leave ``None`` (default) for the single-shuffle plan.
    ``segment_width="auto"`` derives the width from a cheap per-key
    (count, timespan) profile job (see _auto_segment_width): it picks
    the widest segments that cap every hot key at ~12k expected rows
    (the A/B-measured sweet spot), and falls back to the unsegmented
    plan when no key is hot enough (>32k rows) to justify the second
    shuffle — so "auto" is safe to pass unconditionally on unknown key
    distributions.

    Timestamps may be numeric or TIMESTAMP (compared with plain
    ordering; ``tolerance`` — max allowed left.ts − right.ts — is in
    seconds when the column is a TIMESTAMP).

    Determinism: if the right side has several rows at the same
    (key, ts) the column values of the LAST one in an unspecified order
    would win; deduplicate the right side per (key, ts) first (e.g.
    ``groupBy(key, ts).agg(max(...))``) when exact reproducibility is
    required — the oracle-verified suite query does exactly that.

    Plan shape: union → single hash-partitioned window (partitionBy keys,
    orderBy ts with right rows sorting before left rows at equal ts so
    the inclusive match holds) → filter back to left rows. One Exchange.
    """
    right_ts = right_ts or left_ts
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    ts_t = dict(left.dtypes)[left_ts]

    matched_ts = f"{left_ts}{suffix}"
    carried = {c: f"{c}{suffix}" if c in left.columns else c for c in value_cols}

    l_side = left.select(
        "*",
        F.lit(1).alias("__is_left__"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(carried[c])
          for c in value_cols],
        F.lit(None).cast(ts_t).alias(matched_ts),
    )
    left_only = [c for c in left.columns if c not in set(on) | {left_ts}]
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast(ts_t).alias(left_ts),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes
          if c in left_only],
        F.lit(0).alias("__is_left__"),
        *[F.col(c).alias(carried[c]) for c in value_cols],
        F.col(right_ts).cast(ts_t).alias(matched_ts),
    ).select(*l_side.columns)  # align union column order

    if segment_width == "auto":
        segment_width = _auto_segment_width(
            left, right, on, left_ts, right_ts, ts_t)
    elif isinstance(segment_width, str):
        raise ValueError(
            f"segment_width must be a number, 'auto', or None — "
            f"got {segment_width!r}")

    part_cols = list(on)
    if segment_width is None:
        unioned = l_side.unionByName(r_side)
    else:
        width = float(segment_width)
        if width <= 0:
            raise ValueError("segment_width must be positive")
        seg = F.floor(
            _epoch_seconds(F.col(left_ts), ts_t) / F.lit(width)
        ).cast("long").alias("__seg__")
        l_seg = l_side.select("*", seg)
        r_seg = r_side.select("*", seg)

        # Latest right row per populated (key, segment): struct max is
        # ordered by its first field (ts), so the running max over
        # segments is the cumulative latest right row per key. Value
        # ties at equal ts resolve to the max struct — same contract as
        # the unsegmented path (dedup right per (key, ts) upstream).
        summary = r_seg.groupBy(*on, "__seg__").agg(
            F.max(
                F.struct(
                    F.col(left_ts).alias("__ts__"),
                    *[F.col(carried[c]).alias(carried[c]) for c in value_cols],
                )
            ).alias("__s__")
        )
        w_cum = (
            Window.partitionBy(*on)
            .orderBy("__seg__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = summary.select(
            *on, "__seg__",
            F.max("__s__").over(w_cum).alias("__s__"),
            F.lit(1).alias("__has_r__"),
        )
        # As-of at segment granularity: for each left segment, the
        # cumulative-latest right row from a strictly earlier segment.
        # Left segment probes (__has_r__=0) sort BEFORE summaries at the
        # same segment, so same-segment right rows are excluded — they
        # are matched positionally inside the main window instead.
        probes = l_seg.select(*on, "__seg__").distinct().select(
            "*",
            F.lit(None).cast(dict(cum.dtypes)["__s__"]).alias("__s__"),
            F.lit(0).alias("__has_r__"),
        )
        w_carry = (
            Window.partitionBy(*on)
            .orderBy(F.col("__seg__").asc(), F.col("__has_r__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = (
            probes.unionByName(cum.select(*probes.columns))
            .select(
                *on, "__seg__", "__has_r__",
                F.last("__s__", ignorenulls=True).over(w_carry).alias("__c__"),
            )
            .filter((F.col("__has_r__") == 0) & F.col("__c__").isNotNull())
        )
        carry_rows = carry.select(
            *[F.col(c) for c in on],
            F.col("__c__.__ts__").alias(left_ts),
            *[F.lit(None).cast(dict(l_side.dtypes)[c]).alias(c)
              for c in left_only],
            F.lit(0).alias("__is_left__"),
            *[F.col(f"__c__.{carried[c]}").alias(carried[c])
              for c in value_cols],
            F.col("__c__.__ts__").alias(matched_ts),
            F.col("__seg__"),
        ).select(*l_seg.columns)
        unioned = l_seg.unionByName(r_seg).unionByName(carry_rows)
        part_cols = [*on, "__seg__"]

    # right rows (__is_left__=0) sort before left rows at equal ts →
    # inclusive <= match; running last(ignorenulls) carries them forward.
    # A carry-in row's ts precedes the segment start, so it sorts first
    # within its (key, segment) partition by construction.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(left_ts).asc(), F.col("__is_left__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(carried[c], ignorenulls=True).over(w).alias(f"__f_{carried[c]}")
          for c in value_cols],
        F.last(matched_ts, ignorenulls=True).over(w).alias(f"__f_{matched_ts}"),
    )

    out = filled.filter(F.col("__is_left__") == 1)
    in_tol = F.lit(True)
    if tolerance is not None:
        gap = _epoch_seconds(F.col(left_ts), ts_t) - _epoch_seconds(
            F.col(f"__f_{matched_ts}"), ts_t
        )
        in_tol = gap <= F.lit(float(tolerance))
    keep = [c for c in left.columns]
    proj = [F.col(c) for c in keep]
    for c in value_cols:
        proj.append(
            F.when(in_tol, F.col(f"__f_{carried[c]}")).alias(carried[c])
        )
    proj.append(F.when(in_tol, F.col(f"__f_{matched_ts}")).alias(matched_ts))
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """Candidate-bounded interval join: rows of ``right`` whose timestamp
    lies in ``(left.ts + lower, left.ts + upper]`` for the same ``on``
    keys (strict lower / inclusive upper — the windowed-follow-up shape;
    seconds when the ts columns are TIMESTAMPs).

    Returns left columns + right columns (right ts aliased ``__r_ts__``
    when names collide) as an INNER match set; aggregate or left-join it
    back for per-left-row counts.

    Bucketing: both sides are floored to buckets of ``bucket_width``
    (default: the interval span ``upper - lower``); each left row probes
    the buckets its interval can overlap (≤ span/width + 2 buckets via
    sequence()), the join is a pure equi-join on (keys…, bucket) —
    hash-join, never BroadcastNestedLoopJoin — and the exact range
    predicate filters the bucket-local candidates.
    """
    span = upper - lower
    if span <= 0:
        raise ValueError("upper must exceed lower")
    w = float(bucket_width or span)

    lts = _epoch_seconds(F.col(left_ts), dict(left.dtypes)[left_ts])
    rts = _epoch_seconds(F.col(right_ts), dict(right.dtypes)[right_ts])

    rename_r = {
        c: (f"__r_{c}__" if c in left.columns and c not in on else c)
        for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(rename_r[c]) for c in right.columns],
        F.floor(rts / w).cast("long").alias("__bucket__"),
    )
    l = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((lts + F.lit(lower)) / w).cast("long"),
                F.floor((lts + F.lit(upper)) / w).cast("long"),
            )
        ).alias("__bucket__"),
    )
    rt_dtype = dict(right.dtypes)[right_ts]
    r_ts_col = _epoch_seconds(F.col(rename_r[right_ts]), rt_dtype)
    l_ts_col = _epoch_seconds(F.col(left_ts), dict(left.dtypes)[left_ts])
    joined = l.join(r, [*on, "__bucket__"]).filter(
        (r_ts_col > l_ts_col + F.lit(lower))
        & (r_ts_col <= l_ts_col + F.lit(upper))
    )
    return joined.drop("__bucket__")


def monotonic_violations(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    strict: bool = False,
    partition_id: F.Column | None = None,
) -> DataFrame:
    """Rows violating per-key monotonicity: within each key, `value_col`
    must be non-decreasing (strict=True: strictly increasing) as
    `order_col` increases. A row violates iff the max value over rows of
    the same key with a STRICTLY smaller order exceeds (>=, when strict)
    its own value — expressed as a running max over a RANGE frame ending
    at -1, so ties in `order_col` never compare against each other and
    the result needs no tiebreaker to be deterministic.

    Returns (partition_id, *key_cols, order_col, value_col, prev_max)
    for the violating rows only. Rows with a null key component, null
    order, or null value are skipped (NotNull covers those).

    ONE keyed window pass: shuffle by key_cols, sort by order_col within
    the key (Spark's window sort spills, so a large key is slow but
    safe); a mega-key serializes in one task — the same hazard as any
    partitionBy window, mitigated upstream (whitelist known mega-keys or
    segment the order domain as segmented asof_join does). `order_col`
    must be numeric or date (RANGE frame requirement).
    """
    nn = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    for k in key_cols:
        nn = nn.filter(F.col(k).isNotNull())
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(value_col).over(w)
    pid = partition_id if partition_id is not None else F.lit("__whole_table__")
    out = nn.select(
        pid.alias("partition_id"),
        *[F.col(k) for k in key_cols],
        F.col(order_col),
        F.col(value_col),
        prev_max.alias("prev_max"),
    )
    bad = (
        (F.col("prev_max") >= F.col(value_col))
        if strict
        else (F.col("prev_max") > F.col(value_col))
    )
    return out.filter(F.col("prev_max").isNotNull() & bad)
