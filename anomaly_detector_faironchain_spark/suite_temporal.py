"""Temporal-join + mergeable-sketch queries with DuckDB oracles.

- asof_attribution: every purchase event attributed to the user's most
  recent prior view (pandas merge_asof / DuckDB ASOF JOIN semantics)
  via the one-shuffle union-window asof_join operator, with a 1-day
  tolerance.
- interval_follow: per event, count + value of same-user follow-up
  events within the next hour, via the bucketed interval_join (equi
  hash join on (user, time-bucket), never a nested-loop range join).
- hll_uniqueness_screen: the uniqueness screen computed from MERGEABLE
  HLL sketches (hll_sketch_agg) instead of approx_count_distinct
  numbers — the form that supports checkpoint/resume merging
  (plans/checkpoint.write_key_sketches). The oracle recomputes the
  same verdict from exact distinct counts; the dup ratios in the test
  data sit far from the 0.8 threshold, so the ~2.5% sketch error can
  never flip a verdict.
- kll_length_quantiles: per-lang document length quantiles from
  MERGEABLE KLL sketches (kll_sketch_agg_bigint) plus a corpus row
  built by MERGING the per-lang sketches — the checkpoint/resume form
  of the length-quantile profile (plans/checkpoint.write_value_sketches).
  With k=8192 every sketch stays in exact mode at oracle scale (each
  group and the merged corpus hold < k values, so no compaction and no
  randomness), and Datasketches' inclusive-rank quantile is exactly the
  order statistic at 1-based rank ceil(q·n) — which is what the DuckDB
  oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.temporal import (
    asof_join,
    interval_join,
)
from anomaly_detector_faironchain_spark.operators.uniqueness import (
    hll_partition_sketches,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- as-of join -------------------------------------------------------------

def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # dedup views per (user, ts) so the as-of match is deterministic
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        value_cols=["view_value"],
        tolerance=86400.0,
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.round("view_value", 4).cast("double").alias("view_value"),
    )


ORACLE_ASOF_ATTRIBUTION = """
WITH views AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), m AS (
  SELECT l.event_id, l.user_id, l.ts AS pts, r.ts AS vts, r.view_value
  FROM (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase') l
  ASOF LEFT JOIN views r
    ON l.user_id = r.user_id AND r.ts <= l.ts
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN epoch(pts) - epoch(vts) <= 86400.0
            THEN strftime(vts, '%Y-%m-%d %H:%M:%S') END AS view_ts,
       CAST(CASE WHEN epoch(pts) - epoch(vts) <= 86400.0
            THEN ROUND(view_value, 4) END AS DOUBLE) AS view_value
FROM m
"""


# -- interval join ----------------------------------------------------------

def q_interval_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    pairs = interval_join(
        ev,
        ev.select(
            F.col("event_id").alias("r_event_id"),
            F.col("user_id"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        ),
        on=["user_id"],
        left_ts="ts",
        right_ts="r_ts",
        lower=0.0,
        upper=3600.0,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.sum("r_value").alias("follow_value"),
    )
    return (
        ev.join(counts, "event_id", "left")
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.coalesce(F.col("n_follow"), F.lit(0)).cast("long")
            .alias("n_follow"),
            F.round(F.coalesce(F.col("follow_value"), F.lit(0.0)), 4)
            .cast("double").alias("follow_value"),
        )
    )


ORACLE_INTERVAL_FOLLOW = """
SELECT CAST(l.event_id AS BIGINT) AS event_id,
       CAST(COUNT(r.event_id) AS BIGINT) AS n_follow,
       CAST(ROUND(COALESCE(SUM(r.value), 0.0), 4) AS DOUBLE) AS follow_value
FROM events l
LEFT JOIN events r
  ON r.user_id = l.user_id
 AND epoch(r.ts) > epoch(l.ts)
 AND epoch(r.ts) <= epoch(l.ts) + 3600.0
GROUP BY 1
"""


# -- mergeable HLL uniqueness screen ---------------------------------------

def q_hll_uniqueness_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def screen(key_cols: list[str], check_id: str) -> DataFrame:
        sk = hll_partition_sketches(ev, key_cols, "event_type")
        return sk.select(
            F.col("partition_id"),
            F.lit(check_id).alias("check_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("distinct_estimate") < 0.8 * F.col("n_rows"))
            .alias("is_suspect"),
        )

    return screen(["user_id", "ts", "event_id"], "uniq_full_key").unionByName(
        screen(["user_id"], "uniq_user_id")
    )


ORACLE_HLL_UNIQUENESS_SCREEN = """
SELECT event_type AS partition_id,
       'uniq_full_key' AS check_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       COUNT(DISTINCT (user_id, ts, event_id)) < 0.8 * COUNT(*) AS is_suspect
FROM events GROUP BY 1
UNION ALL
SELECT event_type AS partition_id,
       'uniq_user_id' AS check_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       COUNT(DISTINCT user_id) < 0.8 * COUNT(*) AS is_suspect
FROM events GROUP BY 1
"""


# -- mergeable KLL length quantiles -----------------------------------------

def q_kll_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detector_faironchain_spark.operators.stats import (
        kll_partition_sketches,
        kll_quantiles,
    )

    docs = _t(spark, sf_dir, "documents")
    sk = kll_partition_sketches(docs, F.length("text"), "lang", k=8192)
    per_lang = kll_quantiles(sk, (0.5, 0.95, 0.99), k=8192)
    corpus = kll_quantiles(sk, (0.5, 0.95, 0.99), merged=True, k=8192).select(
        F.lit("__corpus__").alias("partition_id"), "n_rows",
        "p50", "p95", "p99",
    )
    return per_lang.unionByName(corpus).select(
        "partition_id",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("p50").cast("long").alias("p50"),
        F.col("p95").cast("long").alias("p95"),
        F.col("p99").cast("long").alias("p99"),
    )


ORACLE_KLL_LENGTH_QUANTILES = """
WITH lens AS (
  SELECT lang, length(text) AS len FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT lang, len,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY len) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM lens
), granked AS (
  SELECT len,
         ROW_NUMBER() OVER (ORDER BY len) AS rn,
         COUNT(*) OVER () AS n
  FROM lens
)
SELECT lang AS partition_id,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN len END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN len END) AS BIGINT) AS p95,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN len END) AS BIGINT) AS p99
FROM ranked GROUP BY 1
UNION ALL
SELECT '__corpus__' AS partition_id,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN len END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN len END) AS BIGINT) AS p95,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN len END) AS BIGINT) AS p99
FROM granked
"""


# -- snapshot table: time travel + incremental scan --------------------------

def q_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a 2-snapshot table from `documents` (snapshot 1 = doc_id %
    3 != 0, snapshot 2 appends the rest), then aggregates three reads:
    time travel to snapshot 1, the incremental scan after snapshot 1,
    and the current table. Proves commit/time-travel/incremental
    semantics against plain SQL over the same split."""
    import tempfile

    from anomaly_detector_faironchain_spark.plans.snapshots import (
        SnapshotTable,
    )

    docs = _t(spark, sf_dir, "documents")
    t = SnapshotTable.create(tempfile.mkdtemp(prefix="snaptbl_"))
    t.append(docs.filter(F.col("doc_id") % 3 != 0))
    t.append(docs.filter(F.col("doc_id") % 3 == 0))

    def agg(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        ).select("phase", "lang", "n_docs", "total_chars")

    return (
        agg(t.read(spark, snapshot_id=1), "snap1")
        .unionByName(agg(t.incremental(spark, after_id=1), "increment"))
        .unionByName(agg(t.read(spark), "current"))
    )


ORACLE_SNAPSHOT_INCREMENTAL = """
SELECT 'snap1' AS phase, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id % 3 != 0 GROUP BY 2
UNION ALL
SELECT 'increment' AS phase, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id % 3 = 0 GROUP BY 2
UNION ALL
SELECT 'current' AS phase, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 2
"""


# -- mergeable t-digest length profile ---------------------------------------

def q_tdigest_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang Hazen length quantiles from MERGEABLE t-digests plus a
    corpus row built by merging the per-lang digests — the second
    sketch family the north rule names ("KLL/t-digest"). At oracle
    scale every digest holds ≤ delta singleton centroids (no
    compression), so the midpoint-interpolated quantile is EXACTLY the
    Hazen percentile the oracle states (rank h = q·n + 0.5, linear
    interpolation, clamped). See operators/tdigest.py for the 10^12-row
    shuffle story (values never shuffle; only centroid arrays do)."""
    from anomaly_detector_faironchain_spark.operators.tdigest import (
        tdigest_partition_sketches,
        tdigest_quantiles,
    )

    docs = _t(spark, sf_dir, "documents")
    sk = tdigest_partition_sketches(docs, F.length("text"), "lang")
    per_lang = tdigest_quantiles(sk, (0.5, 0.95, 0.99))
    corpus = tdigest_quantiles(sk, (0.5, 0.95, 0.99), merged=True)
    return per_lang.unionByName(corpus).select(
        "partition_id",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        F.round("p50", 6).cast("double").alias("p50"),
        F.round("p95", 6).cast("double").alias("p95"),
        F.round("p99", 6).cast("double").alias("p99"),
    )


ORACLE_TDIGEST_LENGTH_PROFILE = """
WITH lens AS (
  SELECT lang, CAST(length(text) AS DOUBLE) AS v
  FROM documents WHERE text IS NOT NULL
), both_scopes AS (
  SELECT lang AS partition_id, v FROM lens
  UNION ALL
  SELECT '__corpus__' AS partition_id, v FROM lens
), ranked AS (
  SELECT partition_id, v,
         ROW_NUMBER() OVER (PARTITION BY partition_id ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY partition_id) AS n
  FROM both_scopes
), qs AS (
  SELECT * FROM (VALUES (0.50, 'p50'), (0.95, 'p95'), (0.99, 'p99'))
  AS t(q, name)
), pieces AS (
  SELECT r.partition_id, q.name,
         MAX(r.n) AS n, MIN(r.v) AS vmin, MAX(r.v) AS vmax,
         MAX(q.q * r.n + 0.5) AS h,
         MAX(CASE WHEN r.rn = GREATEST(1, LEAST(
               CAST(floor(q.q * r.n + 0.5) AS BIGINT), r.n))
             THEN r.v END) AS vlo,
         MAX(CASE WHEN r.rn = GREATEST(1, LEAST(
               CAST(ceil(q.q * r.n + 0.5) AS BIGINT), r.n))
             THEN r.v END) AS vhi
  FROM ranked r CROSS JOIN qs q
  GROUP BY 1, 2
), est AS (
  SELECT partition_id, name, n, vmin, vmax,
         ROUND(vlo + (h - floor(h)) * (vhi - vlo), 6) AS val
  FROM pieces
)
SELECT partition_id,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(vmin) AS DOUBLE) AS vmin,
       CAST(MAX(vmax) AS DOUBLE) AS vmax,
       CAST(MAX(CASE WHEN name = 'p50' THEN val END) AS DOUBLE) AS p50,
       CAST(MAX(CASE WHEN name = 'p95' THEN val END) AS DOUBLE) AS p95,
       CAST(MAX(CASE WHEN name = 'p99' THEN val END) AS DOUBLE) AS p99
FROM est GROUP BY 1
"""


# -- mergeable Misra-Gries heavy hitters -------------------------------------

def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 heaviest event users from MERGEABLE Misra-Gries summaries
    (the skew-diagnosis sketch: ≤k counter rows shuffle per task, never
    the #distinct-wide count aggregation). At oracle scale the data
    holds ≤ k distinct keys end-to-end, so the summary is in exact mode
    (no decrements, err_bound = 0) and est_count is the plain GROUP BY
    count the oracle states. See operators/heavyhitters.py."""
    from anomaly_detector_faironchain_spark.operators.heavyhitters import (
        heavy_hitters,
    )

    ev = _t(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", k=1024, top_n=15).select(
        "key",
        F.col("est_count").cast("long").alias("est_count"),
        F.col("err_bound").cast("long").alias("err_bound"),
    )


ORACLE_HEAVY_HITTERS = """
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(COUNT(*) AS BIGINT) AS est_count,
       CAST(0 AS BIGINT) AS err_bound
FROM events WHERE user_id IS NOT NULL
GROUP BY 1
ORDER BY est_count DESC, key ASC
LIMIT 15
"""


QUERIES = {
    "asof_attribution": q_asof_attribution,
    "interval_follow": q_interval_follow,
    "hll_uniqueness_screen": q_hll_uniqueness_screen,
    "kll_length_quantiles": q_kll_length_quantiles,
    "tdigest_length_profile": q_tdigest_length_profile,
    "heavy_hitters": q_heavy_hitters,
    "snapshot_incremental": q_snapshot_incremental,
}
ORACLES = {
    "asof_attribution": ORACLE_ASOF_ATTRIBUTION,
    "interval_follow": ORACLE_INTERVAL_FOLLOW,
    "hll_uniqueness_screen": ORACLE_HLL_UNIQUENESS_SCREEN,
    "kll_length_quantiles": ORACLE_KLL_LENGTH_QUANTILES,
    "tdigest_length_profile": ORACLE_TDIGEST_LENGTH_PROFILE,
    "heavy_hitters": ORACLE_HEAVY_HITTERS,
    "snapshot_incremental": ORACLE_SNAPSHOT_INCREMENTAL,
}
