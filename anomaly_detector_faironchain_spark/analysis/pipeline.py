"""The reference's EP2 anomaly-analysis pipeline end-to-end, Spark-first:
abstract token transfers → graph features → H1-H6 heuristics → z-features
→ Mahalanobis → 0-100 scores → analysis_result-shaped output.

Parity map (reference file → here):
  graph/construction + graph/feature/*        → operators/graph.py joins
  analysis/detectors/rule_based_*.py:30-259   → heuristic_rules()
  analysis/detectors/statistical_*.py:18-57   → preprocess_features()
  analysis/detectors/statistical_*.py:60-103  → operators/mahalanobis.py
  analysis/detectors/unsupervised_*.py        → operators/iforest.py
                                                (numpy iTree ensemble fit
                                                on a bounded driver sample,
                                                broadcast, Arrow-batched
                                                UDF scoring; drift scoring
                                                remains the engine's
                                                streaming-friendly
                                                alternative, SURVEY §2 K4)
  analysis/scoring/scoring.py                 → score() (Hazen percentiles,
                                                rule score, final mean,
                                                top-percent display)
  run_anomaly_analysis_pipeline.py:22-104     → run_anomaly_analysis()

Infra handling mirrors the reference's split/re-merge (:32-36, :88-89):
whitelisted accounts are excluded from every statistic and re-attached
with null scores and is_infra=1.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import (
    graph,
    iforest,
    mahalanobis,
    scoring,
)

log = logging.getLogger(__name__)

# the reference's burn-address blacklist, applied before graph build
# (graph/construction/filter_edgelist.py:4-8)
ADDRESS_BLACKLIST = (
    "1_0x0000000000000000000000000000000000000000",
    "1_0x000000000000000000000000000000000000dead",
    "1_0xeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee",
)

RULE_DESCRIPTIONS = {
    "H1": "H1: Aggregates from many sources and forwards almost unchanged to few addresses. May indicate ransomware or scam fund routing.",
    "H2": "H2: Aggregates from many sources but shows no outgoing transfers. May indicate scam fund storage or ransomware holding address.",
    "H3": "H3: Receives funds from a single source and distributes to many addresses. May indicate laundering or scam profit distribution.",
    "H4": "H4: Receives from many sources and distributes to many others with minimal balance retained. Possible mixer or laundering relay.",
    "H5": "H5: Participates in closed two-node loops with high value or frequent transfers. May indicate wash trading or self-laundering.",
    "H6": "H6: Participates in closed triangle-shaped loops with high value or frequent transfers. May indicate self-laundering or obfuscation.",
}

THRESHOLD_COLS = [
    "in_degree", "out_degree",
    "two_node_loop_amount", "two_node_loop_tx_count",
    "triangle_loop_amount", "triangle_loop_tx_count",
]
ZERO_EXCLUDED = [
    "two_node_loop_amount", "two_node_loop_tx_count",
    "triangle_loop_amount", "triangle_loop_tx_count",
]

LOG_FEATURES = [
    "in_degree", "out_degree",
    "total_input_amount", "total_output_amount",
    "two_node_loop_count", "triangle_loop_count",
]
Z_FEATURES = [f"{c}_log" for c in LOG_FEATURES] + [
    "log_degree_ratio", "log_amount_ratio", "egonet_density",
]


def attach_block_timestamps(
    tt: DataFrame, tx: DataFrame, blocks: DataFrame,
    count_orphans: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Edge timestamp lineage (reference load_clean_edgelist.py:41-54):
    transfer ⋈ tx → block_sid, ⋈ block → timestamp, both left joins, with
    the reference's orphan safety counts (transfers missing a tx, and
    transfers missing a block timestamp) computed in ONE aggregation pass
    and logged as warnings when non-zero."""
    joined = (
        tt.join(tx.select("tx_sid", "block_sid"), "tx_sid", "left")
        .join(blocks.select("block_sid", "timestamp"), "block_sid", "left")
    )
    orphans = {"missing_tx": 0, "missing_ts": 0}
    if count_orphans:
        row = joined.agg(
            F.sum(F.col("block_sid").isNull().cast("long")).alias("mt"),
            F.sum(F.col("timestamp").isNull().cast("long")).alias("ms"),
        ).collect()[0]
        orphans = {
            "missing_tx": int(row.mt or 0),
            "missing_ts": int(row.ms or 0),
        }
        if orphans["missing_tx"]:
            log.warning("%d transfers have no matching tx_sid",
                        orphans["missing_tx"])
        if orphans["missing_ts"]:
            log.warning("%d transfers have no block timestamp",
                        orphans["missing_ts"])
    return joined, orphans


def build_edges(
    tt: DataFrame,
    ts_col: str | None = None,
    min_amount: float = 0.0,
    blacklist: list[str] | None = None,
) -> DataFrame:
    """Filtered, aggregated edgelist. Mirrors the reference's pre-graph
    pruning — `amount >= min_amount` (run_graph_builder.py:23 passes
    1e12 Wei) and the burn-address blacklist on BOTH endpoints
    (filter_edgelist.py:26-35; pass blacklist=[] to disable) — then
    collapses parallel transfers (build_token_transfer_graph.py:26-31).

    Amounts go through double (the reference's features CSV does the same
    — SURVEY §1.2 notes the accepted precision loss downstream)."""
    bl = list(ADDRESS_BLACKLIST if blacklist is None else blacklist)
    t = tt.select(
        F.col("spender_address_sid").alias("src"),
        F.col("receiver_address_sid").alias("dst"),
        F.col("amount_dec38").cast("double").alias("amount"),
        (F.col(ts_col) if ts_col else F.lit(0)).alias("ts"),
    )
    if min_amount:
        t = t.filter(F.col("amount") >= min_amount)
    if bl:
        t = t.filter(~F.col("src").isin(bl) & ~F.col("dst").isin(bl))
    return graph.aggregate_edges(t, "src", "dst", "amount", "ts")


def extract_account_features(
    tt: DataFrame,
    ts_col: str | None = None,
    min_amount: float = 0.0,
    blacklist: list[str] | None = None,
) -> DataFrame:
    """Per-account graph features from AbstractTokenTransfer — the whole
    of the reference's graph stage (EP2 steps 1-2) as joins/aggregations.
    Caches the edgelist (reused by 4 feature extractors, like the
    reference's precomputed adjacency, extract_egonet_features.py:37-42);
    run_anomaly_analysis manages the cache lifecycle itself via
    build_edges/features_from_edges."""
    edges = build_edges(tt, ts_col, min_amount, blacklist).cache()
    edges.count()  # warm before the multi-branch join (see run_anomaly_analysis)
    return features_from_edges(edges)


def features_from_edges(
    edges: DataFrame,
    materialize_parts: bool = False,
    fused: bool = True,
    vertex_dict: bool = True,
    broadcast_dict_max: int = 5_000_000,
    wedge_budget: int | None = None,
    on_guard=None,
) -> DataFrame:
    """Feature join over a (cached) aggregated edgelist.

    vertex_dict=True (default, fused path only): account_sid strings are
    dictionary-encoded to int64 ids before the motif enumeration and
    decoded on the final per-node frame. The wedge intermediate — the
    largest frame EP2 ever shuffles — carries 3 node keys per row;
    ~30-byte sids → 8-byte longs cuts its shuffle bytes ~3x and the
    hash-join probes compare longs instead of strings (measured 1.39x on
    the 2M-edge bench corpus, BENCH/fused_shj_ab_round3.json intids arm;
    per-node outputs checksum-identical). Cost: one distinct over the
    edge endpoints + two encode joins (broadcast while the dict is under
    `broadcast_dict_max` rows; shuffle joins above — still a win at scale
    because wedges strictly outnumber edges). The dict is pinned with
    localCheckpoint BEFORE reuse: monotonically_increasing_id is
    plan-layout-dependent, so a recomputed dict could mint different ids
    per consumer branch — eviction must fail the job, not recompute.

    fused=True (default): mutual-pair, triangle and egonet features come
    from graph.fused_motif_features — ONE pair aggregation + ONE wedge
    self-join serve all three (the standalone kernels pay a reversed-key
    self-join plus TWO wedge enumerations of the same triangles);
    per-node outputs are pytest-identical. The dominant motif stage is
    halved; interleaved A/B in tools/fused_ab.py.

    wedge_budget (fused path only): the dense-graph guard — see
    graph.fused_motif_features. When set, the output carries a
    motif_excluded int column and excluded hubs get null motif features;
    the standalone-extractor path (fused=False) ignores it — apply the
    reference's manual whitelist there instead.

    fused=False keeps the 4 standalone extractors (the A/B control and
    the step-debugging form). materialize_parts=True additionally
    localCheckpoints each extractor output (a tiny per-node table) as its
    own sequential job before joining — useful for step-level debugging /
    retry granularity on flaky clusters; A/B-measured equal to the fused
    plan on the 2M-edge bench corpus (within host variance)."""
    dic = None
    if fused and not materialize_parts and vertex_dict:
        nodes = edges.select(F.col("src").alias("node")).union(
            edges.select(F.col("dst"))).distinct()
        dic = nodes.withColumn(
            "__nid__", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        n_nodes = dic.count()  # fetch over checkpointed blocks
        side = (F.broadcast(dic) if n_nodes <= broadcast_dict_max else dic)
        passthrough = [c for c in edges.columns if c not in ("src", "dst")]
        edges = (
            edges
            .join(side.select(F.col("node").alias("src"),
                              F.col("__nid__").alias("__s__")), "src")
            .join(side.select(F.col("node").alias("dst"),
                              F.col("__nid__").alias("__d__")), "dst")
            .select(F.col("__s__").alias("src"),
                    F.col("__d__").alias("dst"), *passthrough)
        )
    nf = graph.node_features(edges)
    loops = graph.self_loop_flag(edges)
    if fused and not materialize_parts:
        motif_cols = [
            "two_node_loop_count", "two_node_loop_amount",
            "two_node_loop_tx_count", "triangle_loop_count",
            "triangle_loop_amount", "triangle_loop_tx_count",
            "egonet_density",
        ]
        sel = [
            "node",
            F.col("two_node_loop_count"), F.col("two_node_loop_amount"),
            F.col("two_node_loop_tx").alias("two_node_loop_tx_count"),
            F.col("triangle_count").alias("triangle_loop_count"),
            F.col("triangle_amount").alias("triangle_loop_amount"),
            F.col("triangle_tx").alias("triangle_loop_tx_count"),
            F.col("ego_density").alias("egonet_density"),
        ]
        if wedge_budget is not None:
            sel.append(F.col("motif_excluded"))
        motifs = graph.fused_motif_features(
            edges, wedge_budget=wedge_budget, on_guard=on_guard,
        ).select(*sel)
        out = (
            nf.join(motifs, "node", "left")
            .join(loops, "node", "left")
            .na.fill(0)
        )
        if wedge_budget is not None:
            # na.fill(0) above zero-filled the guard's null rows; restore
            # the reference's NA semantics for excluded hubs
            # (extract_motif_features.py:83-94) — their motif features
            # were NOT computed, and 0 would be a lie
            for c in motif_cols + ["self_loop_count"]:
                if c in out.columns:
                    out = out.withColumn(
                        c, F.when(F.col("motif_excluded") == 1,
                                  F.lit(None)).otherwise(F.col(c)))
        if dic is not None:
            out = (
                out.withColumnRenamed("node", "__nid__")
                .join(side, "__nid__")
                .drop("__nid__")
            )
        return (
            out.withColumnRenamed("node", "account_sid")
            .withColumn(
                "address", F.substring_index(F.col("account_sid"), "_", -1))
        )
    mutual = graph.mutual_pair_features(edges).withColumnRenamed(
        "two_node_loop_tx", "two_node_loop_tx_count"
    )
    tri = (
        graph.triangle_features(edges)
        .withColumnRenamed("triangle_count", "triangle_loop_count")
        .withColumnRenamed("triangle_amount", "triangle_loop_amount")
        .withColumnRenamed("triangle_tx", "triangle_loop_tx_count")
    )
    # wedge m-count: 2.3-2.7x faster than the routed expansion on the
    # bench corpora (tools/ego_ab.py, identical outputs) and needs no
    # routing-decision job; the infra whitelist already removes the
    # mega-hubs that would stress the id-order wedge pivot
    ego = graph.egonet_features(edges, method="wedge").select(
        "node", F.col("ego_density").alias("egonet_density")
    )

    if materialize_parts:
        nf = nf.localCheckpoint(eager=True)
        mutual = mutual.localCheckpoint(eager=True)
        tri = tri.localCheckpoint(eager=True)
        ego = ego.localCheckpoint(eager=True)
        loops = loops.localCheckpoint(eager=True)

    out = (
        nf.join(mutual, "node", "left")
        .join(tri, "node", "left")
        .join(ego, "node", "left")
        .join(loops, "node", "left")
        .na.fill(0)
        .withColumnRenamed("node", "account_sid")
        .withColumn("address", F.substring_index(F.col("account_sid"), "_", -1))
    )
    return out


def compute_thresholds(df: DataFrame, q: float = 0.99) -> dict[str, float]:
    """reference compute_thresholds (rule_based_anomaly_detection.py:4-27):
    exact q-quantile per column, zeros excluded for heavy-tailed ones."""
    t = {}
    t.update(scoring.quantile_thresholds(
        df, [c for c in THRESHOLD_COLS if c not in ZERO_EXCLUDED],
        q=q, exclude_zeros=False,
    ))
    t.update(scoring.quantile_thresholds(df, ZERO_EXCLUDED, q=q,
                                         exclude_zeros=True))
    return t


def heuristic_rules(df: DataFrame, t: dict[str, float]) -> DataFrame:
    """H1-H6 with the reference's exact conditions and description text."""
    retention = F.when(
        F.col("total_input_amount") > 0,
        F.abs(F.col("total_input_amount") - F.col("total_output_amount"))
        / F.col("total_input_amount"),
    )  # NaN→null when input == 0 yields no flag, like np.where+NaN
    rules = [
        scoring.Rule("H1",
                     (F.col("in_degree") >= t["in_degree"])
                     & (F.col("out_degree") <= 3)
                     & (retention <= 0.05),
                     RULE_DESCRIPTIONS["H1"]),
        scoring.Rule("H2",
                     (F.col("in_degree") >= t["in_degree"])
                     & (F.col("out_degree") == 0),
                     RULE_DESCRIPTIONS["H2"]),
        scoring.Rule("H3",
                     (F.col("in_degree") == 1)
                     & (F.col("out_degree") >= t["out_degree"]),
                     RULE_DESCRIPTIONS["H3"]),
        scoring.Rule("H4",
                     (F.col("in_degree") >= t["in_degree"])
                     & (F.col("out_degree") >= t["out_degree"])
                     & (retention <= 0.05),
                     RULE_DESCRIPTIONS["H4"]),
        scoring.Rule("H5",
                     (F.col("two_node_loop_count") >= 1)
                     & ((F.col("two_node_loop_amount") >= t["two_node_loop_amount"])
                        | (F.col("two_node_loop_tx_count") >= t["two_node_loop_tx_count"])),
                     RULE_DESCRIPTIONS["H5"]),
        scoring.Rule("H6",
                     (F.col("triangle_loop_count") >= 1)
                     & ((F.col("triangle_loop_amount") >= t["triangle_loop_amount"])
                        | (F.col("triangle_loop_tx_count") >= t["triangle_loop_tx_count"])),
                     RULE_DESCRIPTIONS["H6"]),
    ]
    return scoring.apply_rules(df, rules)


def add_log_features(df: DataFrame) -> DataFrame:
    """K1 first half: log1p on 6 skewed columns + two log-ratios — pure
    column expressions, no action (statistical_anomaly_detection.py:18-40)."""
    for c in LOG_FEATURES:
        df = df.withColumn(f"{c}_log", F.log1p(F.col(c)))
    return df.withColumn(
        "log_degree_ratio",
        F.log((F.col("in_degree") + 1) / (F.col("out_degree") + 1)),
    ).withColumn(
        "log_amount_ratio",
        F.log((F.col("total_input_amount") + 1) / (F.col("total_output_amount") + 1)),
    )


def apply_z(df: DataFrame, stats: dict[str, tuple[float, float]]) -> DataFrame:
    """K1 second half: z-score the 9 features with precomputed ddof=1
    moments (statistical_anomaly_detection.py:43-57)."""
    for c in Z_FEATURES:
        m, s = stats[c]
        df = df.withColumn(f"{c}_z", (F.col(c) - F.lit(m)) / F.lit(s))
    return df


def preprocess_features(df: DataFrame) -> DataFrame:
    """K1: log1p on 6 skewed columns, two log-ratios, z-score all 9
    (statistical_anomaly_detection.py:18-57)."""
    df = add_log_features(df)
    return apply_z(df, scoring.zscore_stats(df, Z_FEATURES))


def fused_threshold_and_z_stats(
    df: DataFrame, q: float = 0.99
) -> tuple[dict[str, float], dict[str, tuple[float, float]]]:
    """Rule thresholds (A4) AND z-score moments (K1) in ONE aggregation
    action over a frame that already has the log/ratio columns.

    Trade-off, measured in round 1 (BENCH/BASELINE.md): exact percentile
    forces ObjectHashAggregate, so the avg/stddev expressions in the same
    aggregate run interpreted. Here the input is the CACHED per-account
    feature frame (orders of magnitude smaller than the transfer table),
    where one interpreted pass beats two codegen'd passes + an extra
    driver sync — the suite's per-row hot path keeps the codegen split."""
    aggs = []
    for c in THRESHOLD_COLS:
        flt = f" FILTER (WHERE `{c}` > 0)" if c in ZERO_EXCLUDED else ""
        aggs.append(F.expr(f"percentile(`{c}`, {q}){flt}").alias(f"t__{c}"))
    for c in Z_FEATURES:
        aggs.append(F.avg(c).alias(f"m__{c}"))
        aggs.append(F.stddev_samp(c).alias(f"s__{c}"))
    row = df.agg(*aggs).collect()[0]
    thresholds = {
        c: (row[f"t__{c}"] if row[f"t__{c}"] is not None else 0.0)
        for c in THRESHOLD_COLS
    }
    zstats = {}
    for c in Z_FEATURES:
        m = row[f"m__{c}"] or 0.0
        s = row[f"s__{c}"]
        zstats[c] = (float(m), float(s) if s not in (None, 0.0) else 1.0)
    return thresholds, zstats


def score(
    df: DataFrame, score_cols: list[str], ranks_precomputed: bool = False
) -> DataFrame:
    """K5: rule score (0-3 → 0-100), Hazen percentiles, final mean,
    top-percent display (scoring.py:24-105).

    ranks_precomputed=True skips the internal Mahalanobis Hazen pass —
    the caller already produced mahalanobis_distance_stats_score_100
    (run_anomaly_analysis fuses it with the iforest rank into one
    boundary scan via hazen_percentile_agg_multi)."""
    df = df.withColumn(
        "rule_score_raw",
        (F.greatest(*[F.col(f"H{i}_flag") for i in range(1, 5)])
         + F.col("H5_flag") + F.col("H6_flag")).cast("float"),
    ).withColumn(
        "rule_score_100",
        F.round(F.col("rule_score_raw") * (100.0 / 3.0), 2).cast("float"),
    )
    if not ranks_precomputed:
        df = scoring.hazen_percentile_agg(
            df, "mahalanobis_distance", "mahalanobis_distance_stats_score_100"
        )
    components = ["rule_score_100", "mahalanobis_distance_stats_score_100"] + score_cols
    mean_expr = sum((F.col(c) for c in components[1:]), F.col(components[0]))
    df = df.withColumn(
        "final_score_0_100", (mean_expr / len(components)).cast("float")
    )
    df = scoring.top_percent_rank(df, "final_score_0_100", "__tp__")
    df = (
        df.withColumn("final_score_top_percent", F.col("__tp__").cast("float"))
        .withColumn(
            "final_score_top_percent_display",
            F.format_string("%.2f%%", F.col("final_score_top_percent")),
        )
        .drop("__tp__")
    )
    return df


# test/debug handles from the most recent run_anomaly_analysis call —
# lets tests assert cache state without widening the return type
_last_run_handles: dict = {}


DEFAULT_WEDGE_BUDGET = 500_000_000  # ≈25-50 GB wedge shuffle at 50-100 B/row


def run_anomaly_analysis(
    tt: DataFrame,
    infra_addresses: list[str] | None = None,
    include_iforest: bool = True,
    min_amount: float = 0.0,
    blacklist: list[str] | None = None,
    tx: DataFrame | None = None,
    blocks: DataFrame | None = None,
    iforest_params: dict | None = None,
    materialize: bool = True,
    wedge_budget: int | None = DEFAULT_WEDGE_BUDGET,
    on_guard=None,
) -> DataFrame:
    """Full EP2 (reference run_anomaly_analysis_pipeline.py:22-104):
    [timestamp lineage] → edge filter → features → split infra →
    thresholds → rules → z → Mahalanobis → IsolationForest → scores →
    re-merged result.

    * `min_amount`/`blacklist` mirror the reference's pre-graph pruning
      (run_graph_builder.py:23 uses 1e12 Wei; blacklist defaults to the
      reference's 3 burn addresses — pass [] to disable).
    * `tx`/`blocks` enable the transfer⋈tx⋈block timestamp join with
      orphan counting (load_clean_edgelist.py:41-54); the edgelist then
      carries real `first_ts`.
    * iforest: numpy iTree ensemble with the reference's parameters
      (n_estimators=300, max_samples=100k, seed=42); final score is the
      mean of 3 detectors (scoring.py:96-98).
    * `wedge_budget` (default 5e8 rows): the dense-graph guard. Before
      the motif stage, the wedge-shuffle volume is estimated exactly
      from the degree distribution (graph.motif_wedge_guard); a graph
      that would blow past the budget gets degree-orientation routing
      and, if still over, automatic hub exclusion — the excluded hubs
      are REPORTED (on_guard callback + WARNING log), carry null motif
      features and a `motif_excluded=1` flag in the result, and are
      routed around the scoring stats exactly like infra whitelist rows
      (null scores, re-attached at the end) — the reference's manual
      whitelist (extract_motif_features.py:32-44,83-94), automated.
      Pass None to disable (pre-round-5 behavior, no motif_excluded
      column, wedge shuffle unbounded).
    * Cache discipline: the edgelist and the per-account feature frame
      are cached (the feature frame feeds 3-4 separate driver actions —
      without the cache every action re-runs the triangle/egonet joins);
      with materialize=True the result is localCheckpoint'ed (cuts
      lineage, one extra job over the small per-account table) and both
      caches are released before returning. With materialize=False they
      stay pinned for inspection (handles in _last_run_handles) and are
      released by the NEXT run. On a multi-tenant cluster, swap
      localCheckpoint for a reliable checkpoint dir.

    Driver actions per run: 1 edges warm-up + 1 egonet routing decision
    (reads the warmed cache) + 1 fused stats pass + 1 covariance pass +
    1 iforest fit sample + 1 materialization (+1 orphan count when
    tx/blocks are given).
    """
    # release caches a previous materialize=False run left pinned (its
    # handles are clobbered below; unpersist is safe — consumers recompute)
    for h in ("edges", "work"):
        prev = _last_run_handles.get(h)
        if prev is not None:
            prev.unpersist()

    ts_col = None
    orphans = None
    if tx is not None and blocks is not None:
        tt, orphans = attach_block_timestamps(tt, tx, blocks)
        ts_col = "timestamp"
    edges = build_edges(tt, ts_col, min_amount, blacklist).cache()
    # warm the edges cache with one cheap action BEFORE the fused stats
    # job: the feature join references the edgelist from ~10 plan branches
    # (triangles 3×, egonet 2×, mutual pairs 2×, …) and Spark's cache
    # population is best-effort under concurrent computation — warming
    # guarantees every branch reads memory instead of racing to populate
    # (one extra job at the cost of the edge aggregation alone)
    edges.count()
    feats = features_from_edges(edges, wedge_budget=wedge_budget,
                                on_guard=on_guard)
    infra = [a.strip().lower() for a in (infra_addresses or [])]
    feats = feats.withColumn(
        "is_infra", F.col("address").isin(infra).cast("int")
    )
    # guard-excluded hubs leave the scoring population with the infra
    # rows: their motif features are null by construction, so letting
    # them into the threshold/z/Mahalanobis stats would poison every
    # aggregate; they re-attach below with null scores, as the
    # reference's whitelist rows do
    scored_pred = F.col("is_infra") == 0
    if wedge_budget is not None:
        scored_pred = scored_pred & (F.col("motif_excluded") == 0)
    base = add_log_features(feats.filter(scored_pred)).cache()

    t, zstats = fused_threshold_and_z_stats(base)  # action 1 (fills cache)
    work = heuristic_rules(base, t)
    work = apply_z(work, zstats)
    zcols = [f"{c}_z" for c in Z_FEATURES]
    work = mahalanobis.mahalanobis(work, zcols, "mahalanobis_distance")
    extra_scores: list[str] = []
    if include_iforest:
        params = {"n_estimators": 300, "max_samples": 100_000, "seed": 42}
        params.update(iforest_params or {})
        try:
            model = iforest.fit_iforest(work, zcols, **params)  # action 3
        except ValueError:
            # empty non-infra frame (everything pruned/whitelisted):
            # degrade to the 2-detector mean instead of crashing a
            # scheduled run over a quiet slice
            log.warning("isolation forest skipped: no rows to fit on")
            model = None
        if model is not None:
            work = iforest.score_iforest(work, zcols, model)
            extra_scores = ["iforest_stats_score_100"]
    if materialize:
        # pin the detector-score frame (per-account, small) before the
        # rank layers: each distributed rank fans into 3 plan branches
        # (boundaries, bucket counts, main), and 3 chained ranks would
        # otherwise re-execute the Mahalanobis/iforest Arrow UDF scans
        # ~3^3 times; after this checkpoint every branch reads the
        # materialized rows
        work = work.localCheckpoint(eager=True)
    rank_specs = [("mahalanobis_distance",
                   "mahalanobis_distance_stats_score_100")]
    if extra_scores:
        rank_specs.append(("iforest_score", "iforest_stats_score_100"))
    work = scoring.hazen_percentile_agg_multi(work, rank_specs)
    work = score(work, extra_scores, ranks_precomputed=True)

    drop = [c for c in work.columns
            if c.endswith("_log") or c.endswith("_z") or c.endswith("_ratio")]
    work = work.drop(*drop)
    infra_rows = feats.filter(~scored_pred)
    out = work.unionByName(infra_rows, allowMissingColumns=True)
    _last_run_handles.clear()
    _last_run_handles.update(edges=edges, work=base, orphans=orphans)
    if materialize:
        out = out.localCheckpoint(eager=True)  # final action
        base.unpersist()
        edges.unpersist()
    return out
