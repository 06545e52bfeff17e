"""The reference's EP2 anomaly-analysis pipeline end-to-end, Spark-first:
abstract token transfers → graph features → H1-H6 heuristics → z-features
→ Mahalanobis → 0-100 scores → analysis_result-shaped output.

Parity map (reference file → here):
  graph/construction + graph/feature/*        → operators/graph.py joins
  analysis/detectors/rule_based_*.py:30-259   → heuristic_rules()
  analysis/detectors/statistical_*.py:18-57   → preprocess_features()
  analysis/detectors/statistical_*.py:60-103  → operators/mahalanobis.py
  analysis/detectors/unsupervised_*.py        → optional iforest slot
                                                (sklearn absent here →
                                                import-gated; drift scoring
                                                is the engine's default
                                                replacement, SURVEY §2 K4)
  analysis/scoring/scoring.py                 → score() (Hazen percentiles,
                                                rule score, final mean,
                                                top-percent display)
  run_anomaly_analysis_pipeline.py:22-104     → run_anomaly_analysis()

Infra handling mirrors the reference's split/re-merge (:32-36, :88-89):
whitelisted accounts are excluded from every statistic and re-attached
with null scores and is_infra=1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import graph, mahalanobis, scoring

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


def extract_account_features(tt: DataFrame) -> DataFrame:
    """Per-account graph features from AbstractTokenTransfer — the whole
    of the reference's graph stage (EP2 steps 1-2) as joins/aggregations.

    Amounts go through double (the reference's features CSV does the same
    — SURVEY §1.2 notes the accepted precision loss downstream).
    """
    edges = graph.aggregate_edges(
        tt.select(
            F.col("spender_address_sid").alias("src"),
            F.col("receiver_address_sid").alias("dst"),
            F.col("amount_dec38").cast("double").alias("amount"),
            F.lit(0).alias("ts"),
        ),
        "src", "dst", "amount", "ts",
    ).cache()  # reused by 4 feature extractors, like the reference's
    #            precomputed adjacency (extract_egonet_features.py:37-42)

    nf = graph.node_features(edges)
    mutual = graph.mutual_pair_features(edges).withColumnRenamed(
        "two_node_loop_tx", "two_node_loop_tx_count"
    )
    tri = (
        graph.triangle_features(edges)
        .withColumnRenamed("triangle_count", "triangle_loop_count")
        .withColumnRenamed("triangle_amount", "triangle_loop_amount")
        .withColumnRenamed("triangle_tx", "triangle_loop_tx_count")
    )
    ego = graph.egonet_features(edges).select(
        "node", F.col("ego_density").alias("egonet_density")
    )
    loops = graph.self_loop_flag(edges)

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


def preprocess_features(df: DataFrame) -> DataFrame:
    """K1: log1p on 6 skewed columns, two log-ratios, z-score all 9
    (statistical_anomaly_detection.py:18-57)."""
    for c in LOG_FEATURES:
        df = df.withColumn(f"{c}_log", F.log1p(F.col(c)))
    df = df.withColumn(
        "log_degree_ratio",
        F.log((F.col("in_degree") + 1) / (F.col("out_degree") + 1)),
    ).withColumn(
        "log_amount_ratio",
        F.log((F.col("total_input_amount") + 1) / (F.col("total_output_amount") + 1)),
    )
    stats = scoring.zscore_stats(df, Z_FEATURES)
    for c in Z_FEATURES:
        m, s = stats[c]
        df = df.withColumn(f"{c}_z", (F.col(c) - F.lit(m)) / F.lit(s))
    return df


def score(df: DataFrame, score_cols: list[str]) -> DataFrame:
    """K5: rule score (0-3 → 0-100), Hazen percentiles, final mean,
    top-percent display (scoring.py:24-105)."""
    df = df.withColumn(
        "rule_score_raw",
        (F.greatest(*[F.col(f"H{i}_flag") for i in range(1, 5)])
         + F.col("H5_flag") + F.col("H6_flag")).cast("float"),
    ).withColumn(
        "rule_score_100",
        F.round(F.col("rule_score_raw") * (100.0 / 3.0), 2).cast("float"),
    )
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


def run_anomaly_analysis(
    tt: DataFrame,
    infra_addresses: list[str] | None = None,
    include_iforest: bool = False,
) -> DataFrame:
    """Full EP2: features → split infra → thresholds → rules → z →
    Mahalanobis → (optional iforest) → scores → re-merged result."""
    feats = extract_account_features(tt)
    infra = [a.strip().lower() for a in (infra_addresses or [])]
    feats = feats.withColumn(
        "is_infra", F.col("address").isin(infra).cast("int")
    )
    work = feats.filter(F.col("is_infra") == 0)

    t = compute_thresholds(work)
    work = heuristic_rules(work, t)
    work = preprocess_features(work)
    work = mahalanobis.mahalanobis(
        work, [f"{c}_z" for c in Z_FEATURES], "mahalanobis_distance"
    )
    extra_scores: list[str] = []
    if include_iforest:
        try:  # sklearn is optional and absent in this environment
            from sklearn.ensemble import IsolationForest  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "IsolationForest scoring needs scikit-learn; the engine's "
                "built-in replacement is drift scoring (operators/drift.py)"
            ) from e
    work = score(work, extra_scores)

    drop = [c for c in work.columns
            if c.endswith("_log") or c.endswith("_z") or c.endswith("_ratio")]
    work = work.drop(*drop)
    infra_rows = feats.filter(F.col("is_infra") == 1)
    return work.unionByName(infra_rows, allowMissingColumns=True)
