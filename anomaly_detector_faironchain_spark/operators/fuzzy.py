"""Exact fuzzy key matching (entity resolution) via FastSS deletion
neighborhoods: two strings within Levenshtein distance d always share at
least one variant obtainable by deleting ≤ d characters from each — so
candidate pairs come from an EQUI-JOIN on deletion variants, never a
cartesian product or a cross-compare, and a final levenshtein() check
makes the result exact (no recall loss, unlike LSH).

Scale design:
  * variant generation is a map-only explode: ≤ (L+1)^d variants per key
    for keys of length L — linear blowup at d=1, quadratic at d=2; keys
    longer than max_key_len are filtered from both sides up front (a
    64-char key's neighborhood stops being selective and its variants
    dominate the shuffle);
  * the candidate join shuffles (id, variant) pairs; a degenerate hot
    variant (e.g. the 1-deletion neighborhood of ubiquitous short codes)
    is bounded by max_bucket, the same guard as LSH banding;
  * verification cost is |candidates| levenshtein calls — JVM built-in,
    no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEL = (
    "IF(length({k}) >= 1, "
    "transform(sequence(1, length({k})), "
    "i -> concat(substring({k}, 1, i - 1), substring({k}, i + 1, length({k})))), "
    "array())"
)


def deletion_variants(
    df: DataFrame, id_col: str, key_col: str, d: int = 1
) -> DataFrame:
    """(id, key, var): every string reachable from key by ≤ d deletions,
    distinct per key. d=0 is the key itself."""
    base = df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
    out = base.select("id", "key", F.col("key").alias("var"))
    cur = out
    for _ in range(d):
        cur = cur.select(
            "id", "key",
            F.explode(F.expr(_DEL.format(k="var"))).alias("var"),
        ).distinct()
        out = out.union(cur)
    return out.distinct()


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    id_l: str,
    key_l: str,
    id_r: str,
    key_r: str,
    max_dist: int = 1,
    max_key_len: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """All cross-side pairs with levenshtein(key_l, key_r) <= max_dist:
    (id_l, id_r, key_l, key_r, dist). Exact — candidates from the
    deletion-variant equi-join (FastSS), verified with the built-in DP
    levenshtein. max_bucket (optional) drops variants shared by more
    than that many keys per side before the join — bounded recall loss
    for a hard O(bucket²) ceiling on degenerate neighborhoods.
    """
    lf = left.filter(F.length(F.col(key_l)) <= max_key_len)
    rf = right.filter(F.length(F.col(key_r)) <= max_key_len)
    va = deletion_variants(lf, id_l, key_l, max_dist).select(
        F.col("id").alias("id_l"), F.col("key").alias("key_l"), "var"
    )
    vb = deletion_variants(rf, id_r, key_r, max_dist).select(
        F.col("id").alias("id_r"), F.col("key").alias("key_r"), "var"
    )
    if max_bucket is not None:
        for name in ("a", "b"):
            v = va if name == "a" else vb
            sized = v.join(
                v.groupBy("var").agg(F.count(F.lit(1)).alias("__bn__")),
                "var",
            ).filter(F.col("__bn__") <= max_bucket).drop("__bn__")
            if name == "a":
                va = sized
            else:
                vb = sized
    cand = va.join(vb, "var").select(
        "id_l", "id_r", "key_l", "key_r"
    ).distinct()
    return (
        cand.withColumn("dist", F.levenshtein("key_l", "key_r"))
        .filter(F.col("dist") <= max_dist)
    )
