"""Deterministic generator for the north-rule input table
``source_files(repo, path, commit, lang, content)`` + companion dims +
sha256 manifest (FIXTURES.md §A).

Fully distributed and seed-stable: every column is a pure function of
``spark.range`` ids and the seed (xxhash64 / sha2 / md5 literals), so the
same (n, seed) produces byte-identical tables at any parallelism — the
property the two-parallelism scaling benchmark depends on. No driver-side
loops, no Python RNG: generation itself scales to 10^12 rows.

Skew is built in on purpose: repo ids are drawn quadratically so a few
mega-repos own a large share of files — exercising the salting path the
north rule requires (BASELINE.json: "repo-hash partitioning with salting
for skewed mega-repos").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("python", "java", "go", "js", "rust", "md", "yaml", "other")
# cumulative weights out of 100 for the base lang mixture
_LANG_CUM = (30, 48, 60, 75, 85, 92, 97, 100)
_EXT = {
    "python": "py", "java": "java", "go": "go", "js": "js",
    "rust": "rs", "md": "md", "yaml": "yaml", "other": "txt",
}

N_REPOS = 211
N_BUCKETS = 32  # repo-hash partition buckets


def _u(col, seed: int, lo: int = 0, hi: int = 1_000_000) -> F.Column:
    """Deterministic uniform integer in [lo, hi) from a column + seed."""
    return (
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(hi - lo)) + F.lit(lo)
    ).cast("long")


def generate_source_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int = N_REPOS,
    n_buckets: int = N_BUCKETS,
    partitions: int | None = None,
    len_exp_lo: int = 6,
    len_exp_hi: int = 15,
) -> DataFrame:
    """Clean source_files table, one row per file-at-commit.

    Columns: repo, path, commit, lang, content, file_sid, bucket.
    bucket = pmod(hash(repo), n_buckets) — the validation partition key.
    """
    df = spark.range(0, n_rows, 1, partitions or max(8, n_rows // 250_000))

    # quadratic skew: u² concentrates mass at low repo ids → mega-repos
    u = _u(F.col("id"), seed + 1, 0, 1000)
    repo_idx = F.floor((u * u) / F.lit(1_000_000 / n_repos)).cast("long")
    repo_idx = F.least(repo_idx, F.lit(n_repos - 1))
    repo = F.concat_ws(
        "/",
        F.concat(F.lit("org"), F.pmod(repo_idx, F.lit(37)).cast("string")),
        F.concat(F.lit("repo"), repo_idx.cast("string")),
    )

    lang_u = _u(F.col("id"), seed + 2, 0, 100)
    lang = F.lit(LANGS[-1])
    expr = None
    for name, cum in zip(LANGS, _LANG_CUM):
        cond = lang_u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    lang = expr

    depth = (_u(F.col("id"), seed + 3, 1, 6)).cast("int")
    seg = lambda i: F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_p{i}_{seed}"))), 1, 6)  # noqa: E731
    path = F.concat(
        F.lit("src/"),
        F.when(depth >= 2, F.concat(seg(1), F.lit("/"))).otherwise(F.lit("")),
        F.when(depth >= 4, F.concat(seg(2), F.lit("/"))).otherwise(F.lit("")),
        F.lit("f_"),
        F.col("id").cast("string"),
        F.lit("."),
    )

    # ~20 files per commit within a repo; commit = 40-hex of (repo, group)
    commit_group = F.floor(F.col("id") / 20)
    commit = F.lower(
        F.substring(
            F.sha2(F.concat_ws("_", repo, commit_group.cast("string"), F.lit(str(seed))), 256),
            1,
            40,
        )
    )

    # content: pseudo-source text, length log-uniform 2^lo..2^(hi-1) chars
    len_exp = _u(F.col("id"), seed + 4, len_exp_lo, len_exp_hi)
    content_len = F.pow(F.lit(2.0), len_exp.cast("double")).cast("long")
    chunk = F.concat(
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_c_{seed}"))),
        F.lit(" "),
    )
    content = F.substring(F.repeat(chunk, 512), F.lit(1), content_len.cast("int"))

    out = df.select(
        repo.alias("repo"),
        F.concat(path, F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(l) for l in LANGS]),
                F.array(*[F.lit(_EXT[l]) for l in LANGS]),
            ),
            lang,
        )).alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        F.col("id").alias("_gen_id"),
    )
    return out.select(
        "*",
        F.concat_ws("_", "repo", "commit", "path").alias("file_sid"),
        F.pmod(F.xxhash64("repo"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )


def companion_dims(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """repos(repo, default_lang) and commits(commit, repo, ts) derived so
    referential integrity holds by construction on the clean table."""
    repos = (
        files.groupBy("repo")
        .agg(F.min("lang").alias("default_lang"))
    )
    commits = (
        files.groupBy("commit")
        .agg(
            F.min("repo").alias("repo"),
            # plausible epoch seconds in [1.5e9, 1.8e9)
            (F.lit(1_500_000_000) + F.pmod(F.xxhash64(F.col("commit")), F.lit(300_000_000))).alias("ts"),
        )
        .select("commit", "repo", "ts")
    )
    return repos, commits


def manifest(files: DataFrame) -> DataFrame:
    """Golden per-row invariant: (file_sid, content_sha256). Written by the
    generator, never by the engine (BASELINE.json input_hint)."""
    return files.select(
        "file_sid", F.sha2(F.col("content"), 256).alias("content_sha256")
    )


def inject_violations(
    files: DataFrame,
    null_lang_ids: list[int] = (),
    bad_lang_ids: list[int] = (),
    truncate_content_ids: list[int] = (),
    dangling_repo_ids: list[int] = (),
    duplicate_sid_ids: list[int] = (),
) -> DataFrame:
    """Corrupt exactly the given generator ids (deterministic — tests
    assert exactly these rows materialize as violations).
    """
    gid = F.col("_gen_id")
    out = files
    if null_lang_ids:
        out = out.withColumn(
            "lang", F.when(gid.isin(list(null_lang_ids)), F.lit(None)).otherwise(F.col("lang"))
        )
    if bad_lang_ids:
        out = out.withColumn(
            "lang",
            F.when(gid.isin(list(bad_lang_ids)), F.lit("klingon")).otherwise(F.col("lang")),
        )
    if truncate_content_ids:
        out = out.withColumn(
            "content",
            F.when(
                gid.isin(list(truncate_content_ids)),
                F.substring(F.col("content"), 1, 10),
            ).otherwise(F.col("content")),
        )
    if dangling_repo_ids:
        out = out.withColumn(
            "repo",
            F.when(
                gid.isin(list(dangling_repo_ids)), F.lit("ghost/xrepo")
            ).otherwise(F.col("repo")),
        )
    if duplicate_sid_ids:
        dups = files.filter(gid.isin(list(duplicate_sid_ids)))
        out = out.unionByName(dups)
    return out
