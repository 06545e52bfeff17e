"""Curation-operator query suite: deduplication, similarity search, text
analysis, multimodal plumbing — each with a DuckDB oracle that replicates
the full pipeline (shingling, MinHash, LSH banding, SimHash bits, cosine)
in ANSI SQL.

Near-duplicate tests need actual near-duplicates, so several queries
augment `documents` with deterministic perturbed copies (doc_id+100000,
first token dropped) inside the query itself — identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import (
    dedup,
    fuzzy,
    graph,
    multimodal,
    similarity,
    text as text_ops,
    training as training_ops,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _augmented(spark: SparkSession, sf_dir: str, perturb: bool) -> DataFrame:
    """documents ∪ copies at doc_id+100000; perturb drops the first token."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    if perturb:
        copy_text = F.expr("substring(text, instr(text, ' ') + 1)")
    else:
        copy_text = F.col("text")
    copies = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), copy_text.alias("text")
    )
    return docs.unionByName(copies)


_AUG_SQL = {
    True: ("SELECT doc_id, text FROM documents UNION ALL "
           "SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1) FROM documents"),
    False: ("SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 100000, text FROM documents"),
}

_SHINGLE_SQL = """
tok AS (SELECT id, string_split_regex(trim(text), '\\s+') AS toks FROM aug),
sh AS (
  SELECT DISTINCT id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM tok, UNNEST(generate_series(1, len(toks) - 2)) AS g(i)
)"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented(spark, sf_dir, perturb=False)
    return dedup.exact_dedup(aug, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "content_md5",
        F.col("keeper_id").cast("long").alias("keeper_id"),
        "is_dup",
    )


ORACLE_DEDUP_EXACT = f"""
WITH aug AS ({_AUG_SQL[False]}),
h AS (SELECT doc_id AS id, md5(text) AS content_md5 FROM aug),
k AS (SELECT content_md5, MIN(id) AS keeper_id FROM h GROUP BY 1)
SELECT CAST(id AS BIGINT) AS id, content_md5,
       CAST(keeper_id AS BIGINT) AS keeper_id, id <> keeper_id AS is_dup
FROM h JOIN k USING (content_md5)
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (k=12 hashes, 4 bands × 3 rows, verify ≥ 0.6)
# ---------------------------------------------------------------------------

def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented(spark, sf_dir, perturb=True)
    sh = dedup.shingles(aug, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, k=12)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=3, max_bucket=50)
    jac = dedup.jaccard_for_pairs(sh, cand)
    return jac.filter(F.col("jaccard") >= 0.6).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).cast("double").alias("jaccard"),
    )


def _minhash_ctes() -> str:
    """The MinHash→LSH→exact-Jaccard CTE chain ending at j(id_a,id_b,jac)
    — shared by the pairwise oracle and the cluster (closure) oracle."""
    sig_cols = ", ".join(
        f"MIN(md5('{i}#' || shingle)) AS s{i}" for i in range(12)
    )
    band_keys = " ".join(
        f"WHEN {b} THEN md5(s{3*b} || '|' || s{3*b+1} || '|' || s{3*b+2})"
        for b in range(4)
    )
    return f"""aug0 AS ({_AUG_SQL[True]}),
aug AS (SELECT doc_id AS id, text FROM aug0),
{_SHINGLE_SQL},
sig AS (SELECT id, {sig_cols} FROM sh GROUP BY 1),
band AS (
  SELECT id, b.band, CASE b.band {band_keys} END AS bkey
  FROM sig, (VALUES (0), (1), (2), (3)) b(band)
),
sized AS (SELECT band, bkey FROM band GROUP BY 1, 2 HAVING COUNT(*) <= 50),
bb AS (SELECT band.* FROM band JOIN sized USING (band, bkey)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bb a JOIN bb b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
sz AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT sa.id AS id_a, sb.id AS id_b, COUNT(*) AS inter
  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.id < sb.id
  JOIN cand c ON c.id_a = sa.id AND c.id_b = sb.id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b, inter * 1.0 / (sza.sz + szb.sz - inter) AS jac
  FROM inter
  JOIN sz sza ON sza.id = inter.id_a
  JOIN sz szb ON szb.id = inter.id_b
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_ctes()}
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(ROUND(jac, 4) AS DOUBLE) AS jaccard
FROM j WHERE jac >= 0.6
"""


# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: LSH pairs -> connected components (the step that turns
# pairwise similarity into per-document dedup decisions)
# ---------------------------------------------------------------------------

def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented(spark, sf_dir, perturb=True)
    sh = dedup.shingles(aug, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, k=12)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=3, max_bucket=50)
    pairs = dedup.jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= 0.6)
    comp = graph.connected_components(pairs, src="id_a", dst="id_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def _neardup_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (SELECT id_a AS u, id_b AS v FROM j WHERE jac >= 0.6),
bidir AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM bidir),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT b.v, w.comp FROM walk w JOIN bidir b ON b.u = w.id
),
lbl AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
csz AS (SELECT component, COUNT(*) AS cluster_size FROM lbl GROUP BY 1)
SELECT CAST(id AS BIGINT) AS id, CAST(component AS BIGINT) AS component,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM lbl JOIN csz USING (component)
"""


def q_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy on top of the near-dup clusters: keep the longest
    member of each cluster (ties → min id) — the full MinHash → LSH →
    verify → components → keeper chain in one query."""
    aug = _augmented(spark, sf_dir, perturb=True)
    sh = dedup.shingles(aug, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, k=12)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=3, max_bucket=50)
    pairs = dedup.jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= 0.6)
    comp = graph.connected_components(pairs, src="id_a", dst="id_b")
    quality = aug.select(
        F.col("doc_id").alias("id"), F.length("text").alias("quality")
    )
    out = dedup.keep_best_per_cluster(comp, quality)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
        F.col("quality").cast("long").alias("quality"),
        "keep",
    )


def _dedup_keepers_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (SELECT id_a AS u, id_b AS v FROM j WHERE jac >= 0.6),
bidir AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM bidir),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT b.v, w.comp FROM walk w JOIN bidir b ON b.u = w.id
),
lbl AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
q AS (SELECT id, length(text) AS quality FROM aug),
r AS (
  SELECT lbl.id, component, quality,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY quality DESC, lbl.id ASC) AS rn
  FROM lbl JOIN q ON q.id = lbl.id
)
SELECT CAST(id AS BIGINT) AS id, CAST(component AS BIGINT) AS component,
       CAST(quality AS BIGINT) AS quality, rn = 1 AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# Exact all-pairs n-gram Jaccard (inverted index, no LSH)
# ---------------------------------------------------------------------------

def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented(spark, sf_dir, perturb=True)
    pairs = dedup.ngram_jaccard_all_pairs(
        aug, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=100000
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).cast("double").alias("jaccard"),
    )


ORACLE_NGRAM_JACCARD = f"""
WITH aug0 AS ({_AUG_SQL[True]}),
aug AS (SELECT doc_id AS id, text FROM aug0),
{_SHINGLE_SQL},
sz AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT sa.id AS id_a, sb.id AS id_b, COUNT(*) AS inter
  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.id < sb.id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b, inter * 1.0 / (sza.sz + szb.sz - inter) AS jac
  FROM inter
  JOIN sz sza ON sza.id = inter.id_a
  JOIN sz szb ON szb.id = inter.id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(ROUND(jac, 4) AS DOUBLE) AS jaccard
FROM j WHERE jac >= 0.5
"""


# ---------------------------------------------------------------------------
# SimHash: 16-bit signatures + pairwise Hamming histogram
# ---------------------------------------------------------------------------

def q_simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sim = dedup.simhash16(docs, "doc_id", "text")
    a = sim.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sim.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    ham = pairs.select(
        dedup.hamming16(F.col("ha"), F.col("hb")).alias("hamming")
    )
    return ham.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def _simhash_oracle() -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(md5(tok), {i}, 1)) - 1)"  # noqa: E731
    h = f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"
    bit_sums = ", ".join(
        f"SUM(2 * (CAST(FLOOR(h / {2 ** j}) AS BIGINT) % 2) - 1) AS b{j}"
        for j in range(16)
    )
    sim_expr = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(16)
    )
    ham_expr = " + ".join(
        f"ABS(CAST(FLOOR(a.simhash / {2 ** j}) AS BIGINT) % 2 - "
        f"CAST(FLOOR(b.simhash / {2 ** j}) AS BIGINT) % 2)"
        for j in range(16)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
th AS (SELECT id, {h} AS h FROM tok),
sums AS (SELECT id, {bit_sums} FROM th GROUP BY 1),
sim AS (SELECT id, CAST({sim_expr} AS INT) AS simhash FROM sums),
ham AS (
  SELECT CAST({ham_expr} AS INT) AS hamming
  FROM sim a JOIN sim b ON a.id < b.id
)
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM ham GROUP BY 1
"""


def q_simhash64_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sim = dedup.simhash64(docs, "doc_id", "text")
    a = sim.select(F.col("id").alias("id_a"), F.col("simhash64").alias("ha"))
    b = sim.select(F.col("id").alias("id_b"), F.col("simhash64").alias("hb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    ham = pairs.select(
        dedup.hamming64(F.col("ha"), F.col("hb")).alias("hamming")
    )
    return ham.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup (the scale path): pigeonhole band
    equi-join + exact Hamming verify. The oracle computes the same
    result by brute force — identical answers from radically different
    plans is the point of the pair."""
    docs = _docs(spark, sf_dir)
    out = dedup.simhash_neardup(docs, "doc_id", "text", max_hamming=7)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def _simhash_neardup_oracle(max_hamming: int = 7) -> str:
    base = _simhash64_oracle()
    head, _, _ = base.partition("ham AS (")
    ham_expr = " + ".join(
        f"bit_count(xor(CAST(strpos('0123456789abcdef', substr(a.simhash64, {i}, 1)) - 1 AS INT), "
        f"CAST(strpos('0123456789abcdef', substr(b.simhash64, {i}, 1)) - 1 AS INT)))"
        for i in range(1, 17)
    )
    return f"""{head}ham AS (
  SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
         CAST({ham_expr} AS INT) AS hamming
  FROM sim a JOIN sim b ON a.id < b.id
)
SELECT id_a, id_b, hamming FROM ham WHERE hamming <= {max_hamming}
"""


def _simhash64_oracle() -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(md5(tok), {i}, 1)) - 1)"  # noqa: E731
    nibs = ", ".join(f"{nib(i + 1)} AS n{i}" for i in range(16))
    bit_sums = ", ".join(
        f"SUM(2 * (CAST(FLOOR(n{i} / {2 ** b}) AS BIGINT) % 2) - 1) AS s{i}_{b}"
        for i in range(16) for b in range(4)
    )
    nibble_chars = " || ".join(
        "substr('0123456789abcdef', ("
        + " + ".join(f"CASE WHEN s{i}_{b} > 0 THEN {2 ** b} ELSE 0 END"
                     for b in range(4))
        + ") + 1, 1)"
        for i in range(16)
    )
    ham_expr = " + ".join(
        f"bit_count(xor(CAST(strpos('0123456789abcdef', substr(a.simhash64, {i}, 1)) - 1 AS INT), "
        f"CAST(strpos('0123456789abcdef', substr(b.simhash64, {i}, 1)) - 1 AS INT)))"
        for i in range(1, 17)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
th AS (SELECT id, {nibs} FROM tok),
sums AS (SELECT id, {bit_sums} FROM th GROUP BY 1),
sim AS (SELECT id, {nibble_chars} AS simhash64 FROM sums),
ham AS (
  SELECT CAST({ham_expr} AS INT) AS hamming
  FROM sim a JOIN sim b ON a.id < b.id
)
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM ham GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Similarity search: brute-force kNN, LSH buckets, LSH ANN
# ---------------------------------------------------------------------------

_QIDS = list(range(10))

_NORM_SQL = "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b))"
_DOT_SQL = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(list_zip({a}, {b}), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))), "
            "(x, y) -> x + y)")


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    out = similarity.cosine_topk(emb, "vec_id", "embedding", _QIDS, k=5)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("nid").cast("long").alias("nid"),
        "cos",
    )


ORACLE_KNN_BRUTEFORCE = f"""
WITH base AS (
  SELECT vec_id AS nid, embedding AS vec, {_NORM_SQL.format(v='embedding')} AS nrm
  FROM embeddings
),
q AS (SELECT nid AS qid, vec AS qvec, nrm AS qnrm FROM base WHERE nid IN ({', '.join(map(str, _QIDS))})),
scored AS (
  SELECT q.qid, base.nid,
         CAST(ROUND({_DOT_SQL.format(a='base.vec', b='q.qvec')} / (base.nrm * q.qnrm), 6) AS DOUBLE) AS cos
  FROM base, q WHERE base.nid <> q.qid
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid, cos
FROM rk WHERE r <= 5
"""

_COMP_SQL = """
comp AS (
  SELECT p, d,
         CASE WHEN substr(md5(p || '_' || d), 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1.0 ELSE -1.0 END AS c
  FROM generate_series(0, 7) t(p), generate_series(0, 63) u(d)
),
proj AS (
  SELECT e.vec_id AS id, comp.p,
         SUM(comp.c * CAST(e.embedding[comp.d + 1] AS DOUBLE)) AS s
  FROM embeddings e, comp
  GROUP BY 1, 2
),
buckets AS (
  SELECT id, CAST(SUM(CASE WHEN s >= 0 THEN POW(2.0, p) ELSE 0.0 END) AS INT) AS bucket
  FROM proj GROUP BY 1
)"""


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return similarity.lsh_buckets(emb, "vec_id", "embedding", n_planes=8).select(
        F.col("id").cast("long").alias("id"),
        F.col("bucket").cast("int").alias("bucket"),
    )


ORACLE_LSH_BUCKETS = f"""
WITH {_COMP_SQL.lstrip()}
SELECT CAST(id AS BIGINT) AS id, bucket FROM buckets
"""

_ANN_QIDS = list(range(5))


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    out = similarity.lsh_ann_topk(emb, "vec_id", "embedding", _ANN_QIDS, k=3)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("nid").cast("long").alias("nid"),
        "cos",
    )


ORACLE_LSH_ANN_TOPK = f"""
WITH {_COMP_SQL.lstrip()},
base AS (
  SELECT e.vec_id AS nid, e.embedding AS vec, b.bucket
  FROM embeddings e JOIN buckets b ON b.id = e.vec_id
),
q AS (SELECT nid AS qid, vec AS qvec, bucket AS qbucket FROM base
      WHERE nid IN ({', '.join(map(str, _ANN_QIDS))})),
scored AS (
  SELECT q.qid, base.nid,
         CAST(ROUND({_DOT_SQL.format(a='base.vec', b='q.qvec')}
              / ({_NORM_SQL.format(v='base.vec')} * {_NORM_SQL.format(v='q.qvec')}), 6) AS DOUBLE) AS cos
  FROM base JOIN q ON base.bucket = q.qbucket AND base.nid <> q.qid
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid, cos
FROM rk WHERE r <= 3
"""


_BM25_TERMS = ["data", "query", "table"]


def q_bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.bm25_scores(docs, "doc_id", "text", _BM25_TERMS).select(
        F.col("id").cast("long").alias("id"), "n_hit_terms", "bm25",
    )


_BM25_LIST = ", ".join(f"'{t}'" for t in _BM25_TERMS)

ORACLE_BM25_RELEVANCE = f"""
WITH t AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
base AS (
  SELECT id, len(toks) AS dl,
         list_filter(toks, x -> list_contains([{_BM25_LIST}], x)) AS hits
  FROM t
),
cs AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base),
tf AS (
  SELECT id, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM (SELECT id, dl, UNNEST(hits) AS term FROM base)
  GROUP BY 1, 2
),
dfq AS (SELECT term, COUNT(DISTINCT id) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT id, COUNT(*) AS n_hit_terms,
         SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS bm25
  FROM tf JOIN dfq USING (term), cs
  GROUP BY 1
)
SELECT CAST(b.id AS BIGINT) AS id,
       CAST(COALESCE(n_hit_terms, 0) AS BIGINT) AS n_hit_terms,
       CAST(ROUND(COALESCE(bm25, 0.0), 4) AS DOUBLE) AS bm25
FROM base b LEFT JOIN sc ON sc.id = b.id
"""


def q_bloom_dedup_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every third document forms the 'seen before' history; is_dup is
    the exact (Bloom-screened, md5-verified) membership verdict. The
    Bloom maybe_dup bit itself is not SQL-replicable (Spark's filter
    hashing) — its no-false-negative / screen-before-verify mechanics
    are pinned by tests/test_curation_ops.py."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 3 == 0)
    out = dedup.bloom_screen(docs, history, "doc_id", "text",
                             expected_items=10_000, num_bits=80_000)
    return out.select(F.col("id").cast("long").alias("id"), "is_dup")


ORACLE_BLOOM_DEDUP_SCREEN = """
WITH hist AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 3 = 0)
SELECT CAST(doc_id AS BIGINT) AS id,
       md5(text) IN (SELECT h FROM hist) AS is_dup
FROM documents
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return similarity.random_projection(emb, "vec_id", "embedding",
                                        out_dim=8).select(
        F.col("id").cast("long").alias("id"),
        F.col("p").cast("int").alias("p"),
        "s",
    )


def _random_projection_oracle() -> str:
    """Per output component p: the ±1 coefficients are emitted as a SQL
    CASE over the element index so the fold order (list_reduce, left to
    right) matches Spark's F.aggregate bit-for-bit."""
    import hashlib

    def sign(p, d):
        h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0]
        return "1.0" if h in "01234567" else "-1.0"

    comps = []
    for p in range(8):
        case = " ".join(
            f"WHEN {d + 1} THEN {sign(p, d)}" for d in range(64)
        )
        comps.append(
            f"CAST(ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, 64), d -> "
            f"CAST(embedding[d] AS DOUBLE) * (CASE d {case} END))), "
            f"(a, b) -> a + b) * {1.0 / 8 ** 0.5!r}, 6) AS DOUBLE)"
        )
    arms = " UNION ALL ".join(
        f"SELECT CAST(vec_id AS BIGINT) AS id, {p} AS p, {c} AS s "
        f"FROM embeddings"
        for p, c in enumerate(comps)
    )
    return arms


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep the 20 longest documents per source —
    the per-domain share cap of a web-corpus mix."""
    from anomaly_detector_faironchain_spark.operators import curation

    docs = _docs(spark, sf_dir)
    return curation.cap_per_group(
        docs, "source", "n_chars", 20, "doc_id"
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("group_rank").cast("int").alias("group_rank"),
    )


ORACLE_DOMAIN_QUOTA = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS group_rank
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars, CAST(group_rank AS INT) AS group_rank
FROM r WHERE group_rank <= 20
"""


_NORM2_SQL = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
              "list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
              "(a, b) -> a + b)")


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with iters=0: centroids = the 16 lowest-id vectors (the
    deterministic Lloyd init), so assignment + nprobe probing + re-rank —
    the entire inverted-file search path incl. the Arrow-batched
    assignment UDF — is exactly replicable in SQL. (The learned-centroid
    variant is covered by the recall-vs-exact property test.)"""
    emb = _emb(spark, sf_dir)
    cents = similarity.kmeans_centroids(emb, "vec_id", "embedding",
                                        k=16, iters=0)
    out = similarity.ivf_topk(emb, "vec_id", "embedding", _ANN_QIDS,
                              cents, k=3, nprobe=4)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("nid").cast("long").alias("nid"),
        "cos",
    )


ORACLE_IVF_ANN_TOPK = f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
cn AS (SELECT cell, cvec, {_NORM2_SQL.format(v='cvec')} AS cn2 FROM cent),
base AS (SELECT vec_id AS nid, embedding AS vec FROM embeddings),
asg AS (
  SELECT nid, vec, cell,
         ROW_NUMBER() OVER (PARTITION BY nid ORDER BY score, cell) AS r
  FROM (
    SELECT b.nid, b.vec, c.cell,
           -2 * {_DOT_SQL.format(a='b.vec', b='c.cvec')} + c.cn2 AS score
    FROM base b, cn c
  )
),
assigned AS (SELECT nid, vec, cell FROM asg WHERE r = 1),
q AS (SELECT nid AS qid, vec AS qvec FROM base
      WHERE nid IN ({', '.join(map(str, _ANN_QIDS))})),
probes AS (
  SELECT qid, cell FROM (
    SELECT q.qid, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
             -2 * {_DOT_SQL.format(a='q.qvec', b='c.cvec')} + c.cn2,
             c.cell) AS r
    FROM q, cn c
  ) WHERE r <= 4
),
cand AS (
  SELECT p.qid, a.nid, a.vec
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE a.nid <> p.qid
),
scored AS (
  SELECT qid, nid,
         CAST(ROUND({_DOT_SQL.format(a='cand.vec', b='q.qvec')}
              / ({_NORM_SQL.format(v='cand.vec')} * {_NORM_SQL.format(v='q.qvec')}), 6) AS DOUBLE) AS cos
  FROM cand JOIN q USING (qid)
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid, cos
FROM rk WHERE r <= 3
"""


def _emb_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ planted near-duplicates at vec_id+100000: the copy is
    v + 0.05·reverse(v) (cos ≈ 0.997 against its source, while the max
    natural pair cosine in the corpus is ~0.51), so a 0.9 threshold
    recovers exactly the planted pairs that survive LSH bucketing."""
    emb = _emb(spark, sf_dir)
    orig = emb.select(
        F.col("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            "embedding", F.reverse("embedding"),
            lambda x, y: x.cast("double") + F.lit(0.05) * y.cast("double"),
        ).alias("embedding"),
    )
    return orig.unionByName(pert)


def q_embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _emb_augmented(spark, sf_dir)
    out = similarity.embedding_neardup_pairs(
        aug, "vec_id", "embedding", threshold=0.9, n_planes=8
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cos",
    )


def q_embedding_cosine_neardup_2t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified variant: 2 independent hash tables — every pair the
    1-table query finds plus pairs recovered by the second table."""
    aug = _emb_augmented(spark, sf_dir)
    out = similarity.embedding_neardup_pairs(
        aug, "vec_id", "embedding", threshold=0.9, n_planes=8, n_tables=2
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cos",
    )


ORACLE_EMBEDDING_COSINE_NEARDUP_2T = """
WITH aug AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(list_zip(embedding, list_reverse(embedding)),
                        s -> CAST(s[1] AS DOUBLE) + 0.05 * CAST(s[2] AS DOUBLE)) AS vec
  FROM embeddings
),
comp AS (
  SELECT p, d,
         CASE WHEN substr(md5(p || '_' || d), 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1.0 ELSE -1.0 END AS c
  FROM generate_series(0, 15) t(p), generate_series(0, 63) u(d)
),
proj AS (
  SELECT a.id, comp.p, SUM(comp.c * a.vec[comp.d + 1]) AS s
  FROM aug a, comp GROUP BY 1, 2
),
buckets AS (
  SELECT id, CAST(p // 8 AS INT) AS tbl,
         CAST(SUM(CASE WHEN s >= 0 THEN POW(2.0, p % 8) ELSE 0.0 END) AS INT) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.id < b.id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         CAST(ROUND(
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(va.vec, vb.vec),
               s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))), (x, y) -> x + y)
           / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(va.vec, x -> x * x)), (x, y) -> x + y))
            * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(vb.vec, x -> x * x)), (x, y) -> x + y))), 6)
           AS DOUBLE) AS cos
  FROM cand c JOIN aug va ON va.id = c.id_a JOIN aug vb ON vb.id = c.id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, cos
FROM pairs WHERE cos >= 0.9
"""


ORACLE_EMBEDDING_COSINE_NEARDUP = f"""
WITH aug AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(list_zip(embedding, list_reverse(embedding)),
                        s -> CAST(s[1] AS DOUBLE) + 0.05 * CAST(s[2] AS DOUBLE)) AS vec
  FROM embeddings
),
comp AS (
  SELECT p, d,
         CASE WHEN substr(md5(p || '_' || d), 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1.0 ELSE -1.0 END AS c
  FROM generate_series(0, 7) t(p), generate_series(0, 63) u(d)
),
proj AS (
  SELECT a.id, comp.p, SUM(comp.c * a.vec[comp.d + 1]) AS s
  FROM aug a, comp GROUP BY 1, 2
),
buckets AS (
  SELECT id, CAST(SUM(CASE WHEN s >= 0 THEN POW(2.0, p) ELSE 0.0 END) AS INT) AS bucket
  FROM proj GROUP BY 1
),
base AS (
  SELECT a.id, a.vec, b.bucket FROM aug a JOIN buckets b ON b.id = a.id
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(ROUND({_DOT_SQL.format(a='a.vec', b='b.vec')}
              / ({_NORM_SQL.format(v='a.vec')} * {_NORM_SQL.format(v='b.vec')}), 6) AS DOUBLE) AS cos
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.id < b.id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, cos
FROM pairs WHERE cos >= 0.9
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.token_stats(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "n_tokens", "n_chars", "avg_token_len", "alpha_ratio",
        "stop_ratio", "quality",
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in text_ops.STOPWORDS)

ORACLE_TOKEN_STATS = f"""
WITH t AS (
  SELECT doc_id AS id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b) AS tok_len_sum,
    len(list_filter(toks, x -> list_contains([{_STOP_LIST}], x))) AS stop_in,
    length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars
  FROM t
)
SELECT id, n_tokens, n_chars,
  CAST(ROUND(CASE WHEN n_tokens = 0 THEN 0.0 ELSE tok_len_sum * 1.0 / n_tokens END, 4) AS DOUBLE) AS avg_token_len,
  CAST(ROUND(CASE WHEN n_chars = 0 THEN 0.0 ELSE alpha_chars * 1.0 / n_chars END, 4) AS DOUBLE) AS alpha_ratio,
  CAST(ROUND(CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_in * 1.0 / n_tokens END, 4) AS DOUBLE) AS stop_ratio,
  CAST(ROUND(100.0 * (0.5 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE alpha_chars * 1.0 / n_chars END)
       + 0.5 * LEAST((CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_in * 1.0 / n_tokens END) * 5.0, 1.0)), 4) AS DOUBLE) AS quality
FROM m
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pred = text_ops.langid(docs, "doc_id", "text")
    return pred.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    ).select(
        F.col("id").cast("long").alias("id"),
        "lang",
        "predicted_lang",
        (F.col("lang") == F.col("predicted_lang")).alias("correct"),
    )


def _langid_oracle() -> str:
    cnt = {
        lang: (f"len(list_filter(toks, x -> list_contains("
               f"[{', '.join(repr(m) for m in markers)}], x)))")
        for lang, markers in text_ops.LANG_MARKERS
    }
    best = f"GREATEST({', '.join(f'c_{k}' for k in cnt)})"
    case = " ".join(
        f"WHEN best > 0 AND c_{lang} = best THEN '{lang}'" for lang in cnt
    )
    sel = ", ".join(f"{e} AS c_{k}" for k, e in cnt.items())
    return f"""
WITH t AS (
  SELECT doc_id AS id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
c AS (SELECT id, lang, {sel} FROM t),
b AS (SELECT *, {best} AS best FROM c)
SELECT CAST(id AS BIGINT) AS id, lang,
       CASE {case} ELSE 'und' END AS predicted_lang,
       lang = (CASE {case} ELSE 'und' END) AS correct
FROM b
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.char_entropy(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "n_chars", "distinct_chars", "entropy_bits",
    )


# fold visits the SORTED distinct chars on both sides → identical float
# accumulation order
ORACLE_CHAR_ENTROPY = """
WITH t AS (SELECT doc_id AS id, text, length(text) AS n FROM documents),
c AS (
  SELECT id, n,
         list_transform(generate_series(1, n), i -> substr(text, i, 1)) AS ch
  FROM t
),
u AS (SELECT id, n, ch, list_sort(list_distinct(ch)) AS uniq FROM c)
SELECT CAST(id AS BIGINT) AS id,
       CAST(n AS BIGINT) AS n_chars,
       CAST(len(uniq) AS BIGINT) AS distinct_chars,
       CAST(ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(uniq, cc ->
           -(len(list_filter(ch, x -> x = cc)) * 1.0 / n)
            * log2(len(list_filter(ch, x -> x = cc)) * 1.0 / n))),
         (a, b) -> a + b), 4) AS DOUBLE) AS entropy_bits
FROM u
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.fingerprints(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "sha256_hex",
        F.col("rolling_fp").cast("long").alias("rolling_fp"),
    )


ORACLE_FINGERPRINTS = """
WITH t AS (
  SELECT doc_id AS id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT CAST(id AS BIGINT) AS id, sha256(text) AS sha256_hex,
  CAST(list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(toks, x -> CAST(7 * length(x) + ascii(substr(x, 1, 1)) AS BIGINT))),
    (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS rolling_fp
FROM t
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation: exact dedup → lang-ID → quality/length gate over
    the duplicated corpus (500 originals + 500 exact copies)."""
    from anomaly_detector_faironchain_spark.operators import curation

    aug = _augmented(spark, sf_dir, perturb=False)
    out = curation.curate_documents(
        aug, "doc_id", "text", min_tokens=5, max_tokens=100_000,
        min_quality=50.0,
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        "predicted_lang", "n_tokens", "quality",
    )


def _curation_oracle() -> str:
    cnt = {
        lang: (f"len(list_filter(toks, x -> list_contains("
               f"[{', '.join(repr(m) for m in markers)}], x)))")
        for lang, markers in text_ops.LANG_MARKERS
    }
    best = f"GREATEST({', '.join(f'c_{k}' for k in cnt)})"
    case = " ".join(
        f"WHEN best > 0 AND c_{lang} = best THEN '{lang}'" for lang in cnt
    )
    sel = ", ".join(f"{e} AS c_{k}" for k, e in cnt.items())
    return f"""
WITH aug AS ({_AUG_SQL[False]}),
h AS (SELECT doc_id AS id, text, md5(text) AS content_md5 FROM aug),
k AS (SELECT content_md5, MIN(id) AS keeper_id FROM h GROUP BY 1),
kept AS (SELECT h.id, h.text FROM h JOIN k USING (content_md5)
         WHERE h.id = k.keeper_id),
t AS (SELECT id, text, string_split_regex(trim(text), '\\s+') AS toks FROM kept),
m AS (
  SELECT id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    length(text) AS n_chars,
    len(list_filter(toks, x -> list_contains([{_STOP_LIST}], x))) AS stop_in,
    length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars,
    {sel}
  FROM t
),
b AS (
  SELECT *, {best} AS best,
    CAST(ROUND(100.0 * (0.5 * (alpha_chars * 1.0 / n_chars)
         + 0.5 * LEAST((stop_in * 1.0 / n_tokens) * 5.0, 1.0)), 4) AS DOUBLE)
      AS quality
  FROM m
)
SELECT CAST(id AS BIGINT) AS id,
       CASE {case} ELSE 'und' END AS predicted_lang,
       n_tokens, quality
FROM b
WHERE n_tokens BETWEEN 5 AND 100000 AND quality >= 50.0
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing (Arrow-batched binary metadata)
# ---------------------------------------------------------------------------

def q_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    payloads = multimodal.to_binary_payload(docs, "doc_id", "text")
    return multimodal.binary_metadata(payloads)


ORACLE_BINARY_METADATA = """
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256_hex,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte
FROM documents
"""


def q_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 2nd 32-byte frame of each payload (stub container format —
    see operators/multimodal.sample_frames); the binary frame column is
    dropped for the compare, its length + sha256 prove the slicing."""
    docs = _docs(spark, sf_dir)
    payloads = multimodal.to_binary_payload(docs, "doc_id", "text")
    return multimodal.sample_frames(payloads, frame_bytes=32, stride=2).select(
        "id", "frame_idx", "n_frame_bytes", "frame_sha256"
    )


# document text is ASCII, so varchar substr == byte slice and
# sha256(varchar frame) == sha256 of the frame bytes
ORACLE_FRAME_SAMPLING = """
WITH t AS (
  SELECT doc_id AS id, text, octet_length(encode(text)) AS n FROM documents
),
f AS (
  SELECT id, CAST(i AS INT) AS frame_idx,
         substr(text, CAST(i * 32 + 1 AS BIGINT), 32) AS frame
  FROM t, UNNEST(generate_series(0, CAST(ceil(n / 32.0) AS BIGINT) - 1)) AS g(i)
  WHERE i % 2 = 0
)
SELECT CAST(id AS BIGINT) AS id, frame_idx,
       CAST(length(frame) AS BIGINT) AS n_frame_bytes,
       sha256(frame) AS frame_sha256
FROM f
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (13-gram-style overlap; n=5 at test scale)
# ---------------------------------------------------------------------------

def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    return dedup.contamination_flags(
        docs, bench, "doc_id", "text",
        bench_id_col="bid", bench_text_col="btext", n=5,
    ).select(
        F.col("id").cast("long").alias("id"),
        F.col("n_hit_ngrams").cast("long").alias("n_hit_ngrams"),
        "contaminated",
    )


ORACLE_CONTAMINATION_CHECK = """
WITH ctok AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
csh AS (
  SELECT DISTINCT id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
         toks[i+3] || ' ' || toks[i+4] AS shingle
  FROM ctok, UNNEST(generate_series(1, len(toks) - 4)) AS g(i)
  WHERE len(toks) >= 5
),
bsh AS (
  SELECT DISTINCT shingle FROM csh WHERE id % 37 = 0
),
hits AS (
  SELECT id, COUNT(*) AS n_hit FROM csh
  WHERE shingle IN (SELECT shingle FROM bsh)
  GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_ngrams,
       COALESCE(h.n_hit, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
"""


# ---------------------------------------------------------------------------
# Intra-document repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.repetition_stats(docs, "doc_id", "text", n=2).select(
        F.col("id").cast("long").alias("id"),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_distinct_ngrams").cast("long").alias("n_distinct_ngrams"),
        F.col("dup_ngram_frac").cast("double").alias("dup_ngram_frac"),
        F.col("top_ngram_frac").cast("double").alias("top_ngram_frac"),
    )


ORACLE_REPETITION_STATS = """
WITH tok AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
occ AS (
  SELECT id, toks[i] || ' ' || toks[i+1] AS shingle
  FROM tok, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
),
per AS (SELECT id, shingle, COUNT(*) AS c FROM occ GROUP BY 1, 2),
st AS (
  SELECT id, SUM(c) AS n_ngrams, COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM per GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       CAST(COALESCE(st.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(st.n_distinct, 0) AS BIGINT) AS n_distinct_ngrams,
       CASE WHEN COALESCE(st.n_ngrams, 0) = 0 THEN 0.0
            ELSE CAST(ROUND(1 - st.n_distinct * 1.0 / st.n_ngrams, 6) AS DOUBLE)
       END AS dup_ngram_frac,
       CASE WHEN COALESCE(st.n_ngrams, 0) = 0 THEN 0.0
            ELSE CAST(ROUND(st.top_c * 1.0 / st.n_ngrams, 6) AS DOUBLE)
       END AS top_ngram_frac
FROM documents d LEFT JOIN st ON st.id = d.doc_id
"""


# ---------------------------------------------------------------------------
# PII redaction + C4-style line filtering (deterministically injected
# PII / noise lines, since the corpus itself is clean)
# ---------------------------------------------------------------------------

def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact u"), F.col("doc_id"),
                         F.lit("@mail.example.com")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" id 987-65-4321"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return text_ops.redact_pii(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "redacted_text",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ssn").cast("long").alias("n_ssn"),
    )


ORACLE_PII_REDACTION = """
WITH aug AS (
  SELECT doc_id AS id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact u' || doc_id || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' id 987-65-4321' ELSE '' END
         AS text
  FROM documents
)
SELECT CAST(id AS BIGINT) AS id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '|||SSN|||', 'g'),
           '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '|||PHONE|||', 'g'),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '|||EMAIL|||', 'g')
       AS redacted_text,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn
FROM aug
"""


def q_line_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nmenu home about\nA proper closing sentence."),
        ).alias("text"),
    )
    return text_ops.c4_line_filter(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "clean_text",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
    )


ORACLE_LINE_FILTERING = """
WITH aug AS (
  SELECT doc_id AS id,
         text || chr(10) || 'menu home about' || chr(10)
              || 'A proper closing sentence.' AS text
  FROM documents
),
l AS (SELECT id, string_split(text, chr(10)) AS lines FROM aug),
k AS (
  SELECT id, lines,
         list_filter(
           lines,
           x -> regexp_matches(x, '[.!?"]\\s*$')
                AND len(string_split_regex(trim(x), '\\s+')) >= 3
         ) AS kept
  FROM l
)
SELECT CAST(id AS BIGINT) AS id,
       array_to_string(kept, chr(10)) AS clean_text,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines
FROM k
"""


# ---------------------------------------------------------------------------
# Exact fuzzy key matching (FastSS deletion neighborhoods): a "dirty"
# side with deterministic one-character deletions resolved back against
# the clean customer names
# ---------------------------------------------------------------------------

_TYPO = (
    "concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)), "
    "substring(c_name, cast(c_custkey % length(c_name) as int) + 2, "
    "length(c_name)))"
)


def q_fuzzy_key_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") <= 150
    )
    clean = cust.select(
        F.col("c_custkey").alias("cid"), F.col("c_name").alias("ckey")
    )
    dirty = cust.select(
        (F.col("c_custkey") + 1000).alias("did"),
        F.when(F.col("c_custkey") % 3 == 0, F.expr(_TYPO))
        .otherwise(F.col("c_name")).alias("dkey"),
    )
    return fuzzy.fuzzy_key_join(
        dirty, clean, "did", "dkey", "cid", "ckey", max_dist=1
    ).select(
        F.col("id_l").cast("long").alias("id_l"),
        F.col("id_r").cast("long").alias("id_r"),
        "key_l", "key_r",
        F.col("dist").cast("long").alias("dist"),
    )


ORACLE_FUZZY_KEY_MATCH = """
WITH cust AS (SELECT * FROM customer WHERE c_custkey <= 150),
clean AS (SELECT c_custkey AS id, c_name AS key FROM cust),
dirty AS (
  SELECT c_custkey + 1000 AS id,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(c_name, 1, CAST(c_custkey % len(c_name) AS INT))
                   || substr(c_name, CAST(c_custkey % len(c_name) AS INT) + 2)
              ELSE c_name END AS key
  FROM cust
),
vl AS (
  SELECT id, key, key AS var FROM dirty
  UNION
  SELECT id, key, substr(key, 1, i - 1) || substr(key, i + 1)
  FROM dirty, UNNEST(generate_series(1, len(key))) AS g(i)
),
vr AS (
  SELECT id, key, key AS var FROM clean
  UNION
  SELECT id, key, substr(key, 1, i - 1) || substr(key, i + 1)
  FROM clean, UNNEST(generate_series(1, len(key))) AS g(i)
),
cand AS (
  SELECT DISTINCT l.id AS id_l, r.id AS id_r, l.key AS key_l, r.key AS key_r
  FROM vl l JOIN vr r USING (var)
)
SELECT CAST(id_l AS BIGINT) AS id_l, CAST(id_r AS BIGINT) AS id_r,
       key_l, key_r, CAST(levenshtein(key_l, key_r) AS BIGINT) AS dist
FROM cand WHERE levenshtein(key_l, key_r) <= 1
"""


# ---------------------------------------------------------------------------
# Passage-level boilerplate removal (exact substring dedup, Lee et al. 2022)
# ---------------------------------------------------------------------------

# exactly 10 tokens each, so they align to the passage grid when prepended
_PD_HDR = "license header text copyright notice all rights reserved do not"
_PD_BLK = "this file was generated automatically from shared template sources"


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc gets the 10-token license header; every third doc also
    gets a second shared 10-token block — both land on passage
    boundaries, occur in > max_docs documents, and must be stripped while
    the unique body passages survive."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    aug = docs.select(
        F.col("doc_id").alias("id"),
        F.concat_ws(
            " ",
            F.lit(_PD_HDR),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_PD_BLK)),
            F.col("text"),
        ).alias("text"),
    )
    return dedup.passage_dedup(
        aug, "id", "text", passage_tokens=10, max_docs=2
    ).select(
        F.col("id").cast("long").alias("id"),
        F.col("n_passages").cast("long").alias("n_passages"),
        F.col("n_removed").cast("long").alias("n_removed"),
        "clean_text",
    )


ORACLE_PASSAGE_DEDUP = f"""
WITH aug AS (
  SELECT doc_id AS id,
         concat_ws(' ', '{_PD_HDR}',
                   CASE WHEN doc_id % 3 = 0 THEN '{_PD_BLK}' END,
                   text) AS text
  FROM documents
),
t AS (SELECT id, string_split_regex(trim(text), '\\s+') AS toks FROM aug),
p AS (
  SELECT id, i - 1 AS pos,
         array_to_string(list_slice(toks, (i - 1) * 10 + 1, i * 10), ' ') AS passage
  FROM t, UNNEST(generate_series(1, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS g(i)
),
b AS (SELECT md5(passage) AS h FROM p GROUP BY 1 HAVING count(DISTINCT id) > 2),
f AS (SELECT id, pos, passage, md5(passage) IN (SELECT h FROM b) AS is_boiler FROM p)
SELECT CAST(id AS BIGINT) AS id,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       string_agg(CASE WHEN NOT is_boiler THEN passage END, ' ' ORDER BY pos) AS clean_text
FROM f GROUP BY id
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "passage_dedup": q_passage_dedup,
    "contamination_check": q_contamination_check,
    "repetition_stats": q_repetition_stats,
    "pii_redaction": q_pii_redaction,
    "line_filtering": q_line_filtering,
    "fuzzy_key_match": q_fuzzy_key_match,
    "minhash_lsh_neardup": q_minhash_lsh_neardup,
    "neardup_clusters": q_neardup_clusters,
    "dedup_keepers": q_dedup_keepers,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash_hamming_hist": q_simhash_hamming_hist,
    "simhash64_hamming": q_simhash64_hamming,
    "simhash_neardup": q_simhash_neardup,
    "knn_bruteforce": q_knn_bruteforce,
    "lsh_buckets": q_lsh_buckets,
    "lsh_ann_topk": q_lsh_ann_topk,
    "ivf_ann_topk": q_ivf_ann_topk,
    "random_projection": q_random_projection,
    "bm25_relevance": q_bm25_relevance,
    "bloom_dedup_screen": q_bloom_dedup_screen,
    "domain_quota": q_domain_quota,
    "embedding_cosine_neardup": q_embedding_cosine_neardup,
    "embedding_cosine_neardup_2t": q_embedding_cosine_neardup_2t,
    "token_stats": q_token_stats,
    "langid": q_langid,
    "fingerprints": q_fingerprints,
    "char_entropy": q_char_entropy,
    "binary_metadata": q_binary_metadata,
    "frame_sampling": q_frame_sampling,
    "curation_pipeline": q_curation_pipeline,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "passage_dedup": ORACLE_PASSAGE_DEDUP,
    "contamination_check": ORACLE_CONTAMINATION_CHECK,
    "repetition_stats": ORACLE_REPETITION_STATS,
    "pii_redaction": ORACLE_PII_REDACTION,
    "line_filtering": ORACLE_LINE_FILTERING,
    "fuzzy_key_match": ORACLE_FUZZY_KEY_MATCH,
    "minhash_lsh_neardup": _minhash_oracle(),
    "neardup_clusters": _neardup_clusters_oracle(),
    "dedup_keepers": _dedup_keepers_oracle(),
    "ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "simhash_hamming_hist": _simhash_oracle(),
    "simhash64_hamming": _simhash64_oracle(),
    "simhash_neardup": _simhash_neardup_oracle(),
    "knn_bruteforce": ORACLE_KNN_BRUTEFORCE,
    "lsh_buckets": ORACLE_LSH_BUCKETS,
    "lsh_ann_topk": ORACLE_LSH_ANN_TOPK,
    "ivf_ann_topk": ORACLE_IVF_ANN_TOPK,
    "random_projection": _random_projection_oracle(),
    "bm25_relevance": ORACLE_BM25_RELEVANCE,
    "bloom_dedup_screen": ORACLE_BLOOM_DEDUP_SCREEN,
    "domain_quota": ORACLE_DOMAIN_QUOTA,
    "embedding_cosine_neardup": ORACLE_EMBEDDING_COSINE_NEARDUP,
    "embedding_cosine_neardup_2t": ORACLE_EMBEDDING_COSINE_NEARDUP_2T,
    "token_stats": ORACLE_TOKEN_STATS,
    "langid": _langid_oracle(),
    "fingerprints": ORACLE_FINGERPRINTS,
    "char_entropy": ORACLE_CHAR_ENTROPY,
    "binary_metadata": ORACLE_BINARY_METADATA,
    "frame_sampling": ORACLE_FRAME_SAMPLING,
    "curation_pipeline": _curation_oracle(),
}


# ---------------------------------------------------------------------------
# Round-3 session additions: model-based quality filter, SemDeDup,
# leakage-safe split
# ---------------------------------------------------------------------------

def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.quality_classifier(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"), "quality_score", "keep"
    )


def _quality_classifier_oracle() -> str:
    w = text_ops.QUALITY_CLF_WEIGHTS
    b = text_ops.QUALITY_CLF_BIAS
    z = (f"{b} + {w['alpha_ratio']} * alpha_ratio"
         f" + {w['stop_ratio']} * stop_ratio"
         f" + ({w['avg_token_len']}) * avg_token_len"
         f" + {w['log_tokens']} * log_tokens")
    return f"""
WITH t AS (
  SELECT doc_id AS id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b) AS tok_len_sum,
    len(list_filter(toks, x -> list_contains([{_STOP_LIST}], x))) AS stop_in,
    length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars
  FROM t
),
f AS (
  SELECT id,
    CAST(ROUND(CASE WHEN n_chars = 0 THEN 0.0 ELSE alpha_chars * 1.0 / n_chars END, 4) AS DOUBLE) AS alpha_ratio,
    CAST(ROUND(CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_in * 1.0 / n_tokens END, 4) AS DOUBLE) AS stop_ratio,
    CAST(ROUND(CASE WHEN n_tokens = 0 THEN 0.0 ELSE tok_len_sum * 1.0 / n_tokens END, 4) AS DOUBLE) AS avg_token_len,
    ln(1.0 + n_tokens) AS log_tokens
  FROM m
),
s AS (
  SELECT id,
    CAST(ROUND(1.0 / (1.0 + exp(-({z}))), 6) AS DOUBLE) AS quality_score
  FROM f
)
SELECT CAST(id AS BIGINT) AS id, quality_score, quality_score >= 0.5 AS keep
FROM s
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the augmented embeddings (planted near-dups at
    vec_id+100000, cos ≈ 0.997): iters=0 centroids = the 16 lowest-id
    vectors, so clustering + within-cell pairs + keep rule are exactly
    replicable in SQL (same device as q_ivf_ann_topk)."""
    aug = _emb_augmented(spark, sf_dir)
    out = similarity.semantic_dedup(
        aug, "vec_id", "embedding", k=16, iters=0, threshold=0.9
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("cell").cast("int").alias("cell"),
        "keep",
    )


ORACLE_SEMANTIC_DEDUP = f"""
WITH aug AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(list_zip(embedding, list_reverse(embedding)),
                        s -> CAST(s[1] AS DOUBLE) + 0.05 * CAST(s[2] AS DOUBLE)) AS vec
  FROM embeddings
),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell, vec AS cvec
  FROM (SELECT * FROM aug ORDER BY id LIMIT 16)
),
cn AS (SELECT cell, cvec, {_NORM2_SQL.format(v='cvec')} AS cn2 FROM cent),
asg AS (
  SELECT id, vec, cell,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY score, cell) AS r
  FROM (
    SELECT a.id, a.vec, c.cell,
           -2 * {_DOT_SQL.format(a='a.vec', b='c.cvec')} + c.cn2 AS score
    FROM aug a, cn c
  )
),
assigned AS (SELECT id, vec, cell FROM asg WHERE r = 1),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(ROUND({_DOT_SQL.format(a='a.vec', b='b.vec')}
              / ({_NORM_SQL.format(v='a.vec')} * {_NORM_SQL.format(v='b.vec')}), 6) AS DOUBLE) AS cos
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
),
dropped AS (SELECT DISTINCT id_b AS id FROM pairs WHERE cos >= 0.9)
SELECT CAST(a.id AS BIGINT) AS id, CAST(a.cell AS INT) AS cell,
       d.id IS NULL AS keep
FROM assigned a LEFT JOIN dropped d ON d.id = a.id
"""


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup components (the q_neardup_clusters chain) become the
    split unit; singletons hash on their own id."""
    aug = _augmented(spark, sf_dir, perturb=True)
    sh = dedup.shingles(aug, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, k=12)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=3, max_bucket=50)
    pairs = dedup.jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= 0.6)
    out = training_ops.leakage_safe_split(
        aug, "doc_id", pairs, _SPLIT_FRACTIONS
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
        "split",
    )


def _leakage_safe_split_oracle() -> str:
    thr = training_ops.split_thresholds(_SPLIT_FRACTIONS)
    return f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (SELECT id_a AS u, id_b AS v FROM j WHERE jac >= 0.6),
bidir AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM bidir),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT b.v, w.comp FROM walk w JOIN bidir b ON b.u = w.id
),
lbl AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
alldocs AS (SELECT id FROM aug),
comp AS (
  SELECT a.id, COALESCE(l.component, a.id) AS component
  FROM alldocs a LEFT JOIN lbl l ON l.id = a.id
)
SELECT CAST(id AS BIGINT) AS id, CAST(component AS BIGINT) AS component,
       CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 4) < '{thr[0][1]}' THEN 'train'
            WHEN substr(md5(CAST(component AS VARCHAR)), 1, 4) < '{thr[1][1]}' THEN 'val'
            ELSE 'test' END AS split
FROM comp
"""


QUERIES.update({
    "quality_classifier": q_quality_classifier,
    "semantic_dedup": q_semantic_dedup,
    "leakage_safe_split": q_leakage_safe_split,
})
ORACLES.update({
    "quality_classifier": _quality_classifier_oracle(),
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "leakage_safe_split": _leakage_safe_split_oracle(),
})


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return text_ops.bpe_token_count(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"),
        "n_bpe_tokens", "n_ws_tokens", "chars_per_token",
    )


_BPE_SQL_PAT = text_ops.BPE_SPLIT_PATTERN.replace("'", "''")

ORACLE_BPE_TOKEN_COUNT = f"""
WITH t AS (
  SELECT doc_id AS id, text,
         len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS n_bpe,
         len(string_split_regex(trim(text), '\\s+')) AS n_ws
  FROM documents
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
       CAST(n_ws AS BIGINT) AS n_ws_tokens,
       CAST(ROUND(CASE WHEN n_bpe > 0 THEN length(text) * 1.0 / n_bpe ELSE 0.0 END, 4)
            AS DOUBLE) AS chars_per_token
FROM t
"""


QUERIES.update({"bpe_token_count": q_bpe_token_count})
ORACLES.update({"bpe_token_count": ORACLE_BPE_TOKEN_COUNT})


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining with labeled positives (qid, qid+1): the top
    similar corpus items excluding self and the positive."""
    emb = _emb(spark, sf_dir)
    pos = emb.select(F.col("vec_id").alias("qid"),
                     (F.col("vec_id") + 1).alias("pos_id")) \
             .filter(F.col("qid").isin(_QIDS))
    out = similarity.hard_negatives(emb, "vec_id", "embedding", pos, k=5)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("nid").cast("long").alias("nid"),
        "cos",
    )


ORACLE_HARD_NEGATIVES = f"""
WITH base AS (
  SELECT vec_id AS nid, embedding AS vec, {_NORM_SQL.format(v='embedding')} AS nrm
  FROM embeddings
),
q AS (SELECT nid AS qid, vec AS qvec, nrm AS qnrm FROM base
      WHERE nid IN ({', '.join(map(str, _QIDS))})),
scored AS (
  SELECT q.qid, base.nid,
         CAST(ROUND({_DOT_SQL.format(a='base.vec', b='q.qvec')} / (base.nrm * q.qnrm), 6) AS DOUBLE) AS cos
  FROM base, q WHERE base.nid <> q.qid AND base.nid <> q.qid + 1
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid, cos
FROM rk WHERE r <= 5
"""


QUERIES.update({"hard_negatives": q_hard_negatives})
ORACLES.update({"hard_negatives": ORACLE_HARD_NEGATIVES})


def q_ngram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM trained on the English subset (in-domain
    reference), cross-entropy scored over the whole corpus; top_k=5000
    keeps the model truncated so the unseen-ngram floor is exercised."""
    docs = _docs(spark, sf_dir)
    model = text_ops.char_ngram_model(
        docs.filter(F.col("lang") == "en"), "text", n=3, top_k=5000
    )
    out = text_ops.cross_entropy_score(docs, "doc_id", "text", model, n=3)
    return out.select(
        F.col("id").cast("long").alias("id"), "n_ngrams", "bits_per_ngram"
    )


ORACLE_NGRAM_PERPLEXITY = """
WITH ref AS (SELECT text FROM documents WHERE lang = 'en'),
g AS (
  SELECT substr(text, CAST(i AS INT), 3) AS ngram
  FROM ref, LATERAL unnest(generate_series(1, length(text) - 2)) t(i)
  WHERE length(text) >= 3
),
c AS (SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
top AS (
  SELECT ngram, cnt FROM (
    SELECT ngram, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, ngram ASC) AS r
    FROM c
  ) WHERE r <= 5000
),
model AS (
  SELECT ngram, CAST(ROUND(ln(cnt / tot), 6) AS DOUBLE) AS logp
  FROM top, tot
),
dg AS (
  SELECT doc_id AS id, substr(text, CAST(i AS INT), 3) AS ngram
  FROM documents, LATERAL unnest(generate_series(1, length(text) - 2)) t(i)
  WHERE length(text) >= 3
),
j AS (
  SELECT id, COALESCE(m.logp, -20.0) AS logp
  FROM dg LEFT JOIN model m USING (ngram)
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(ROUND(-AVG(logp) / ln(2), 4) AS DOUBLE) AS bits_per_ngram
FROM j GROUP BY id
"""


QUERIES.update({"ngram_perplexity": q_ngram_perplexity})
ORACLES.update({"ngram_perplexity": ORACLE_NGRAM_PERPLEXITY})


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization over documents augmented with a messy variant
    (curly quotes, NBSP, tabs, control chars, ragged spaces injected at
    doc_id+100000) so the cleanup path is actually exercised."""
    docs = _docs(spark, sf_dir)
    messy = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("“Q” —   "),
            F.col("text"),
            F.lit("\t trailing…  "),
        ).alias("text"),
    )
    aug = docs.select("doc_id", "text").unionByName(messy)
    return text_ops.normalize_text(aug, "doc_id", "text").select(
        F.col("id").cast("long").alias("id"), "norm_text", "changed"
    )


def _normalize_text_oracle() -> str:
    src = text_ops.NORM_TRANSLATE_SRC
    dst = text_ops.NORM_TRANSLATE_DST.replace("'", "''")
    return f"""
WITH aug AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS id,
         '“Q” —   ' || text || chr(9) || ' trailing…  ' AS text
  FROM documents
),
n AS (
  SELECT id, text,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(translate(text, '{src}', '{dst}'), '…', '...', 'g'),
        '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
      '\\s+', ' ', 'g')) AS norm_text
  FROM aug
)
SELECT CAST(id AS BIGINT) AS id, norm_text,
       norm_text IS DISTINCT FROM text AS changed
FROM n
"""


QUERIES.update({"normalize_text": q_normalize_text})
ORACLES.update({"normalize_text": _normalize_text_oracle()})
