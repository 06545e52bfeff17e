"""Training-data preparation queries (operators/training.py) with DuckDB
oracles over the documents table: group-aware deterministic splits,
context-window chunking, token-budget packing, corpus heavy-hitters,
stratified sampling. Every expression is engine-portable (md5 hex,
regex split, substring) so the oracle recomputes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.training import (
    chunk_documents,
    deterministic_split,
    mix_corpora,
    pack_token_budget,
    split_thresholds,
    stratified_sample,
    temperature_weights,
    top_terms,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
# 0.8 -> 'cccc', 0.9 -> 'e666' (split_thresholds); inlined in the oracle
_THR = split_thresholds(_FRACTIONS)


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = deterministic_split(docs, "source", _FRACTIONS)
    return out.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select("split", "source", "n_docs")


ORACLE_TRAIN_SPLIT = f"""
SELECT CASE WHEN substr(md5(source), 1, 4) < '{_THR[0][1]}' THEN 'train'
            WHEN substr(md5(source), 1, 4) < '{_THR[1][1]}' THEN 'val'
            ELSE 'test' END AS split,
       source,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=200, overlap=50).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_id", "chunk_len", "chunk_md5",
    )


ORACLE_DOC_CHUNKS = """
WITH ch AS (
  SELECT doc_id,
         unnest(generate_series(
           0, GREATEST(CAST(FLOOR((LENGTH(text) - 1) / 150.0) AS BIGINT), 0)
         )) AS chunk_id,
         text
  FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(LENGTH(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT)
         AS chunk_len,
       md5(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS chunk_md5
FROM ch
"""


def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return pack_token_budget(
        docs, shard_col="lang", order_col="doc_id", budget=2000
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang", "tokens", "batch_id",
    )


ORACLE_TOKEN_PACKING = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS tokens
  FROM documents
), r AS (
  SELECT *, SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, tokens,
       CAST(FLOOR((running - tokens) / 2000.0) AS BIGINT) AS batch_id
FROM r
"""


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return top_terms(docs, k=20, min_len=4).select(
        "term", F.col("n").cast("long").alias("n")
    )


ORACLE_TOP_TERMS = """
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
) WHERE LENGTH(term) >= 4
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT 20
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", k=5).select(
        "lang",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("sample_rank").cast("long").alias("sample_rank"),
    )


ORACLE_STRATIFIED_SAMPLE = """
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sample_rank AS BIGINT) AS sample_rank
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents
) WHERE sample_rank <= 5
"""


# -- source-weighted mixture: 2.5 epochs of src0, half of src1, none of
#    src2, one of everything else; epochs label the repeats ---------------

def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = mix_corpora(
        docs, "source", "doc_id",
        {"src0": 2.5, "src1": 0.5, "src2": 0.0},
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("epoch").cast("long").alias("epoch"),
    )


# 0.5 -> '8000' (frac thresholds as in mix_corpora); default weight 1.0
ORACLE_CORPUS_MIXTURE = """
WITH c AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                     WHEN 'src2' THEN 0 ELSE 1 END
         + CASE WHEN substr(
                  md5('mix:' || source || ':' || CAST(doc_id AS VARCHAR)),
                  1, 4)
                < CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '8000'
                              WHEN 'src2' THEN '0000' ELSE '0000' END
           THEN 1 ELSE 0 END AS copies
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(e AS BIGINT) AS epoch
FROM c, UNNEST(generate_series(1, copies)) AS g(e)
WHERE copies > 0
"""


QUERIES = {
    "train_split": q_train_split,
    "corpus_mixture": q_corpus_mixture,
    "doc_chunks": q_doc_chunks,
    "token_packing": q_token_packing,
    "top_terms": q_top_terms,
    "stratified_sample": q_stratified_sample,
}
ORACLES = {
    "train_split": ORACLE_TRAIN_SPLIT,
    "corpus_mixture": ORACLE_CORPUS_MIXTURE,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "token_packing": ORACLE_TOKEN_PACKING,
    "top_terms": ORACLE_TOP_TERMS,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
}


def q_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return temperature_weights(docs, "source", alpha=0.5, max_weight=4.0)


ORACLE_TEMPERATURE_WEIGHTS = """
WITH s AS (SELECT source, COUNT(*) * 1.0 AS n FROM documents GROUP BY 1),
t AS (SELECT SUM(n) AS tot FROM s),
sh AS (SELECT source, n, n / tot AS share FROM s, t),
p AS (SELECT source, n, share, POW(share, 0.5) AS pa FROM sh),
z AS (SELECT SUM(pa) AS z FROM p),
r AS (SELECT source, n, share, pa / z / share AS raw_w FROM p, z),
m AS (SELECT MAX(raw_w) AS mx FROM r)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(ROUND(share, 6) AS DOUBLE) AS share,
       CAST(ROUND(raw_w / mx * 4.0, 6) AS DOUBLE) AS weight
FROM r, m
"""


QUERIES.update({"temperature_weights": q_temperature_weights})
ORACLES.update({"temperature_weights": ORACLE_TEMPERATURE_WEIGHTS})
