"""Reference-parity abstract-table builders, Spark-first.

Re-expresses the reference's five builders (reference:
etl/abstract/build_abstract_block.py, build_abstract_transaction.py,
build_abstract_token_transfer.py, build_abstract_account.py,
build_abstract_token.py) as declarative DataFrame pipelines:
  * daily-file concat loops → a single multi-file scan (Catalyst
    parallelizes splits; here builders take the already-loaded raw DF);
  * per-row `.apply` validators → vectorized rlike/length predicates
    (reference preprocess_native_transfer.py:33-91, preprocess_blocks.py:23-48);
  * `int(x, 16)` Wei parse → etl.amounts (Arrow-batched, string + dec38);
  * `drop_duplicates(keep=first)` → deterministic row_number ordering
    (the reference's pick depends on file order — SURVEY.md §2 A3).

All sids follow the reference pattern f"{chain_id}_{natural_key}"
(build_abstract_token_transfer.py:45-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.etl import amounts

ADDRESS_RE = "^0x[0-9a-f]{40}$"
HASH_RE = "^0x[0-9a-f]{64}$"
VALUE_RE = "^0x[0-9a-f]{64}$"
MIN_BLOCK, MAX_BLOCK = 10_000, 999_999_999


def _norm(col) -> F.Column:
    """strip().lower() — the reference's pervasive normalization (F1)."""
    return F.lower(F.trim(col))


def clean_blocks(raw: DataFrame) -> DataFrame:
    """Validator parity with preprocess_blocks.py:23-48: numeric block
    number in range, 66-char 0x hash, integer timestamp; malformed rows
    are DROPPED (the reference filters, not fails)."""
    return (
        raw.na.fill({"chain_id": 1})
        .na.drop(subset=["number", "timestamp"])
        .withColumn("hash", _norm(F.col("hash")))
        .filter(F.col("number").between(MIN_BLOCK, MAX_BLOCK))
        .filter(F.col("hash").rlike(HASH_RE))
        .filter(F.col("timestamp").cast("long").isNotNull())
    )


def clean_native_transfers(raw: DataFrame) -> DataFrame:
    """Validator parity with preprocess_native_transfer.py:33-104."""
    out = (
        raw.na.fill({"chain_id": 1})
        .na.drop(subset=["transaction_hash", "from_address", "to_address",
                         "value_binary", "block_number"])
        .withColumn("transaction_hash", _norm(F.col("transaction_hash")))
        .withColumn("from_address", _norm(F.col("from_address")))
        .withColumn("to_address", _norm(F.col("to_address")))
        .withColumn("value_binary", _norm(F.col("value_binary")))
    )
    return (
        out.filter(F.col("transaction_hash").rlike(HASH_RE))
        .filter(F.col("from_address").rlike(ADDRESS_RE))
        .filter(F.col("to_address").rlike(ADDRESS_RE))
        .filter(F.col("value_binary").rlike(VALUE_RE))
        .filter(F.col("block_number").between(MIN_BLOCK, MAX_BLOCK))
    )


def build_abstract_block(clean: DataFrame) -> DataFrame:
    """reference build_abstract_block.py: sid, metadata-first projection,
    full-row dedup."""
    return (
        clean.select(
            F.concat_ws("_", F.col("chain_id"), F.col("number")).alias("block_sid"),
            F.col("chain_id").cast("long").alias("chain_id"),
            F.col("number").cast("long").alias("block_number"),
            F.col("timestamp").cast("long").alias("timestamp"),
        )
        .distinct()
    )


def build_abstract_transaction(clean_transfers: DataFrame) -> DataFrame:
    """reference build_abstract_transaction.py: one row per tx, first
    occurrence wins — made DETERMINISTIC via ordered row_number (the
    reference inherits file order)."""
    base = clean_transfers.select(
        F.concat_ws("_", F.col("chain_id"), F.col("transaction_hash")).alias("tx_sid"),
        F.col("transaction_hash").alias("tx_hash"),
        F.concat_ws("_", F.col("chain_id"), F.col("block_number")).alias("block_sid"),
        F.col("chain_id").cast("long").alias("chain_id"),
        "block_number", "transfer_index",
    )
    w = Window.partitionBy("tx_sid").orderBy("block_number", "transfer_index")
    return (
        base.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("tx_sid", "tx_hash", "block_sid", "chain_id")
    )


def build_abstract_token_transfer(clean_transfers: DataFrame) -> DataFrame:
    """reference build_abstract_token_transfer.py: sid triple, hex→Wei
    amount (exact digit string + dec38), zero-amount filter, dedup by
    transfer_sid."""
    with_amounts = clean_transfers.select(
        "*", *amounts.amount_columns(F.col("value_binary"))
    )
    base = with_amounts.select(
        F.concat_ws(
            "_", F.col("chain_id"), F.col("transaction_hash"), F.col("transfer_index")
        ).alias("transfer_sid"),
        F.col("transfer_index").cast("long").alias("transfer_index"),
        F.col("amount_digits").alias("amount"),
        "amount_dec38",
        "amount_overflow",
        F.lit("transfer").alias("category"),
        F.concat_ws("_", F.col("chain_id"), F.col("transaction_hash")).alias("tx_sid"),
        F.concat_ws("_", F.col("chain_id"), F.col("from_address")).alias("spender_address_sid"),
        F.concat_ws("_", F.col("chain_id"), F.col("to_address")).alias("receiver_address_sid"),
        F.concat_ws("_", F.col("chain_id"), F.lit("native")).alias("token_sid"),
    ).filter(F.col("amount") != "0")  # reference :53 amount > 0
    w = Window.partitionBy("transfer_sid").orderBy("amount")
    return (
        base.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def build_abstract_account(clean_transfers: DataFrame) -> DataFrame:
    """reference build_abstract_account.py: from∪to addresses, deduped."""
    f = clean_transfers.select(
        F.col("chain_id"), F.col("from_address").alias("address")
    )
    t = clean_transfers.select(
        F.col("chain_id"), F.col("to_address").alias("address")
    )
    return (
        f.union(t)
        .distinct()
        .select(
            F.concat_ws("_", F.col("chain_id"), F.col("address")).alias("account_sid"),
            "address",
            F.lit("unknown").alias("type"),
            F.col("chain_id").cast("long").alias("chain_id"),
        )
    )


def build_abstract_token(spark: SparkSession, chain_id: int = 1) -> DataFrame:
    """reference build_abstract_token.py:20-27 — static 1-row native token."""
    return spark.createDataFrame(
        [(f"{chain_id}_native", "native", "ETH", None, chain_id)],
        "token_sid string, token_standard string, token_symbol string, "
        "address string, chain_id long",
    )


def build_all(raw_blocks: DataFrame, raw_transfers: DataFrame) -> dict[str, DataFrame]:
    """The full EP1 pipeline: clean → five abstract tables."""
    cb = clean_blocks(raw_blocks)
    ct = clean_native_transfers(raw_transfers)
    spark = raw_blocks.sparkSession
    return {
        "abstract_block": build_abstract_block(cb),
        "abstract_transaction": build_abstract_transaction(ct),
        "abstract_token_transfer": build_abstract_token_transfer(ct),
        "abstract_account": build_abstract_account(ct),
        "abstract_token": build_abstract_token(spark),
    }
