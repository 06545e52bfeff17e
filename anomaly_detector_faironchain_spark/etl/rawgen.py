"""Deterministic synthetic raw chain data (FIXTURES.md §B inputs): the
shape of the reference's daily raw CSVs — blocks and native transfers —
generated distributively from spark.range, seed-stable at any
parallelism. Corruption flags exist so cleaning/validator parity can be
asserted (the reference's validators drop malformed rows:
etl/preprocess/preprocess_native_transfer.py:33-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHAIN_ID = 1
BASE_BLOCK = 16_308_189  # reference golden slice starts here
BASE_TS = 1_673_000_000


def _hex_of(col, nibbles: int, salt: str) -> F.Column:
    """Deterministic lowercase hex string of given length from a column."""
    h = F.sha2(F.concat(col.cast("string"), F.lit(salt)), 256)
    return F.lower(F.substring(h, 1, nibbles))


def raw_blocks(spark: SparkSession, n_blocks: int, seed: int = 42) -> DataFrame:
    df = spark.range(n_blocks)
    return df.select(
        F.lit(CHAIN_ID).alias("chain_id"),
        (F.lit(BASE_BLOCK) + F.col("id")).alias("number"),
        (F.lit(BASE_TS) + F.col("id") * 12).alias("timestamp"),
        F.concat(F.lit("0x"), _hex_of(F.col("id"), 64, f"blk{seed}")).alias("hash"),
    )


def raw_native_transfers(
    spark: SparkSession,
    n_rows: int,
    n_blocks: int,
    seed: int = 42,
    big_amount_every: int = 17,
    zero_amount_every: int = 0,
    bad_address_every: int = 0,
    n_accounts: int = 400,
    shared_account_space: bool = False,
) -> DataFrame:
    """One row per native transfer. Amounts are 64-nibble hex Wei:
    mostly int64-sized, every `big_amount_every`-th beyond 2^64 (the
    uint256 path the reference guards with string storage). Optional
    corruption knobs inject rows the validators must drop."""
    df = spark.range(n_rows)
    gid = F.col("id")
    u = F.pmod(F.xxhash64(gid, F.lit(seed)), F.lit(1_000_000))

    # n_accounts distinct accounts, heavy-ish reuse. With
    # shared_account_space the from/to sides draw from ONE address pool
    # (index varies per side, hex derivation shares a salt) — the graph
    # is then non-bipartite, so mutual-pair/triangle motifs actually
    # occur; the default keeps the legacy disjoint spaces byte-identical.
    def acct(sel_salt: str) -> F.Column:
        idx = F.pmod(F.xxhash64(gid, F.lit(sel_salt)), F.lit(n_accounts))
        hex_salt = f"acct{seed}" if shared_account_space else sel_salt
        return F.concat(F.lit("0x"), _hex_of(idx, 40, hex_salt))
    from_addr = acct(f"from{seed}")
    to_addr = acct(f"to{seed}")
    if bad_address_every:
        from_addr = F.when(
            gid % bad_address_every == 0, F.lit("0xNOTANADDRESS")
        ).otherwise(from_addr)

    # amount: value = 1e12 + u (fits long); big rows get extra high nibbles
    small_hex = F.lower(F.conv((F.lit(1_000_000_000_000) + u).cast("string"), 10, 16))
    big_hex = F.concat(_hex_of(gid, 10, f"hi{seed}"), small_hex)
    amount_hex = small_hex
    if big_amount_every:
        amount_hex = F.when(gid % big_amount_every == 0, big_hex).otherwise(small_hex)
    if zero_amount_every:
        amount_hex = F.when(
            gid % zero_amount_every == zero_amount_every - 1, F.lit("0")
        ).otherwise(amount_hex)
    value_binary = F.concat(F.lit("0x"), F.lpad(amount_hex, 64, "0"))

    # ~4 transfers per tx; txs spread over blocks
    tx_group = F.floor(gid / 4)
    return df.select(
        F.lit(CHAIN_ID).alias("chain_id"),
        F.concat(F.lit("0x"), _hex_of(tx_group, 64, f"tx{seed}")).alias("transaction_hash"),
        F.pmod(gid, F.lit(4)).cast("int").alias("transfer_index"),
        (F.lit(BASE_BLOCK) + F.pmod(tx_group, F.lit(n_blocks))).alias("block_number"),
        from_addr.alias("from_address"),
        to_addr.alias("to_address"),
        value_binary.alias("value_binary"),
    )
