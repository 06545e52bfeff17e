"""Reference-parity constraint suite: the 20 checks of the reference's
two validation scripts (reference: etl/test.py:60-128,
tests/test_etl.py:25-65) as engine TableSpecs — each check becomes a
per-partition verdict + materialized violation rows instead of a pandas
assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from anomaly_detector_faironchain_spark.plans.compiler import (
    ValidationResult,
    validate_table,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    ForeignKey,
    InRange,
    InSet,
    LengthInRange,
    NotNull,
    Regex,
    RowCheck,
    TableSpec,
    Unique,
)


def parity_specs() -> dict[str, TableSpec]:
    return {
        # etl/test.py:64-67 PK; :71 non-null; :104 token domain;
        # :110-121 amount digits / >0 / ≤78 digits
        "abstract_token_transfer": TableSpec(
            name="abstract_token_transfer",
            constraints=(
                Unique("transfer_sid"),
                NotNull("tx_sid", "spender_address_sid", "receiver_address_sid",
                        "token_sid", "amount"),
                InSet("token_sid", ("1_native",)),
                Regex("amount", "[0-9]+"),
                RowCheck("amount_positive", "amount <> '0'",
                         "zero-amount transfers are invalid"),
                LengthInRange("amount", 1, 78),
                ForeignKey(("tx_sid",), "abstract_transaction", ("tx_sid",)),
                ForeignKey(("spender_address_sid",), "abstract_account", ("account_sid",)),
                ForeignKey(("receiver_address_sid",), "abstract_account", ("account_sid",)),
            ),
        ),
        # etl/test.py:65 PK; :72 non-null; :97 tx→blk
        "abstract_transaction": TableSpec(
            name="abstract_transaction",
            constraints=(
                Unique("tx_sid"),
                NotNull("tx_sid", "tx_hash", "block_sid"),
                Regex("tx_hash", "0x[0-9a-f]{64}"),
                ForeignKey(("block_sid",), "abstract_block", ("block_sid",)),
            ),
        ),
        # etl/test.py:66 PK; :73 non-null; :101 timestamp range;
        # preprocess_blocks.py:23-30 number range
        "abstract_block": TableSpec(
            name="abstract_block",
            constraints=(
                Unique("block_sid"),
                NotNull("block_sid", "block_number", "timestamp"),
                InRange("timestamp", 1_400_000_000, 2_500_000_000),
                InRange("block_number", 10_000, 999_999_999),
            ),
        ),
        # etl/test.py:67 PK; :74 non-null; address format
        "abstract_account": TableSpec(
            name="abstract_account",
            constraints=(
                Unique("account_sid"),
                NotNull("account_sid", "address", "type"),
                Regex("address", "0x[0-9a-f]{40}"),
            ),
        ),
        # etl/test.py:75-77
        "abstract_token": TableSpec(
            name="abstract_token",
            constraints=(
                NotNull("token_sid", "token_standard", "token_symbol"),
                InSet("token_standard", ("native", "erc20", "erc721")),
            ),
        ),
    }


def run_parity_suite(tables: dict[str, DataFrame]) -> dict[str, ValidationResult]:
    """Run all five specs; FK refs resolve within the supplied tables."""
    specs = parity_specs()
    out = {}
    for name, spec in specs.items():
        refs = {fk.ref_table: tables[fk.ref_table] for fk in spec.by_type(ForeignKey)}
        out[name] = validate_table(tables[name], spec, refs=refs)
    return out
