"""End-to-end reference-parity: synthetic raw chain data → clean →
abstract star schema → the reference's 20-check suite, all green; plus
Wei-amount exactness against Python int(x,16) and validator drop
behavior under injected corruption.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.etl import abstract, amounts, checks, rawgen

N_TRANSFERS = 4000
N_BLOCKS = 120


@pytest.fixture(scope="module")
def tables(spark):
    rb = rawgen.raw_blocks(spark, N_BLOCKS)
    rt = rawgen.raw_native_transfers(spark, N_TRANSFERS, N_BLOCKS)
    t = abstract.build_all(rb, rt)
    return {k: v.cache() for k, v in t.items()}


def test_parity_suite_all_green(tables):
    results = checks.run_parity_suite(tables)
    for name, res in results.items():
        bad = res.verdicts.filter(~F.col("passed")).collect()
        assert not bad, f"{name}: {bad}"


def test_transfer_sids_unique_and_shaped(tables):
    tt = tables["abstract_token_transfer"]
    assert tt.count() == tt.select("transfer_sid").distinct().count()
    assert tt.filter(~F.col("transfer_sid").rlike(r"^1_0x[0-9a-f]{64}_\d+$")).count() == 0


def test_amount_digits_match_python_int(spark, tables):
    rt = rawgen.raw_native_transfers(spark, 500, 50)
    got = rt.select(
        "value_binary", amounts.hex_to_digits(F.col("value_binary")).alias("d")
    ).collect()
    big = 0
    for r in got:
        assert r.d == str(int(r.value_binary, 16))
        if int(r.d) > 2**64:
            big += 1
    assert big > 0  # uint256-class values exercised, not just int64-sized


def test_amount_dec38_and_overflow_flag(spark):
    df = spark.createDataFrame(
        [("0x" + "0" * 62 + "ff",),   # 255
         ("0x" + "f" * 64,)],          # uint256 max: 78 digits → overflow
        "value_binary string",
    )
    out = df.select(*amounts.amount_columns(F.col("value_binary"))).collect()
    by_digits = {r.amount_digits: r for r in out}
    assert by_digits["255"].amount_dec38 == 255
    assert not by_digits["255"].amount_overflow
    umax = str(2**256 - 1)
    assert by_digits[umax].amount_dec38 is None
    assert by_digits[umax].amount_overflow


def test_validators_drop_malformed_rows(spark):
    rt = rawgen.raw_native_transfers(
        spark, 1000, 50, bad_address_every=10
    )
    cleaned = abstract.clean_native_transfers(rt)
    # every 10th row had a malformed from_address → dropped, others kept
    assert cleaned.count() == 1000 - 100
    assert cleaned.filter(~F.col("from_address").rlike("^0x[0-9a-f]{40}$")).count() == 0


def test_zero_amount_filtered_at_build(spark):
    rt = rawgen.raw_native_transfers(
        spark, 1000, 50, zero_amount_every=10, big_amount_every=0
    )
    tt = abstract.build_abstract_token_transfer(
        abstract.clean_native_transfers(rt)
    )
    assert tt.filter(F.col("amount") == "0").count() == 0


def test_corrupted_abstract_rows_surface_as_violations(spark, tables):
    tt = tables["abstract_token_transfer"]
    # dangle 5 spender FKs and blank 3 amounts
    corrupted = tt.withColumn(
        "spender_address_sid",
        F.when(F.col("transfer_index") == 2, F.lit("1_0xdeadbeef")).otherwise(
            F.col("spender_address_sid")
        ),
    )
    spec = checks.parity_specs()["abstract_token_transfer"]
    from anomaly_detector_faironchain_spark.plans.compiler import validate_table
    res = validate_table(
        corrupted, spec,
        refs={"abstract_transaction": tables["abstract_transaction"],
              "abstract_account": tables["abstract_account"]},
    )
    fk_fail = res.verdicts.filter(
        (F.col("check_id") == "fk(spender_address_sid)->abstract_account(account_sid)")
        & ~F.col("passed")
    ).collect()
    assert fk_fail and fk_fail[0].n_violations == corrupted.filter(
        F.col("spender_address_sid") == "1_0xdeadbeef"
    ).count()


def test_wei_to_eth_formatting(spark):
    df = spark.createDataFrame([(1_500_000_000_000_000_000,)], "wei long")
    out = df.select(amounts.wei_to_eth(F.col("wei")).alias("eth")).collect()[0]
    assert out.eth == "1.500000"
