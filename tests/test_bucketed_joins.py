"""Bucketed-table co-location: the pay-the-shuffle-once-at-ingest path.

Asserts the property that matters at 100 TB: an equi-join and a
referential anti-join between two tables bucketed on the join key
compile with ZERO Exchange operators — the per-run shuffle of both
sides is gone, replaced by a one-time bucketed write."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.sources import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # session warehouse dir is fixed at startup; unique table names keep
    # reruns and parallel modules from colliding
    suffix = uuid.uuid4().hex[:8]
    fact_name, dim_name = f"fact_{suffix}", f"dim_{suffix}"
    fact = spark.range(50000).select(
        (F.col("id") % 4000).alias("k"), (F.col("id") * 2).alias("v")
    )
    dim = spark.range(3000).select(
        F.col("id").alias("k"), F.lit("d").alias("name")
    )
    write_bucketed(fact, fact_name, "k", 8)
    write_bucketed(dim, dim_name, "k", 8)
    yield fact_name, dim_name
    spark.sql(f"DROP TABLE IF EXISTS {fact_name}")
    spark.sql(f"DROP TABLE IF EXISTS {dim_name}")


@pytest.fixture()
def no_broadcast(spark):
    """Force the join path that would otherwise shuffle both sides;
    restore the session's broadcast threshold afterwards so other test
    modules sharing the session keep their broadcast plans."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_equi_join_has_no_exchange(spark, bucketed_pair,
                                            no_broadcast):
    fact_name, dim_name = bucketed_pair
    j = spark.table(fact_name).join(spark.table(dim_name), "k")
    assert "Exchange" not in _plan(j)
    # fact: keys 0..1999 appear 13x, 2000..3999 appear 12x; dim keys 0..2999
    assert j.count() == 2000 * 13 + 1000 * 12


def test_bucketed_anti_join_has_no_exchange(spark, bucketed_pair,
                                            no_broadcast):
    fact_name, dim_name = bucketed_pair
    orphans = spark.table(fact_name).join(
        spark.table(dim_name), "k", "left_anti"
    )
    assert "Exchange" not in _plan(orphans)
    # fact keys 0..3999, dim keys 0..2999 -> 1000 orphan keys
    assert orphans.select("k").distinct().count() == 1000


def test_bucketed_join_values_match_unbucketed(spark, bucketed_pair,
                                               no_broadcast):
    fact_name, dim_name = bucketed_pair
    fact, dim = spark.table(fact_name), spark.table(dim_name)
    bucketed = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).collect()[0]
    plain = (
        fact.repartition(7)  # discard bucketing distribution info
        .join(dim.repartition(7), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()[0]
    )
    assert (bucketed["n"], bucketed["sv"]) == (plain["n"], plain["sv"])
