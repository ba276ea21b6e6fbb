"""Bucketed tables: the write-once shuffle, joined shuffle-free after.

Pins the property that makes bucketing worth its write cost at 100 TB:
a join of two tables bucketed on the join key with the SAME bucket
count compiles to a SortMergeJoin with NO Exchange on either side
(and, with sorted buckets, no per-query Sort either), while a
mismatched bucket count silently degrades to a full shuffle — the
foot-gun the helper's docstring warns about, demonstrated here.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_spark.sources import load
from flink_spark.sources.bucketed import bucketed_join, write_bucketed

from conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem_mismatch", "o_orderkey", 4)
    yield
    for t in ("b_orders", "b_lineitem", "b_lineitem_mismatch"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    """Fixture tables are broadcast-small; disable auto-broadcast so the
    plan shows what bucketing buys when BOTH sides are fact-scale."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, old)


@pytest.fixture()
def sorted_bucket_scan(spark):
    """Spark ≥3 ignores sortBy order at scan time by default
    (SPARK-28632: a multi-file bucket is only piecewise-sorted, so
    trusting it was unsafe). write_bucketed writes ONE file per bucket,
    which is exactly the regime where the legacy conf is sound — and
    the sort-free merge it buys is the point of sortBy."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    yield
    spark.conf.set(key, old)


def test_bucketed_join_is_shuffle_free(
    spark, bucketed_tables, no_broadcast, sorted_bucket_scan
):
    df = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = _plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # sorted single-file buckets: the merge join needs no per-query
    # Sort node either (Spark only trusts one-file buckets' order)
    import re

    assert not re.findall(r"\(\d+\) Sort\b(?!MergeJoin)", plan), plan
    # and the result matches the plain (shuffled) join
    plain = load(spark, SF_DIR, "orders").select("o_orderkey").join(
        load(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ).select("o_orderkey"),
        "o_orderkey",
    )
    assert df.count() == plain.count()


def test_mismatched_bucket_counts_shuffle(spark, bucketed_tables, no_broadcast):
    """4-bucket vs 8-bucket: Spark must re-shuffle at least one side —
    the silent fallback the helper's contract warns against."""
    df = bucketed_join(spark, "b_orders", "b_lineitem_mismatch", "o_orderkey")
    assert "Exchange" in _plan(df)


def test_bucketed_groupby_needs_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also rides the at-rest clustering."""
    from pyspark.sql import functions as F

    df = spark.table("b_lineitem").groupBy("o_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    assert "Exchange" not in _plan(df)
