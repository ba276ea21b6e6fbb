"""Split/routing operator properties beyond the oracle counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.plans.routing import EVENT_TYPES, split_events

from conftest import SF_DIR


def test_split_partitions_input(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    branches, dirty = split_events(ev)
    assert set(branches) == set(EVENT_TYPES)
    total = sum(b.count() for b in branches.values()) + dirty.count()
    assert total == ev.count()


def test_split_dirty_side_output(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(20)
    broken = ev.withColumn(
        "props",
        F.when(F.col("event_id") % 2 == 0, F.lit("{not json")).otherwise(
            F.col("props")
        ),
    )
    branches, dirty = split_events(broken)
    assert dirty.count() == broken.filter(F.col("event_id") % 2 == 0).count()
    clean_total = sum(b.count() for b in branches.values())
    assert clean_total == broken.count() - dirty.count()
    # dirty rows keep the raw payload for inspection (P1 contract)
    assert "props" in dirty.columns
