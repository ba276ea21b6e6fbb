"""K3 object-store form: Delta MERGE upsert — dispatch, guard, and
(where delta-spark is installed) the full round-trip."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_spark.streaming.sinks import (
    _latest_per_key,
    _newer_cond,
    delta_available,
    upsert_sink,
    upsert_sink_delta,
)

from conftest import SF_DIR


def test_newer_cond_lexicographic_semantics(spark):
    """The MERGE update guard must mean "strictly newer under
    (ts, event_id)" — verified by evaluating the generated SQL with
    plain Spark against hand-labeled pairs."""
    cond = _newer_cond(["ts", "event_id"])
    pairs = [
        # (t.ts, t.event_id, s.ts, s.event_id, source_is_newer)
        (1, 1, 2, 0, True),    # later ts wins regardless of id
        (2, 0, 1, 9, False),   # earlier ts loses regardless of id
        (1, 1, 1, 2, True),    # ts tie: higher id wins
        (1, 2, 1, 1, False),
        (1, 1, 1, 1, False),   # identical row: NOT newer (replay no-op)
    ]
    df = spark.createDataFrame(
        [(a, b, c, d) for a, b, c, d, _ in pairs],
        "t_ts long, t_event_id long, s_ts long, s_event_id long",
    )
    got = [
        r.newer
        for r in df.select(
            F.expr(
                cond.replace("t.", "t_").replace("s.", "s_")
            ).alias("newer")
        ).collect()
    ]
    assert got == [want for *_, want in pairs]


def test_latest_per_key_compaction(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, ts long, v string"
    )
    got = sorted(
        (r.k, r.v) for r in _latest_per_key(df, ["k"], ["ts"]).collect()
    )
    assert got == [(1, "b"), (2, "c")]


@pytest.mark.skipif(delta_available(), reason="delta installed: dispatch works")
def test_object_store_path_without_delta_raises(spark):
    sdf = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError, match="delta-spark"):
        upsert_sink(sdf, "s3://bucket/table", ["value"], ["timestamp"])


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_upsert_round_trip(spark, tmp_path):
    from flink_spark.streaming import replay_events

    table = str(tmp_path / "delta_upsert")
    sdf = replay_events(spark, SF_DIR, str(tmp_path / "replay"), slices=4)
    q = (
        upsert_sink_delta(sdf, table, keys=["user_id"], order_cols=["ts", "event_id"])
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.format("delta").load(table)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert got.count() == ev.select("user_id").distinct().count()
