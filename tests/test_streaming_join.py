"""W7 (watermark-bounded stream-stream join) and W9 (checkpoint/restart)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_spark.registry import all_queries
from flink_spark.sources import load
from flink_spark.streaming import (
    interval_join_stream,
    left_outer_interval_join_stream,
    replay_events,
    run_to_memory,
)
from flink_spark.streaming.sinks import read_upsert_table, upsert_sink

from conftest import SF_DIR

_Q = all_queries()


def test_stream_stream_interval_join(spark, tmp_path):
    replay_dir = str(tmp_path / "replay")
    sdf1 = replay_events(spark, SF_DIR, replay_dir, slices=5)
    p = sdf1.filter(F.col("event_type") == "purchase")
    c = sdf1.filter(F.col("event_type") == "click")
    out = run_to_memory(interval_join_stream(p, c), "sj_mem")
    got = out.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("pair_ct"),
        F.countDistinct("p_event").alias("purchases_with_click"),
    )
    batch = _Q["j_interval_join"].fn(spark, SF_DIR)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_left_outer_join_changelog(spark, tmp_path):
    """J2→K3→A5 composed: watermarked stream-stream LEFT OUTER join
    (matched rows early, null-padded rows at watermark) merged through
    the upsert sink must equal the batch left-join final table.

    Two successive flush files close the stream: the first advances the
    watermark past every real event, the second's batch then evicts the
    remaining unmatched purchases as null-padded rows (watermark updates
    take effect one micro-batch later)."""
    import pandas as pd

    ev = load(spark, SF_DIR, "events")
    pdf = ev.orderBy("ts", "event_id").toPandas()
    per = math.ceil(len(pdf) / 4)
    replay_dir = tmp_path / "replay"
    _write_slices(
        pdf, replay_dir,
        [(i, pdf.iloc[i * per:(i + 1) * per]) for i in range(4)],
    )
    for i, delay in ((4, 60), (5, 120)):
        flush = pd.DataFrame(
            {
                "event_id": [-1], "user_id": [0],
                "ts": [pdf["ts"].max() + pd.Timedelta(seconds=delay)],
                "event_type": ["__flush__"], "value": [0.0], "props": ["{}"],
            }
        )[list(pdf.columns)]
        flush.to_parquet(
            str(replay_dir / f"{i:04d}.parquet"), index=False,
            coerce_timestamps="us",
        )
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay_dir))
    )
    joined = left_outer_interval_join_stream(sdf)
    table = str(tmp_path / "upsert")
    q = (
        upsert_sink(
            joined, table,
            keys=["p_event"], order_cols=["c_ts", "c_event"],
            output_mode="append",
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # sentinel rows (event_id < 0) are dropped on the merged table, not
    # inside the streaming plan (see left_outer_interval_join_stream)
    final = (
        read_upsert_table(spark, table)
        .filter(F.col("p_event") >= 0)
        .select(
            "p_event", "p_user", "c_event", F.unix_millis("c_ts").alias("c_ms")
        )
    )
    batch = _Q["j_left_outer_interval"].fn(spark, SF_DIR)
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))
    # both join paths must actually fire: matched and null-padded
    assert final.filter(F.col("c_event").isNull()).count() > 0
    assert final.filter(F.col("c_event").isNotNull()).count() > 0


def _write_slices(pdf, out_dir, idx):
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, part in idx:
        part.to_parquet(
            str(out_dir / f"{i:04d}.parquet"), index=False, coerce_timestamps="us"
        )


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """W9: stop after half the input, restart from the checkpoint, and
    the final upsert table must equal the batch truth (no dupes/gaps)."""
    ev = load(spark, SF_DIR, "events")
    pdf = ev.orderBy("ts", "event_id").toPandas()
    per = math.ceil(len(pdf) / 4)
    parts = [(i, pdf.iloc[i * per:(i + 1) * per]) for i in range(4)]
    replay_dir = tmp_path / "replay"
    table = str(tmp_path / "upsert")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay_dir))
        )
        q = (
            upsert_sink(sdf, table, keys=["user_id"], order_cols=["ts", "event_id"])
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_slices(pdf, replay_dir, parts[:2])
    run_once()  # first run: half the data
    mid = read_upsert_table(spark, table).count()
    _write_slices(pdf, replay_dir, parts)  # add the rest (files 0-1 unchanged)
    run_once()  # restart from checkpoint: must process only slices 2-3
    final = read_upsert_table(spark, table).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_millis("ts").alias("last_ms"),
    )
    batch = _Q["s_dedup_latest"].fn(spark, SF_DIR)
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))
    assert mid <= final.count()
