"""Streaming sources (SURVEY.md §2.1 S1-S4, S6).

The reference consumes Kafka JSON topics
(rt/utils/MyKafkaUtil.java:23-98) and a MySQL-CDC config stream
(rt/app/dim/DimApp.java:69-82). The builders here produce the same
shapes; for tests (no broker in this environment) ``replay_events``
re-plays the at-rest ``events`` fixture as a time-ordered file stream —
the standard stream-batch equivalence harness.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_spark.sources import load


def replay_events(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    slices: int = 5,
    sentinel_users: tuple[int, ...] = (),
    sentinel_delay_s: int = 60,
) -> DataFrame:
    """Replay the events fixture as a time-ordered file stream.

    Splits events into ``slices`` parquet files in (ts, event_id)
    order and returns a ``readStream`` over them with
    ``maxFilesPerTrigger=1`` — each file becomes one micro-batch, so
    keyed state sees data arriving in event-time order, like the Kafka
    source it stands in for. Test harness only (the global sort +
    toPandas is fine at fixture scale and never ships to a cluster).

    ``sentinel_users`` appends one far-future flush event per listed
    user (event_id < 0) in a final slice — these advance the watermark
    and close out per-key CEP/session state; consumers must drop rows
    with ``event_id < 0``.
    """
    ev = load(spark, sf_dir, "events")
    n = ev.count()
    if n > 2_000_000:  # driver-side sort+toPandas below — fixtures only
        raise ValueError(
            f"replay_events is a test harness: {n} rows would be "
            "collected on the driver; use a real Kafka/file stream "
            "for anything beyond fixture scale"
        )
    pdf = ev.orderBy("ts", "event_id").toPandas()
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):  # a leftover sentinel slice would replay
        if stale.endswith(".parquet"):
            os.remove(os.path.join(out_dir, stale))
    per = math.ceil(len(pdf) / slices)
    for i in range(slices):
        part = pdf.iloc[i * per:(i + 1) * per]
        if len(part):
            part.to_parquet(f"{out_dir}/{i:04d}.parquet", index=False,
                            coerce_timestamps="us")
    if sentinel_users:
        import pandas as pd

        flush_ts = pdf["ts"].max() + pd.Timedelta(seconds=sentinel_delay_s)
        sent = pd.DataFrame(
            {
                "event_id": [-1 - u for u in sentinel_users],
                "ts": [flush_ts] * len(sentinel_users),
                "user_id": list(sentinel_users),
                "event_type": ["__flush__"] * len(sentinel_users),
                "value": [0.0] * len(sentinel_users),
                "props": ["{}"] * len(sentinel_users),
            }
        )[list(pdf.columns)]
        sent.to_parquet(f"{out_dir}/{slices:04d}.parquet", index=False,
                        coerce_timestamps="us")
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )


def kafka_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 — raw Kafka value stream (rt/utils/MyKafkaUtil.java:23-50).

    The reference's consumer is null-tolerant (returns null on bad
    records); Kafka's value arrives as nullable binary here, so that
    behavior is native. Requires a broker — cluster use only.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_json_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    schema: T.StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S2 — DDL-style JSON table over a topic (MyKafkaUtil.java:58-67).

    ``from_json`` yields null structs on malformed rows — the P1
    tolerant-parse contract; route nulls to a dirty side output with
    ``split_dirty`` from ``flink_spark.plans.routing``.
    """
    raw = kafka_source(spark, servers, topic, starting_offsets)
    return raw.select(F.from_json("value", schema).alias("j")).select("j.*")


def cdc_envelope_schema() -> T.StructType:
    """S3 — the Maxwell/Debezium CDC envelope (MyKafkaUtil.java:88-98).

    All source-table columns ride in string→string maps (``data``,
    ``old``); each consumer projects and casts on read (P2).
    """
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("data", T.MapType(T.StringType(), T.StringType())),
            T.StructField("old", T.MapType(T.StringType(), T.StringType())),
            T.StructField("ts", T.LongType()),
        ]
    )


def cdc_envelope_source(
    spark: SparkSession, servers: str, topic: str = "topic_db"
) -> DataFrame:
    """S3/S4 — CDC envelope stream with processing time (``pt``)."""
    return kafka_json_source(
        spark, servers, topic, cdc_envelope_schema(), "earliest"
    ).withColumn("pt", F.current_timestamp())


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S6 — line stream for manual demos (rt-test Flink01:23,36)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


# S4's capture half lives with the batch sources (it polls JDBC and
# owns snapshot state) but IS a streaming source: re-exported here so
# the parity map lists it beside the envelope consumers it feeds.
from flink_spark.sources.cdc import JdbcCdcCapture  # noqa: E402,F401
