"""Real-broker Kafka round-trip (S1/K1/K3) — infrastructure-gated.

The payload logic (``kafka_payload`` projection, JSON envelope parse,
upsert merge) is covered broker-free elsewhere via file-stream
emulation; THIS module exercises the actual Kafka wire path
(reference surface ``rt/utils/MyKafkaUtil.java:23-56``):
produce → topic → consume → upsert → committed table.

Gated on ``FLINK_SPARK_KAFKA_BOOTSTRAP`` (e.g. ``localhost:9092``)
pointing at a reachable broker, plus the ``spark-sql-kafka`` package
on the session classpath (ship it via ``spark.jars.packages``:
``org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``).
Skips cleanly — with the reason — when either is absent, so the suite
stays green in broker-less sandboxes and goes live unchanged on a
machine with Kafka (docker, testcontainers, or a real cluster).
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR

BOOTSTRAP = os.environ.get("FLINK_SPARK_KAFKA_BOOTSTRAP", "")


def _broker_reachable() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _kafka_classes_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="FLINK_SPARK_KAFKA_BOOTSTRAP not set (no broker)"
)


def test_kafka_produce_upsert_consume_roundtrip(spark, tmp_path):
    """K1 produce → S1/S2 consume → K3 upsert: the committed table
    after a full produce/consume cycle equals the latest-row-per-key
    batch truth over the produced events."""
    if not _broker_reachable():
        pytest.skip(f"broker {BOOTSTRAP!r} not reachable")
    if not _kafka_classes_present(spark):
        pytest.skip("spark-sql-kafka classes absent from the classpath")

    from flink_spark.sources import load
    from flink_spark.streaming import kafka_payload, read_upsert_table, upsert_sink
    from flink_spark.streaming.sources import kafka_json_source

    topic = f"flink_spark_rt_{uuid.uuid4().hex[:8]}"
    ev = load(spark, SF_DIR, "events").limit(2000)

    # K1: batch-produce the events as key/value JSON records
    payload = kafka_payload(
        ev.withColumn("ts", F.col("ts").cast("string")),
        key_col="user_id",
        value_cols=[c for c in ev.columns],
    )
    (payload.write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic).save())

    # S2: consume the topic from the beginning, parse the envelope
    schema = ev.withColumn("ts", F.col("ts").cast("string")).schema
    sdf = kafka_json_source(
        spark, BOOTSTRAP, topic, schema, starting_offsets="earliest"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # K3: upsert into a committed table, availableNow drains the topic
    table = str(tmp_path / "upsert")
    q = (
        upsert_sink(sdf, table, keys=["user_id"],
                    order_cols=["ts", "event_id"])
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    got = read_upsert_table(spark, table).select(*ev.columns)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.select(*ev.columns).collect()))
