"""Real-database tests for the JDBC surfaces (S5 source, K4 sink).

Derby embedded ships inside the Spark distribution (derby*.jar on the
classpath) and runs in-process — no server, no extra deps — so the
JDBC code paths run for real here: schema round-trip, partitioned
parallel reads with min/max bounds, and the streaming foreachBatch
JDBC append. Swapping Derby for MySQL/ClickHouse changes only the url
and driver options.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.sources import jdbc_dim, load
from flink_spark.streaming import replay_events
from flink_spark.streaming.sinks import foreach_batch_sink

from conftest import SF_DIR


def _url(tmp_path, name):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_dim_partitioned_read_and_broadcast_join(spark, tmp_path):
    """S5: write the nation dim into Derby, snapshot it back through
    jdbc_dim with a partitioned read, broadcast-join it to customers —
    results must equal the pure-parquet computation."""
    url = _url(tmp_path, "dimdb")
    nation = load(spark, SF_DIR, "nation")
    nation.write.format("jdbc").option("url", url).option(
        "dbtable", "nation_dim"
    ).mode("overwrite").save()

    dim = jdbc_dim(
        spark, url, "nation_dim", partition_column="n_nationkey", num_partitions=4
    )
    assert dim.rdd.getNumPartitions() == 4  # the read actually parallelized
    cust = load(spark, SF_DIR, "customer")

    def rollup(d):
        return sorted(
            tuple(r)
            for r in cust.join(F.broadcast(d), cust.c_nationkey == d.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("ct"))
            .collect()
        )

    assert rollup(dim.select("n_nationkey", "n_name")) == rollup(
        nation.select("n_nationkey", "n_name")
    )


def test_jdbc_foreach_batch_sink_appends(spark, tmp_path):
    """K4: stream the events fixture through foreach_batch_sink into a
    Derby table; the table must end up with every event exactly once."""
    url = _url(tmp_path, "sinkdb")
    sdf = replay_events(spark, SF_DIR, str(tmp_path / "replay"), slices=3)
    out = sdf.select("event_id", "user_id", "event_type")

    def writer(df, _epoch):
        df.write.format("jdbc").option("url", url).option(
            "dbtable", "events_sink"
        ).mode("append").save()

    q = (
        foreach_batch_sink(out, writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "events_sink").load()
    )
    ev = load(spark, SF_DIR, "events")
    assert back.count() == ev.count()
    assert back.select("event_id").distinct().count() == ev.count()
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(
        tuple(r) for r in ev.select("event_id", "user_id", "event_type").collect()
    )
    assert got == want
