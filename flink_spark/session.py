"""SparkSession factory.

The reference pins every job to parallelism=1
(``rt/app/dim/DimApp.java:31``); we instead rely on Spark's data
parallelism and size shuffle partitions to the machine. All date math
in the reference is fixed-zone (``rt/utils/DateFormatUtil.java:24``);
we pin the session timezone (UTC here, matching the DuckDB oracle) so
date bucketing is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to (re)apply on an existing session at runtime.
# The correctness driver hands us *its* SparkSession, so everything the
# query catalog depends on must be runtime-settable and applied lazily.
_RUNTIME_CONFS = {
    # deterministic date/window bucketing, matches DuckDB's naive timestamps
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries timestamp[us] with no UTC flag; Spark 4 would
    # infer TIMESTAMP_NTZ, which unix_millis/watermarks reject. With the
    # session TZ pinned UTC, reading it as plain TIMESTAMP matches DuckDB's
    # epoch_ms exactly. load() also normalizes defensively (belt-and-braces
    # for sessions we didn't configure).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # older fixture generations carried TIMESTAMP(NANOS); harmless now,
    # load() handles the bigint-ns form if it ever reappears
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # runtime re-planning: coalesce tiny shuffle partitions, split skewed ones
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Trust sortBy order on bucketed scans (SPARK-28632 turned this off
    # because a multi-file bucket is only piecewise-sorted). Every
    # bucketed writer in this repo (sources.bucketed.write_bucketed and
    # the streaming survivor-store compaction in streaming.dedup)
    # repartitions by the bucket key first, so each bucket is ONE file —
    # exactly the regime where the order is sound. Without it every
    # per-micro-batch SortMergeJoin re-sorts the STORE side, costing
    # O(store log store) CPU per batch — the thing sortBy paid for at
    # write time.
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # The parquet timestamp confs are load-bearing (events.ts
            # arrives as NTZ or bigint-ns without them); failing to set
            # one must surface rather than become an obscure downstream
            # type error. load() still normalizes as a second line.
            if k in (
                "spark.sql.parquet.inferTimestampNTZ.enabled",
                "spark.sql.legacy.parquet.nanosAsLong",
            ):
                raise
    return spark


# Streaming-at-scale confs: RocksDB state store keeps keyed state
# (dedup maps, join buffers, window partials) off-heap and spillable —
# the Spark analog of Flink's RocksDB state backend the reference
# left commented out (rt/app/dwd/log/BaseLogApp.java:32-44). Applied
# only when a session is built with ``streaming_scale=True``; the
# default HDFS-backed store is fine at test scale.
STREAMING_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


# Static confs: only effective for the process that CREATES the JVM
# (the bench, scripts, tests); the correctness driver hands us its own
# session, where these silently keep Spark's defaults.
_STATIC_CONFS = {
    # The whole-stage-codegen class cache holds 100 entries by default.
    # A session that runs the 89-query bench generates far more than
    # 100 codegen units, so the cache thrashes and EVERY pass re-pays
    # Janino compilation — jstack during warm-repeated passes showed a
    # compiler thread at ~40% of a core and live Janino frames
    # (OPTIMIZATION_r14.md). 5000 entries make the bench's warm-pass
    # contract real (timed passes measure data processing, not
    # compilation) for ~tens of MB of class metadata; a long-running
    # production app with a wide plan repertoire wants the same.
    "spark.sql.codegen.cache.maxEntries": "5000",
}


def get_spark(
    app_name: str = "flink_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    streaming_scale: bool = False,
    local_dir: str | None = None,
) -> SparkSession:
    """Create (or fetch) a local SparkSession sized for this machine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) else 4.
    On a real cluster the same confs apply; only ``master`` changes.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "4")
    # Default: one shuffle partition per core, AQE coalescing/skew-split
    # on top. Measured r15 (sf0.1, local[32], 7-query mix): initial 200
    # partitions cost +24% and 64 cost +5% vs =cpus even with AQE
    # coalescing — the extra map-side blocks and AQE stage stats are
    # pure overhead at this input size. A cluster run sizes partitions
    # to data (guide §2.2: 100 MB-1 GB each) via the env override or
    # the explicit parameter.
    shuffle_partitions = (shuffle_partitions
                          or os.environ.get("FLINK_SPARK_SHUFFLE_PARTITIONS")
                          or cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if local_dir:
        # caller-owned shuffle/spill scratch (bench uses a per-PID dir
        # so its stale-sweep can never hit another session's blocks).
        # Static conf: only effective for the process that creates the
        # JVM, which is exactly the bench/one-shot-script use case.
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in _STATIC_CONFS.items():
        builder = builder.config(k, v)
    if streaming_scale:
        for k, v in STREAMING_CONFS.items():
            builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())
    if streaming_scale:
        # getOrCreate() silently ignores builder confs when a session
        # already exists; the state-store confs are runtime-settable
        # SQL confs (read at streaming-query start), so apply them on
        # the live session too.
        for k, v in STREAMING_CONFS.items():
            spark.conf.set(k, v)
    return spark
