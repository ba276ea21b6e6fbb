"""Sinks + config-driven routing (SURVEY.md §2.2 K1-K6, §2.4 J6, §2.3 P7).

The reference writes to Kafka (append + upsert/changelog), ClickHouse
over JDBC, and a dynamically-routed Phoenix dim store. The Spark
shapes:

- K1/K2 Kafka append     → ``kafka_payload`` projection + kafka format
- K3 upsert-kafka        → ``upsert_sink``: foreachBatch latest-row
  merge into a keyed table (the reference itself reconciles changelog
  duplicates downstream by taking the max-ts row — SURVEY.md O10 — so
  final-table semantics are identical)
- K4 JDBC batch sink     → ``foreach_batch_sink`` with a jdbc writer
- K5 routed dim sink     → ``routed_dim_sink``: per-batch fan-out to
  per-table parquet dirs, column-pruned by a config table (J6/P7/F3/
  W10 — the broadcast-state pattern becomes a per-batch config join)
- K6 console             → ``console_sink``
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kafka_payload(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
    """K1/K2 — project rows into the Kafka (key, value-JSON) contract.

    (rt/utils/MyKafkaUtil.java:52-76). Attach
    ``.writeStream.format('kafka').option('kafka.bootstrap.servers',…)``
    on a cluster; the projection is testable without a broker.
    """
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*value_cols)).alias("value"),
    )


def console_sink(sdf: DataFrame, rows: int = 20):
    """K6 — debug print sink (the reference's ``.print(\">>>\")``)."""
    return (
        sdf.writeStream.format("console")
        .option("numRows", rows)
        .outputMode("append")
    )


def foreach_batch_sink(
    sdf: DataFrame, writer: Callable[[DataFrame, int], None]
):
    """K4 — micro-batch writer harness (MyClickHouseUtil.java:19-62).

    The reference batches 5 rows / 1000 ms into ClickHouse JDBC; in
    Spark the micro-batch *is* the unit, so ``writer`` receives whole
    batches (e.g. ``lambda df, _: df.write.jdbc(url, table, 'append')``).
    No reflection over bean fields — the DataFrame carries its schema.
    """
    return sdf.writeStream.foreachBatch(writer).outputMode("update")


def upsert_sink(
    sdf: DataFrame,
    path: str,
    keys: list[str],
    order_cols: list[str],
):
    """K3 — changelog/upsert table emulation via latest-row merge.

    (MyKafkaUtil.java:78-86 upsert-kafka DDL). Each micro-batch merges
    into a parquet table keeping, per key, the row with the greatest
    ``order_cols``. Flink emits retraction pairs that upsert-kafka
    compacts; Spark reaches the same *final table* by merging — the
    property the reference's own downstream relies on (O10/A5).

    At scale the same merge is one ``MERGE INTO`` on a Delta/Iceberg
    table; plain parquet read-merge-rewrite keeps this dependency-free.
    """
    spark = sdf.sparkSession

    def merge(batch: DataFrame, _epoch: int) -> None:
        try:
            current = spark.read.parquet(path)
            allrows = current.unionByName(batch)
        except Exception:
            allrows = batch
        w = Window.partitionBy(*keys).orderBy(
            *[F.desc(c) for c in order_cols]
        )
        latest = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # materialize before overwriting the dir we just read
        latest.cache().count()
        latest.write.mode("overwrite").parquet(path)
        latest.unpersist()

    return sdf.writeStream.foreachBatch(merge).outputMode("update")


def partitioned_table_sink(
    sdf: DataFrame,
    path: str,
    partition_cols: list[str],
):
    """DWS at-rest layout: append micro-batches date/key-partitioned.

    The reference lands every DWS aggregate in ClickHouse MergeTree
    keyed by window start (rt/utils/MyClickHouseUtil.java:19-62); the
    lake-native shape is parquet partitioned by coarse time (and
    optionally a hot dimension), so the ADS layer's
    ``toYYYYMMDD(stt)=#{date}`` predicates become partition pruning —
    a scan touches only the queried day's files at any corpus size.
    """

    def write(batch: DataFrame, _epoch: int) -> None:
        (
            batch.write.mode("append")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    return sdf.writeStream.foreachBatch(write).outputMode("append")


def routed_dim_sink(
    sdf: DataFrame,
    rules: dict[str, tuple[str, list[str]]],
    base_path: str,
):
    """K5 + J6/P7/F3/W10 — config-driven routed writes.

    ``rules`` maps a source key (the reference's ``table`` envelope
    field / our ``event_type``) to ``(sink_table, keep_columns)``.
    Each micro-batch fans out: rows are filtered per rule, pruned to
    the configured columns (TableProcessFunction.java:148-165), and
    appended to ``base_path/<sink_table>``.

    The reference broadcasts the rule stream as MapState
    (DimApp.java:85-92); in micro-batch Spark the rules dict is simply
    re-read per batch — pass a callable-refreshed dict for live config.
    One source scan per batch serves every route (cached), matching
    BaseLogApp's single-pass 5-way split (P5).
    """

    def route(batch: DataFrame, _epoch: int) -> None:
        batch = batch.cache()
        try:
            for src, (sink_table, cols) in rules.items():
                (
                    batch.filter(F.col("event_type") == src)
                    .select(*cols)
                    .write.mode("append")
                    .parquet(f"{base_path}/{sink_table}")
                )
        finally:
            batch.unpersist()

    return sdf.writeStream.foreachBatch(route).outputMode("append")
