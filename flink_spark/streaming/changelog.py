"""Retract-stream consumer — incremental downstream aggregation.

The reference's DWS layer consumes the DWD upsert-kafka topics as a
*changelog*: Flink's runtime applies each ``-U``/``+U`` pair as a
retract+add against downstream aggregates
(``DwsTradeSkuOrderWindow.java:81-111`` re-aggregates order-detail
amounts per sku from the upsert topic written by
``DwdTradeOrderPreProcess.java:153-188``). ``upsert_sink(...,
changelog=True)`` emits exactly those pairs (``sinks._emit_changelog``);
this module closes the loop on the consumer side:

- ``changelog_stream``: the per-epoch retraction-pair dirs as a
  Structured Streaming file source — a Kafka deployment swaps this for
  the upsert topic reader, nothing downstream changes;
- ``changelog_agg_stream``: maintains ADDITIVE aggregates (count + sums)
  per group incrementally. Each micro-batch reduces to signed deltas
  (+1 for ``+I``/``+U`` rows, −1 for ``-U``) with a map-side partial
  aggregation, then merges |touched groups| rows into a
  manifest-committed state table. The corpus is never rescanned — the
  per-batch cost is O(batch), the state table is O(|groups|); this is
  what makes a continuously-maintained 100 TB rollup affordable.

Exactly-once: the state manifest records the last applied foreachBatch
epoch. A replay of an already-applied epoch (crash between the state
commit and the checkpoint commit, or a fresh checkpoint re-delivering
old files) is skipped instead of double-applied — additive state is
NOT naturally idempotent, so the guard is load-bearing, unlike the
latest-row merge in ``upsert_sink`` where replays converge by
themselves.

Retractions are load-bearing too: a key whose latest row moves between
groups (a user whose newest event changes type) must decrement the old
group and increment the new one. An append-only consumer that ignored
``-U`` would double-count every such move — ``tests/test_streaming.py::
test_changelog_agg_retractions_are_load_bearing`` pins the difference.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.streaming.sinks import _CHANGELOG, read_changelog

_STATE_MANIFEST = "_STATE.json"


def changelog_stream(spark: SparkSession, table: str) -> DataFrame:
    """The upsert table's retraction pairs as a streaming source.

    File-stream over the ``_changelog/e{epoch}`` dirs (the base path
    names the underscore dir explicitly, so Spark's hidden-path filter
    does not apply to it; the epoch dirs and part files under it are
    plainly named). The schema is taken from the already-emitted pairs
    — at least one epoch must exist, which is the natural order of
    operations (the producer's ``availableNow`` run precedes the
    consumer's).
    """
    static = read_changelog(spark, table)
    if static is None:
        raise FileNotFoundError(
            f"no changelog under {table!r}; run upsert_sink(..., "
            "changelog=True) first so the stream has a schema to bind"
        )
    return (
        spark.readStream.schema(static.schema)
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(table, _CHANGELOG))
    )


def _read_state_meta(path: str) -> dict:
    try:
        with open(os.path.join(path, _STATE_MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _commit_state(path: str, version: str, epoch: int) -> None:
    """Atomic pointer swap, same protocol as ``sinks._commit_manifest``."""
    tmp = os.path.join(path, f".{_STATE_MANIFEST}.{epoch}.tmp")
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "version": version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _STATE_MANIFEST))


def read_agg_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Committed aggregate state (group cols + ``{c}_sum`` + ``row_ct``)."""
    meta = _read_state_meta(path)
    if not meta:
        return None
    return spark.read.parquet(os.path.join(path, meta["version"]))


def changelog_agg_stream(
    spark: SparkSession,
    table: str,
    group_cols: list[str],
    sum_cols: list[str],
    state_path: str,
    derive=None,
):
    """Continuously maintain per-group sums/counts over an upsert table.

    Returns a ``writeStream`` builder (attach checkpoint + trigger).
    State schema: ``group_cols`` + ``{c}_sum`` for each ``sum_cols``
    entry + ``row_ct`` (live rows of the upsert table in the group).
    Groups whose ``row_ct`` reaches 0 are dropped — the state table
    always equals ``read_upsert_table(...).groupBy(group_cols)`` of
    the producer's committed table (the stream≡batch invariant
    ``test_changelog_incremental_agg`` pins).

    ``derive`` (optional, ``DataFrame -> DataFrame``) runs on each
    batch before the delta aggregation, so group columns can be
    DERIVED from changelog columns — e.g. the reference's windowed
    DWS rollups group by (sku, 10 s bucket of the row time): pass
    ``lambda df: df.withColumn("win", F.window_time(...))`` (or a
    ``date_trunc``) and list the bucket in ``group_cols``. A retract
    and its replacement carry their own row values, so each lands in
    its own derived group and the signed fold stays exact.
    """
    sdf = changelog_stream(spark, table)

    def apply(batch: DataFrame, epoch: int) -> None:
        meta = _read_state_meta(state_path)
        if meta and epoch <= meta["epoch"]:
            return  # replayed epoch: already folded into the state
        if derive is not None:
            batch = derive(batch)
        sign = F.when(F.col("_op") == "-U", F.lit(-1)).otherwise(F.lit(1))
        deltas = (
            batch.withColumn("_sign", sign)
            .groupBy(*group_cols)
            .agg(
                F.sum("_sign").cast("long").alias("_d_ct"),
                *[
                    F.sum(F.col("_sign") * F.col(c)).alias(f"_d_{c}")
                    for c in sum_cols
                ],
            )
        )
        prev = read_agg_state(spark, state_path)
        if prev is not None:
            merged = prev.join(deltas, group_cols, "full_outer").select(
                *group_cols,
                *[
                    (
                        F.coalesce(f"{c}_sum", F.lit(0.0))
                        + F.coalesce(f"_d_{c}", F.lit(0.0))
                    ).alias(f"{c}_sum")
                    for c in sum_cols
                ],
                (
                    F.coalesce("row_ct", F.lit(0))
                    + F.coalesce("_d_ct", F.lit(0))
                ).cast("long").alias("row_ct"),
            )
        else:
            merged = deltas.select(
                *group_cols,
                *[F.col(f"_d_{c}").alias(f"{c}_sum") for c in sum_cols],
                F.col("_d_ct").alias("row_ct"),
            )
        merged = merged.filter(F.col("row_ct") > 0)
        os.makedirs(state_path, exist_ok=True)
        version = f"v{epoch}"
        dst = os.path.join(state_path, version)
        if os.path.isdir(dst):  # debris from a crashed identical epoch
            shutil.rmtree(dst)
        merged.write.parquet(dst)
        _commit_state(state_path, version, epoch)
        for name in os.listdir(state_path):  # GC superseded versions
            if name.startswith("v") and name != version:
                shutil.rmtree(
                    os.path.join(state_path, name), ignore_errors=True
                )

    return sdf.writeStream.foreachBatch(apply).outputMode("append")
