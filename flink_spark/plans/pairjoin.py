"""Skew-guarded bucket self-join — shared by every banded near-dup op.

All four near-dup families (MinHash, SimHash, n-gram Jaccard,
embedding SRP) generate candidate pairs with the same shape: rows
tagged with bucket keys, self-joined within buckets. On the synthetic
fixtures bucket sizes are benign; on a real (Zipfian) corpus one hot
bucket — a boilerplate page duplicated a million times, a dense
semantic cluster — turns the within-bucket join quadratic ON A SINGLE
TASK, the classic straggler that stalls a 1000-executor job at 99%.

The guard is grid (triangle) partitioning, the standard skew-join
blocking scheme (Okcan & Riedewald, SIGMOD'11 theta-joins): a bucket
of m rows with m > cap is split into g = ⌈m/cap⌉ deterministic
sub-groups by id hash, and the within-bucket pair set is generated as
the union of the g·(g+1)/2 sub-group grid cells — cell (i, j) joins
sub-group i against sub-group j. Every within-bucket pair lands in
EXACTLY one cell, so the output pair set (and per-key multiplicity)
is bit-identical to the naive self-join — the DuckDB oracles need no
change — while no single join task exceeds ~cap² comparisons and the
replication cost is g+1 copies of each oversized bucket's rows. Small
buckets keep g = 1 and pay nothing.

A cheap pre-probe (one scalar action over the persisted bucket table)
skips the grid entirely when no bucket exceeds the cap — the common,
well-behaved-corpus case stays the plain join.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_spark.registry import track_persist

# Per-bucket row cap before grid-splitting. 4096 rows ⇒ ≤ ~8.4M
# candidate comparisons per task — minutes of work, not hours; the
# env knob narrows it for tests (or widens it for fat executors).
MAX_BUCKET = int(os.environ.get("FLINK_SPARK_MAX_BUCKET", "4096"))


def pair_self_join(
    rows: DataFrame,
    id_col: str,
    key_cols: Sequence[str],
    payload: Sequence[str] = (),
    cap: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """All within-bucket pairs (d1 < d2) with bounded per-task size.

    ``rows`` carries ``id_col``, the bucket ``key_cols``, and optional
    ``payload`` columns. Output: one row per (bucket, pair)
    co-occurrence — the caller dedups across buckets (``.distinct()``)
    or aggregates multiplicities, exactly as with a plain self-join —
    with columns ``d1``, ``d2`` and ``{p}1``/``{p}2`` for each payload
    column, payloads swapped in lockstep with the id ordering.

    ``persist=False`` skips the internal ``track_persist`` when the
    caller already persisted ``rows`` (it is scanned up to 3 times:
    the size probe and both join sides).
    """
    cap = cap or MAX_BUCKET
    keys = list(key_cols)
    if persist:
        # lazy barrier (r15): the size probe right below is a full scan
        # and the FIRST action on this frame, so it materializes the
        # checkpoint inside its own job — the dedicated eager job was
        # pure fixed cost (one job per banded query). A LIMIT-cut probe
        # leaves missing partitions to doCheckpoint's automatic fill.
        rows = track_persist(rows, eager=False)
    counts = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("_m"))

    def side(suffix: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"_id{suffix}")] + [
            F.col(p).alias(f"{p}{suffix}") for p in payload
        ]
        return rows.select(*keys, *cols)

    if counts.filter(F.col("_m") > cap).limit(1).count() == 0:
        # no oversized bucket — the plain join IS the efficient plan
        joined = side("1").join(side("2"), keys).filter(
            F.col("_id1") < F.col("_id2")
        )
        return joined.select(
            F.col("_id1").alias("d1"), F.col("_id2").alias("d2"),
            *[c for p in payload for c in (f"{p}1", f"{p}2")],
        )

    # grid path: g sub-groups per oversized bucket; a row in sub-group
    # s is the LEFT side of cells (s, j) for j ≥ s and the RIGHT side
    # of cells (i, s) for i ≤ s, so cell (i, j) holds exactly the
    # sub-group-i × sub-group-j pairs.
    g = counts.select(
        *keys, F.ceil(F.col("_m") / cap).cast("int").alias("_g")
    )
    tagged = rows.join(g, keys).withColumn(
        "_sub", F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
    )

    def grid_side(suffix: str, cell_expr) -> DataFrame:
        cols = [F.col(id_col).alias(f"_id{suffix}")] + [
            F.col(p).alias(f"{p}{suffix}") for p in payload
        ]
        return tagged.withColumn("_cell", cell_expr).select(
            *keys,
            F.col("_cell._i").alias("_i"), F.col("_cell._j").alias("_j"),
            *cols,
        )

    left = grid_side(
        "1",
        F.explode(
            F.transform(
                F.sequence(F.col("_sub"), F.col("_g") - F.lit(1)),
                lambda j: F.struct(F.col("_sub").alias("_i"), j.alias("_j")),
            )
        ),
    )
    right = grid_side(
        "2",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("_sub")),
                lambda i: F.struct(i.alias("_i"), F.col("_sub").alias("_j")),
            )
        ),
    )
    joined = left.join(right, keys + ["_i", "_j"])
    # diagonal cells (i == j) hold both orientations of a pair — keep
    # the ordered one; off-diagonal cells hold each pair once in a
    # fixed (sub-group) orientation — normalize ids, swapping payloads
    # in lockstep
    joined = joined.filter(
        (F.col("_i") < F.col("_j")) | (F.col("_id1") < F.col("_id2"))
    )
    swap = F.col("_id1") > F.col("_id2")

    def ordered(a: str, b: str, take_min: bool):
        fwd, rev = (a, b) if take_min else (b, a)
        return F.when(swap, F.col(rev)).otherwise(F.col(fwd))

    return joined.select(
        ordered("_id1", "_id2", True).alias("d1"),
        ordered("_id1", "_id2", False).alias("d2"),
        *[
            ordered(f"{p}1", f"{p}2", take_min).alias(f"{p}{n}")
            for p in payload
            for n, take_min in (("1", True), ("2", False))
        ],
    )
