"""Bounded-partition grouped Top-N.

``ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...) <= k`` sorts
every row of a group in ONE task — fine when the group is known
bounded, a straggler when group size follows the data (users per hot
window, vocabulary per source). For small k there is a standard exact
decomposition: any split of a group's rows satisfies
``top_k(group) ⊆ ⋃ top_k(slice)``, so a partial top-k per input
partition (window partitions bounded by the scan partition size, no
matter how skewed the groups) followed by a final rank over the
≤ k·|partitions| survivors per group computes the identical result —
the map-side-combine idea applied to rank selection. The DuckDB
oracles keep the single-window ROW_NUMBER formulation, so every
oracle compare pins the two formulations against each other.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group Top-``k`` rows with a ``rank_col`` (1-based).

    Exactly ``row_number() OVER (PARTITION BY group ORDER BY order)``
    filtered to ``<= k`` — computed without ever sorting a whole
    group in one task. ``order_cols`` must define a TOTAL order
    (include a tiebreak) or the selected set is not deterministic;
    that requirement is the same one the single-window form has.

    The partial stage keys on ``spark_partition_id()`` captured
    BEFORE the rank exchange: correctness needs no particular
    partitioning (any slicing works), so task retries or AQE
    re-planning cannot change the result, only the slice boundaries.
    """
    reserved = {"_pid", "_r1", rank_col} & set(df.columns)
    if reserved:
        raise ValueError(
            f"grouped_topk: input columns {sorted(reserved)} collide with "
            "internal/rank names; rename them or pass a different rank_col"
        )
    group = list(group_cols)
    order = list(order_cols)
    w1 = Window.partitionBy(*group, "_pid").orderBy(*order)
    w2 = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_pid", "_r1")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
