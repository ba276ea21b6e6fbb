"""Bucketed-table helpers: the shuffle-free co-located join at rest.

At 100 TB the biggest recurring cost of fact⋈fact joins is re-hashing
both sides per query. Hive-style bucketing pays that shuffle ONCE at
write time: both tables are hash-clustered into the same number of
buckets on the join key, so every later equi-join (and groupBy on the
key) reads pre-partitioned data — the physical plan contains a
SortMergeJoin with NO Exchange on either side. This is the at-rest
analog of the reference keeping Kafka topics partitioned by key
between jobs (``rt/utils/MyKafkaUtil.java`` producers partition by
key, so the next job's ``keyBy`` is already satisfied).

Rules the helper enforces (the classic bucketing foot-guns):

- both sides MUST share the bucket count — mismatched counts silently
  fall back to a full shuffle;
- bucketed tables only exist through the catalog (``saveAsTable``) —
  a plain ``.parquet(path)`` write drops the bucket metadata;
- writers should set ``spark.sql.shuffle.partitions`` ≥ buckets, and
  readers need ``spark.sql.sources.bucketing.enabled`` (Spark default
  true) — asserted in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets can additionally remove the per-query Sort
    under SortMergeJoin — but Spark only trusts a bucket's sort order
    when the bucket is ONE file (each writer task sorts its own
    output, so a multi-file bucket is merely piecewise-sorted). The
    ``repartition(buckets, key)`` below aligns writer partitions with
    bucket ids (both use the same hash), making every bucket a single
    file; without it ``sortBy`` still writes valid buckets but every
    join re-sorts, silently costing the thing it was supposed to buy.
    """
    w = (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key."""
    return spark.table(left).join(spark.table(right), key, how)
