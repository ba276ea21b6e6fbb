"""J5 beyond-broadcast fallback: LRU cache semantics + plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import types as T

from flink_spark.registry import all_queries
from flink_spark.sources.lookup import LruCache, lru_dim_join

from conftest import SF_DIR

_Q = all_queries()


def test_lru_eviction_and_recency():
    c = LruCache(maxsize=2)
    c.put(1, "a")
    c.put(2, "b")
    assert c.get(1) == "a"     # refreshes 1's recency
    c.put(3, "c")              # evicts 2 (least recently used), not 1
    assert 2 not in c and 1 in c and 3 in c
    assert c.get(2) is None
    assert (c.hits, c.misses) == (1, 1)


def test_lru_rejects_zero_size():
    with pytest.raises(ValueError):
        LruCache(0)


def test_lru_dim_join_inner_semantics(spark):
    """Facts whose key the store lacks drop (reference: discard on
    missing dim); present keys enrich with the dim columns."""

    def getter(keys):
        store = {10: "x", 20: "y"}  # key 30 missing
        hit = [k for k in keys if k in store]
        return pd.DataFrame({"k": hit, "tag": [store[k] for k in hit]})

    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 10)], "fact_id long, k long"
    )
    out = lru_dim_join(
        facts, getter, fact_key="k", dim_key="k",
        dim_fields=[("tag", T.StringType())],
    )
    got = sorted((r.fact_id, r.tag) for r in out.collect())
    assert got == [(1, "x"), (2, "y"), (4, "x")]


def test_lru_dim_join_plan_has_no_join_or_broadcast(spark):
    """The dim must never appear as a Spark relation: no join node of
    any kind, no broadcast exchange — the whole lookup lives inside
    MapInPandas and the only exchange is the final aggregation's."""
    import contextlib
    import io

    df = _Q["j_lru_dim_join"].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "BroadcastExchange", "CartesianProduct"):
        assert node not in plan, node
    tree = plan.split("(1) ")[0]
    assert tree.count("Exchange") == 1  # the groupBy shuffle only


def test_lru_dim_join_batch_wider_than_cache(spark):
    """A single Arrow batch with more distinct keys than cache_rows must
    still enrich EVERY row (regression: mid-batch eviction used to drop
    rows for keys fetched early in the batch, corrupting the inner
    join as if the dim lacked them)."""

    n = 50  # distinct keys per batch, far above cache_rows=2

    def getter(keys):
        ks = list(keys)
        return pd.DataFrame({"k": ks, "tag": [f"t{k}" for k in ks]})

    facts = spark.createDataFrame(
        [(i, i % n) for i in range(2 * n)], "fact_id long, k long"
    ).coalesce(1)
    out = lru_dim_join(
        facts, getter, fact_key="k", dim_key="k",
        dim_fields=[("tag", T.StringType())],
        cache_rows=2,
    )
    got = out.collect()
    assert len(got) == 2 * n
    assert all(r.tag == f"t{r.k}" for r in got)


def test_lru_dim_join_eviction_churn_across_batches(spark, tmp_path):
    """Eviction stress across MANY Arrow batches: every batch's
    distinct-key set exceeds cache_rows and keys recur in later
    batches after being evicted. Eviction may only cost re-fetches —
    never a dropped or mis-tagged row, and the fetch log must show
    the cache actually evicting (more fetches than distinct keys).
    The getter runs in the Python WORKER, so the log is a file."""
    log = str(tmp_path / "fetch.log")

    def getter(keys):
        ks = list(keys)
        with open(log, "a") as f:
            f.writelines(f"{k}\n" for k in ks)
        return pd.DataFrame({"k": ks, "tag": [f"t{k}" for k in ks]})

    n, batches = 40, 6
    facts = spark.createDataFrame(
        [(b * n + i, (i * 7 + b) % n) for b in range(batches)
         for i in range(n)],
        "fact_id long, k long",
    ).coalesce(1)
    out = lru_dim_join(
        facts, getter, fact_key="k", dim_key="k",
        dim_fields=[("tag", T.StringType())],
        cache_rows=5,
    )
    with _arrow_batch_rows(spark, 40):
        got = out.collect()
    assert len(got) == n * batches
    assert all(r.tag == f"t{r.k}" for r in got)
    # the cache (5 slots) cannot hold 40 keys: later batches re-fetch
    with open(log) as f:
        fetched = f.read().splitlines()
    assert len(fetched) > n, len(fetched)


class _arrow_batch_rows:
    """Temporarily set the Arrow batch size so one job yields many
    batches through mapInPandas."""

    def __init__(self, spark, rows: int):
        self.spark, self.rows = spark, rows
        self.key = "spark.sql.execution.arrow.maxRecordsPerBatch"

    def __enter__(self):
        self.old = self.spark.conf.get(self.key)
        self.spark.conf.set(self.key, str(self.rows))

    def __exit__(self, *a):
        self.spark.conf.set(self.key, self.old)


def test_lru_dim_join_import_has_no_pickle_side_effect():
    """Importing the module must not globally register by-value pickling
    (that happens inside lru_dim_join, scoped to the closures it ships)."""
    import importlib
    import sys as _sys

    from pyspark import cloudpickle as cp

    _sys.modules.pop("flink_spark.sources.lookup", None)
    try:
        mod = importlib.import_module("flink_spark.sources.lookup")
        assert mod not in cp.list_registry_pickle_by_value()
    finally:
        importlib.reload(importlib.import_module("flink_spark.sources.lookup"))
