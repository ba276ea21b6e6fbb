"""Catalog wiring smoke tests — would have caught round 1's ImportError."""

from __future__ import annotations


def test_catalog_imports_cleanly():
    from flink_spark.registry import all_queries

    qs = all_queries()
    assert len(qs) >= 38
    for name, q in qs.items():
        assert callable(q.fn), name


def test_driver_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    orc = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(orc) <= set(qs), "every oracle key must have a query"
    # the bulk of the catalog must be oracle-checked, not rows-only
    assert len(orc) >= len(qs) - 3


def test_reliable_persist_fallback_uses_disk_and_keeps_lineage(spark, monkeypatch):
    """FLINK_SPARK_CUT_LINEAGE=0 is the cluster fault-tolerance profile:
    the barrier must be a lineage-preserving persist (InMemoryTableScan
    over a DISK_ONLY relation), never a localCheckpoint (whose blocks
    are unrecoverable after executor loss)."""
    import contextlib
    import io

    from pyspark import StorageLevel

    from flink_spark.registry import release_persisted, track_persist

    monkeypatch.setenv("FLINK_SPARK_CUT_LINEAGE", "0")
    df = track_persist(spark.range(100).selectExpr("id", "id * 2 AS v"))
    try:
        assert df.storageLevel == StorageLevel.DISK_ONLY
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "InMemoryTableScan" in plan
        assert "Scan ExistingRDD" not in plan  # lineage NOT truncated
        assert df.count() == 100
    finally:
        release_persisted()


def test_cut_lineage_default_truncates_and_releases(spark, monkeypatch):
    """Default profile: localCheckpoint barrier (plan truncated to an
    RDD scan) whose blocks release_persisted() frees via the handle
    resolved at track_persist time."""
    import contextlib
    import io

    from flink_spark import registry
    from flink_spark.registry import release_persisted, track_persist

    monkeypatch.delenv("FLINK_SPARK_CUT_LINEAGE", raising=False)
    df = track_persist(spark.range(100).selectExpr("id", "id * 2 AS v"))
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Scan ExistingRDD" in plan
        # the checkpointed-RDD handle must have been resolved eagerly
        assert registry._PERSISTED and registry._PERSISTED[-1][1] is not None
        assert df.count() == 100
    finally:
        release_persisted()
    assert not registry._PERSISTED


def test_no_unaliased_aggregate_columns(spark):
    """Computed columns must be aliased (driver hashes by column name)."""
    from flink_spark.registry import all_queries

    for name, q in all_queries().items():
        df = q.fn(spark, "/root/testdata/sf0.001")
        for c in df.columns:
            assert "(" not in c, f"{name}: unaliased column {c!r}"
