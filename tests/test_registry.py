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


def test_no_unaliased_aggregate_columns(spark):
    """Computed columns must be aliased (driver hashes by column name)."""
    from flink_spark.registry import all_queries

    for name, q in all_queries().items():
        df = q.fn(spark, "/root/testdata/sf0.001")
        for c in df.columns:
            assert "(" not in c, f"{name}: unaliased column {c!r}"
