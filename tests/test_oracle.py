"""Per-query DuckDB oracle comparison at sf0.001 (driver-gate mirror)."""

from __future__ import annotations

import pytest

from flink_spark.registry import all_queries
from flink_spark.testing import compare

from conftest import SF_DIR

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_match(name, spark, duck):
    q = _QUERIES[name]
    if not q.oracle:
        ct = q.fn(spark, SF_DIR).count()
        assert ct >= 0
        return
    errs = compare(spark, duck, q, SF_DIR)
    assert not errs, f"{name}: {errs[:3]}"
