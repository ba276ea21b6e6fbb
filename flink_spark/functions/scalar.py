"""Scalar function helpers.

Covers the reference's scalar surface (SURVEY.md §2.9): map access,
casts, if(), date_format, and the ClickHouse-side functions used by the
ADS queries (``toYYYYMMDD`` — pub22/mapper/TradeStatsMapper.java:12,
``toHour`` — TrafficVisitorStatsMapper.java:24, ``multiIf`` —
TrafficKeywordsMapper.java:11-16), plus exact-decimal aggregation
helpers that make float aggregates order-insensitive (bit-identical
under any row order / partitioning — required both for the DuckDB
oracle and for run-to-run reproducibility on a cluster).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# Money-ish columns in the fixtures have ≤2 decimals; rates ≤4.
DEC2 = DecimalType(18, 2)
DEC4 = DecimalType(6, 4)


def dec2(c: Column | str) -> Column:
    """Exact decimal(18,2) view of a money column."""
    return F.col(c).cast(DEC2) if isinstance(c, str) else c.cast(DEC2)


def dec4(c: Column | str) -> Column:
    """Exact decimal(6,4) view of a rate column (discount/tax)."""
    return F.col(c).cast(DEC4) if isinstance(c, str) else c.cast(DEC4)


def dsum(c: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-insensitive SUM of a float column.

    Sums in exact decimal then casts once to double, so the result is
    bit-identical regardless of partitioning — unlike a raw double sum,
    whose low bits depend on accumulation order. Cheap: decimal sums
    stay inside whole-stage codegen.
    """
    dt = DEC2 if scale == 2 else DecimalType(18, scale)
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(dt)).cast("double").alias(alias)


def to_yyyymmdd(c: Column | str) -> Column:
    """ClickHouse ``toYYYYMMDD`` (pub22 mappers) as an int column."""
    return F.date_format(c, "yyyyMMdd").cast("int")


def to_hour(c: Column | str) -> Column:
    """ClickHouse ``toHour`` — hour-of-day int."""
    return F.hour(c)


def multi_if(*cond_value_pairs, default=None) -> Column:
    """ClickHouse ``multiIf(c1,v1,c2,v2,...,else)`` as chained when()."""
    assert cond_value_pairs and len(cond_value_pairs) % 2 == 0
    it = iter(cond_value_pairs)
    expr = None
    for cond in it:
        val = next(it)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(default) if default is not None else expr
