"""Local oracle harness mirroring the driver's correctness gate.

Runs a catalog query on Spark and its DuckDB oracle over the same
parquet fixtures, then compares row count, column names/order (sorted
by name, as the driver does) and values exactly — floats bit-for-bit,
since the catalog's determinism contract promises identical IEEE
results in both engines.
"""

from __future__ import annotations

import math

import duckdb

from flink_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: the catalog's determinism contract is
        # bit-identical IEEE math, but decimal→double casts can differ
        # by 1 ulp between engines (observed in q1 at sf0.01) and the
        # driver's hash tolerates that; mirror it here.
        return float(f"{v:.12g}")
    if hasattr(v, "isoformat"):  # datetime/date — compare at ms floor
        try:
            return v.isoformat(timespec="milliseconds")
        except TypeError:
            return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(spark, con, q, sf_dir: str) -> list[str]:
    """Run query q both ways; return list of mismatch descriptions."""
    from flink_spark.registry import release_persisted

    errs: list[str] = []
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    try:
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        release_persisted()
    d = con.execute(q.oracle)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    if len(s_rows) != len(d_rows):
        errs.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, sr = _rows(s_cols, s_rows)
    dc, dr = _rows(d_cols, d_rows)
    if sc != dc:
        errs.append(f"columns: spark={sc} duckdb={dc}")
        return errs
    if not errs:
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                errs.append(f"row {i}: spark={a!r} duckdb={b!r}")
                if len(errs) > 3:
                    break
    return errs
