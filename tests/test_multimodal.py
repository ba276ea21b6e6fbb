"""m_decode_features (mapInPandas) determinism + contract tests.

The decode stage has no SQL oracle (driver records rows-only); these
tests pin its values against a pure-pandas recomputation instead.
"""

from __future__ import annotations

from flink_spark.registry import all_queries

from conftest import SF_DIR


def test_decode_features_match_local_recompute(spark):
    got = {
        r.doc_id: r
        for r in all_queries()["m_decode_features"].fn(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(got) == len(docs)
    for d in docs:
        payload = d.text.encode()
        r = got[d.doc_id]
        assert r.n_bytes == len(payload)
        assert r.first_byte == (payload[0] if payload else -1)
        assert abs(r.byte_mean - sum(payload) / len(payload)) < 1e-9
        assert r.source == d.source


def test_decode_features_schema_contract(spark):
    df = all_queries()["m_decode_features"].fn(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "byte_mean", "first_byte", "source",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["byte_mean"] == "double" and kinds["n_bytes"] == "bigint"
