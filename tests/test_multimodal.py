"""m_decode_features (mapInPandas) determinism + contract tests.

The decode stage IS value-level DuckDB-oracled (the ASCII fixture
payloads make byte statistics SQL-expressible); these tests additionally
pin its values against an independent pure-pandas recomputation, and pin
the ASCII property itself that the m_frame_sample / m_resize_bytes
oracles rely on (byte slices ≡ character slices).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.registry import all_queries

from conftest import SF_DIR


def test_fixture_payloads_ascii(spark):
    # the multimodal oracles equate octet_length(encode(text)) with
    # length(text); assert the property instead of assuming it
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bad = docs.filter(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert bad == 0


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
