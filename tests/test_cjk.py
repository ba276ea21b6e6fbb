"""CJK tokenization parity (F1) — the reference's real input domain.

The reference's one UDF is IK *Chinese* segmentation
(rt/app/func/SplitFunction.java:12-27, rt/utils/KeyWordUtil.java:13-33);
round 3's ASCII-only tokenizer silently dropped CJK text everywhere.
These tests pin the CJK-bigram tokenizer's values and prove mixed
CJK/Latin corpora round-trip through the shingle/MinHash dedup path
without vanishing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.functions.text import tokenize, word_shingles
from flink_spark.registry import all_queries, release_persisted

_Q = all_queries()


def _toks(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tokenize("text").alias("t")).collect()[0]["t"]


def test_cjk_bigram_tokens(spark):
    # Han runs → overlapping bigrams; Latin/digit runs → whole tokens
    assert _toks(spark, "你好世界") == ["你好", "好世", "世界"]
    assert _toks(spark, "一") == ["一"]
    assert _toks(spark, "Spark处理大数据, 你好!") == [
        "spark", "处理", "理大", "大数", "数据", "你好",
    ]
    # ASCII behavior is byte-for-byte the round-3 tokenizer
    assert _toks(spark, "Hello, World! abc123") == ["hello", "world", "abc123"]
    # CJK punctuation (fullwidth) is stripped like ASCII punctuation
    assert _toks(spark, "标点。符号，测试！") == ["标点", "符号", "测试"]


def test_cjk_tokens_feed_shingles(spark):
    # a pure-CJK document must produce shingles (round 3: empty array)
    df = spark.createDataFrame(
        [(1, "深度学习模型训练数据集质量评估")], "doc_id long, text string"
    )
    toks = df.select(tokenize("text").alias("t"))
    sh = toks.filter(F.size("t") >= 3).select(
        F.array_distinct(word_shingles(F.col("t"), 3)).alias("sl")
    )
    rows = sh.collect()
    assert len(rows) == 1 and len(rows[0]["sl"]) > 5
    # shingles are 3 consecutive bigrams joined by spaces
    assert rows[0]["sl"][0] == "深度 度学 学习"


def test_cjk_minhash_roundtrip(spark, tmp_path):
    """Mixed CJK/Latin near-dups must be caught by the full MinHash-LSH
    catalog query (tokenize → shingle → sign → band → verify)."""
    base = "大规模分布式数据处理引擎的性能评估报告与测试结果分析总结"
    docs = [
        (0, base),
        (1, base + "二"),                      # near-dup of 0 (1 char appended)
        (2, "machine learning 机器学习 pipeline 数据 quality 质量 控制 流程 评估"),
        (3, "machine learning 机器学习 pipeline 数据 quality 质量 控制 流程 审查"),
        (4, "completely unrelated english text about query planning engines"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    try:
        got = {
            (r.d1, r.d2)
            for r in _Q["t_minhash_lsh_dups"].fn(spark, str(tmp_path)).collect()
        }
    finally:
        release_persisted()
    assert (0, 1) in got, "pure-CJK near-dup pair vanished from the LSH path"
    assert (2, 3) in got, "mixed CJK/Latin near-dup pair vanished"
    assert all(4 not in pair for pair in got)


def test_cjk_keyword_counts_shape(spark):
    out = _Q["t_cjk_keyword_counts"].fn(spark, "unused").collect()
    counts = {r.word: r.word_ct for r in out}
    # 数据 appears in docs 1,2,5,6 (twice in Han runs via bigrams of
    # 大数据处理引擎/查询数据/数据查询) — must be a top keyword
    assert counts["数据"] >= 4
    assert "query" in counts and counts["query"] == 2
    assert "" not in counts
