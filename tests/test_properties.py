"""Property-based tests (hypothesis) for the expression helpers.

The oracle comparison pins fixture behavior; these pin the algebraic
invariants on arbitrary inputs.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

TEXTS = st.text(
    alphabet=st.sampled_from("abc 123 .,!?\nXYZ"), min_size=0, max_size=80
)


def _session():
    from flink_spark.session import get_spark

    return get_spark(app_name="flink_spark-tests", cpus=8, shuffle_partitions=8)


def _spark_one(make_expr, text):
    spark = _session()  # a live context must exist before Column exprs
    df = spark.createDataFrame([(text,)], "text string").select(
        make_expr().alias("out")
    )
    return df.collect()[0]["out"]


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_tokenize_matches_python_reference(text):
    from flink_spark.functions.text import tokenize

    got = _spark_one(lambda: tokenize("text"), text)
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    assert got == norm.split(" ")


@settings(max_examples=25, deadline=None)
@given(TEXTS)
def test_fingerprint_case_punct_invariant(text):
    from flink_spark.functions.text import fingerprint

    a = _spark_one(lambda: fingerprint("text"), text)
    b = _spark_one(lambda: fingerprint("text"), text.upper() + "!!!")
    # uppercasing and trailing punctuation never change the fingerprint
    assert a == b


@settings(max_examples=20, deadline=None)
@given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=3, max_size=10))
def test_shingle_count_invariant(tokens):
    from pyspark.sql import functions as F

    from flink_spark.functions.text import word_shingles

    df = _session().createDataFrame([(tokens,)], "t array<string>").select(
        F.size(word_shingles(F.col("t"), 3)).alias("n")
    )
    assert df.collect()[0]["n"] == len(tokens) - 2
