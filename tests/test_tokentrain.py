"""BPE trainer vs a pure-Python reference + shuffle-shard invariants.

The merge-table trainer has no SQL oracle (iterative argmax), so its
correctness contract is pinned here instead: the distributed trainer
must produce the EXACT merge table a straightforward single-machine
BPE trainer produces from the same weighted vocab, and the JVM
fold-based merge application must equal the positional greedy scan on
adversarial symbol streams.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import SF_DIR


# --- pure-Python reference implementations (Sennrich et al. 2016) ---

def ref_apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right positional scan — the textbook form."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_bpe_train(weighted_words: list[tuple[str, int]], n_merges: int):
    vocab = [(list(w), c) for w, c in weighted_words]
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        # total deterministic order: count DESC, then pair lexicographic
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((rank, left, right, n))
        vocab = [(ref_apply_merge(s, left, right), c) for s, c in vocab]
    return merges


# --- fold ≡ scan property ---

@settings(max_examples=200, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba", "c"]),
        st.sampled_from(["a", "b", "ab", "ba", "c"]),
    ),
)
def test_ref_scan_never_remerges(syms, pair):
    """The reference scan's output never contains the pair adjacent
    UNLESS it was created by this very merge (left+right == left is
    impossible) — the invariant the JVM fold relies on."""
    out = ref_apply_merge(syms, *pair)
    assert pair not in set(zip(out, out[1:])), (syms, pair, out)


def test_fold_merge_equals_scan(spark):
    """JVM fold merge == positional scan on adversarial streams."""
    from pyspark.sql import functions as F

    from flink_spark.plans.tokentrain import _apply_merge

    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["ab", "b", "b"], "ab", "b"),
        (["a", "ab", "b"], "a", "ab"),
        (["b", "a", "b", "a"], "b", "a"),
        ([], "a", "b"),
        (["x"], "a", "b"),
        (["a", "b", "b", "a", "b"], "a", "b"),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "i int, syms array<string>",
    )
    for i, (syms, l, r) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_apply_merge(F.col("syms"), l, r).alias("m"))
            .first()["m"]
        )
        assert got == ref_apply_merge(syms, l, r), (syms, l, r)


# --- end-to-end: distributed trainer == reference trainer ---

def test_bpe_train_matches_reference(spark):
    from pyspark.sql import functions as F

    from flink_spark.functions.text import tokenize
    from flink_spark.plans.tokentrain import (
        BPE_VOCAB_WORDS,
        _chars,
        bpe_train_merges,
    )
    from flink_spark.sources import load

    docs = load(spark, SF_DIR, "documents")
    words = (
        docs.select(F.explode(tokenize("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(BPE_VOCAB_WORDS)
    )
    weighted = [(r["w"], r["cnt"]) for r in words.collect()]
    vocab = words.repartition(4).select("w", "cnt", _chars("w").alias("syms"))

    n = 8  # enough rounds to exercise merged-symbol pairs
    got, final_vocab = bpe_train_merges(vocab, n)
    want = ref_bpe_train(weighted, n)
    assert got == want

    # the final vocab's symbol splits must equal applying the merge
    # table in rank order with the reference scanner
    ref_syms = {}
    for w, _ in weighted:
        syms = list(w)
        for _, left, right, _ in want:
            syms = ref_apply_merge(syms, left, right)
        ref_syms[w] = syms
    for r in final_vocab.collect():
        assert r["syms"] == ref_syms[r["w"]], r["w"]


def test_bpe_segment_matches_reference(spark):
    from flink_spark.plans.tokentrain import _trained
    from flink_spark.registry import all_queries

    merges, vocab = _trained(spark, SF_DIR)
    n_sym = {r["w"]: len(r["syms"]) for r in vocab.collect()}

    import duckdb

    from flink_spark.functions.text import toks_sql

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, unnest({toks_sql('text')}) AS w "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    agg: dict = {}
    for source, w in rows:
        a = agg.setdefault(source, [0, 0, 0, 0])  # occ, toks, chars, oov
        a[0] += 1
        a[1] += n_sym.get(w, len(w))
        a[2] += len(w)
        a[3] += 0 if w in n_sym else 1

    df = all_queries()["t_bpe_segment"].fn(spark, SF_DIR)
    for r in df.collect():
        occ, toks, chars, oov = agg[r["source"]]
        assert (r["word_occurrences"], r["bpe_tokens"], r["chars"]) == (
            occ, toks, chars,
        ), r["source"]
        assert abs(r["oov_rate"] - oov / occ) < 1e-12


def test_t_bpe_train_query_shape(spark):
    from flink_spark.registry import all_queries

    df = all_queries()["t_bpe_train"].fn(spark, SF_DIR)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "rank", "left", "right", "merged", "pair_count",
    ]
    assert rows, "fixture corpus must yield at least one merge"
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    # merge weights are non-increasing only per-pair, not globally
    # (a later merge can outweigh an earlier one's leftovers is false:
    # greedy argmax makes counts non-increasing in rank)
    counts = [r["pair_count"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_bpe_oracle_survives_empty_normalizing_docs(spark, tmp_path):
    """A doc whose text normalizes to EMPTY tokenizes to [''] — the
    two engines split '' differently (Spark's sequence(1,0) reverses
    into ['',''], DuckDB's range(1,1) yields no symbols), so an ''
    word reaching the vocab desyncs trainer and oracle. Both sides now
    filter it; this corpus makes '' the single most frequent word, so
    any regression flips the vocab and the merge table."""
    import duckdb

    from flink_spark.registry import all_queries

    docs = [(i, "!!! ...", "punct") for i in range(40)] + [
        (100, "the quick brown fox jumps over the lazy dog", "web"),
        (101, "the quick brown fox jumps over the lazy cat", "web"),
        (102, "pack my box with five dozen liquor jugs", "books"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    qs = all_queries()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    try:
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in qs["t_bpe_train"].fn(spark, str(tmp_path)).collect()
        ]
        want = con.execute(qs["t_bpe_train"].oracle).fetchall()
        assert got == want and got, "trainer/oracle merge tables diverged"
        assert all("" not in (l, r) for _, l, r, _, _ in got)

        seg = {
            r["source"]: (r["word_occurrences"], r["bpe_tokens"], r["chars"])
            for r in qs["t_bpe_segment"].fn(spark, str(tmp_path)).collect()
        }
        seg_o = {
            s: (occ, toks, chars)
            for s, occ, toks, chars, _, _ in con.execute(
                qs["t_bpe_segment"].oracle
            ).fetchall()
        }
        assert seg == seg_o
    finally:
        con.close()


def test_shuffle_breaks_source_runs(spark):
    """The shuffled read order interleaves sources: adjacent
    same-source pairs must be well below the ingest-order worst case
    (docs - shards, since ingest order is source-clustered)."""
    from flink_spark.registry import all_queries

    df = all_queries()["t_shuffle_shards"].fn(spark, SF_DIR)
    rows = df.collect()
    n_docs = sum(r["n_docs"] for r in rows)
    adj = sum(r["adjacent_same_source"] for r in rows)
    assert len(rows) >= 8
    # random interleave expectation ≈ Σ p_s² per adjacent slot; the
    # fixture has several sources, so anything under half the slots
    # proves real mixing (ingest order would be ≈ all slots)
    assert adj < (n_docs - len(rows)) / 2
