"""Property-based tests (hypothesis) for the expression helpers.

The oracle comparison pins fixture behavior; these pin the algebraic
invariants on arbitrary inputs.
"""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# alphabet includes Han chars from the basic CJK block (U+4E00–U+9FFF),
# where the pure-python reference's explicit range equals Java's
# \p{IsHan} script property
TEXTS = st.text(
    alphabet=st.sampled_from("abc 123 .,!?\nXYZ数据处理学习"), min_size=0, max_size=80
)

_HAN = r"一-鿿"


def _py_tokenize(text: str) -> list[str]:
    """Pure-python reference of the CJK-aware tokenizer."""
    norm = re.sub(rf"[^a-z0-9{_HAN}]+", " ", text.lower()).strip()
    out: list[str] = []
    for tok in norm.split(" "):
        if not re.search(rf"[{_HAN}]", tok):
            out.append(tok)
            continue
        for run in re.findall(rf"[a-z0-9]+|[{_HAN}]+", tok):
            if re.match(rf"^[{_HAN}]", run):
                out.extend(
                    [run] if len(run) == 1
                    else [run[i:i + 2] for i in range(len(run) - 1)]
                )
            else:
                out.append(run)
    return out


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
    assert got == _py_tokenize(text)


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


# --- connected components ≡ union-find on arbitrary pair graphs ---

EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).map(
        lambda t: (min(t), max(t))
    ).filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=40,
)


def _union_find_labels(edges) -> dict:
    """Brute-force reference: node → min id of its component."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {n: min(m) for m in comps.values() for n in m}


def _cc_labels(edges, **kwargs) -> dict:
    from flink_spark.plans.graph import connected_components

    spark = _session()
    pairs = spark.createDataFrame(
        list(set(edges)), "d1 bigint, d2 bigint"
    ).persist()
    try:
        return {
            r.doc_id: r.cluster_id
            for r in connected_components(pairs, **kwargs).collect()
        }
    finally:
        pairs.unpersist()


@settings(max_examples=12, deadline=None)
@given(EDGE_LISTS)
def test_connected_components_equals_union_find(edges):
    """connected_components labels every node with its component's min
    id, on arbitrary graphs (chains, cliques, stars, disjoint bits) —
    not just the LSH-shaped fixtures the oracle covers."""
    assert _cc_labels(edges) == _union_find_labels(edges)


@settings(max_examples=8, deadline=None)
@given(EDGE_LISTS)
def test_star_contraction_equals_union_find(edges):
    """The large-star/small-star path (forced by star_after=0) honors
    the same contract as propagation on arbitrary graphs."""
    assert _cc_labels(edges, star_after=0) == _union_find_labels(edges)


def test_connected_components_raises_when_unconverged():
    """A round budget too small for even star contraction must still
    fail loudly — silently returning unconverged labels would split
    clusters."""
    import pytest

    from flink_spark.plans.graph import connected_components

    spark = _session()
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "d1 bigint, d2 bigint"
    ).persist()
    try:
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_rounds=2)
        labels = {
            r.doc_id: r.cluster_id
            for r in connected_components(chain).collect()
        }
        assert set(labels.values()) == {0}  # one chain, min-id label
    finally:
        chain.unpersist()


def test_long_path_converges_via_star_contraction():
    """A 1000-node path — diameter far past any propagation budget —
    must converge through the star-contraction handoff (the former
    RuntimeError cliff for chain-shaped dup graphs)."""
    from flink_spark.plans.graph import connected_components

    spark = _session()
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "d1 bigint, d2 bigint"
    ).persist()
    try:
        labels = {
            r.doc_id: r.cluster_id
            for r in connected_components(chain).collect()
        }
        assert len(labels) == 1000
        assert set(labels.values()) == {0}
    finally:
        chain.unpersist()


# --- SeqPattern batch evaluator vs a brute-force python reference ------

_EV_TYPES = "abc"
SEQS = st.lists(
    st.tuples(
        st.integers(1, 3),                      # user_id
        st.integers(0, 120),                    # second offset
        st.sampled_from(_EV_TYPES),             # event_type
    ),
    min_size=0,
    max_size=20,
)
PATTERNS = st.lists(st.sampled_from(_EV_TYPES), min_size=1, max_size=3)


def _py_pattern(rows, steps, within_ms):
    """Brute-force SeqPattern reference: for each start event of each
    key's (ms, event_id)-ordered sequence, walk the strict-contiguity
    predicate chain and classify match / timeout / nothing."""
    out = {}
    byu: dict = {}
    for uid, eid, ms, et in rows:
        byu.setdefault(uid, []).append((ms, eid, et))
    for uid, seq in byu.items():
        seq.sort()
        for i, (ms0, eid0, _et0) in enumerate(seq):
            m = 0  # predicates matched so far
            for j in range(i, len(seq)):
                ms_j, _eid_j, et_j = seq[j]
                if ms_j - ms0 > within_ms:
                    if m >= 1:
                        out[(uid, eid0)] = "timeout"
                    break
                if et_j != steps[m]:
                    break
                m += 1
                if m == len(steps):
                    out[(uid, eid0)] = "match"
                    break
            else:
                if 1 <= m < len(steps):
                    out[(uid, eid0)] = "timeout"  # sequence ended in time
    return out


@given(SEQS, PATTERNS)
@settings(max_examples=20, deadline=None)
def test_seq_pattern_matches_brute_force(rows_raw, steps):
    from datetime import datetime, timedelta

    from flink_spark.plans.cep import SeqPattern, pattern_matches

    spark = _session()
    base = datetime(2024, 1, 1)
    rows = [
        (uid, eid, sec * 1000, et)
        for eid, (uid, sec, et) in enumerate(rows_raw)
    ]
    df = spark.createDataFrame(
        [
            (uid, eid, base + timedelta(milliseconds=ms), et)
            for uid, eid, ms, et in rows
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    pat = SeqPattern(
        steps=tuple(f"event_type = '{s}'" for s in steps),
        within_ms=10_000,
    )
    got = {
        (r.user_id, r.event_id): r.via
        for r in pattern_matches(df, pat).collect()
    }
    assert got == _py_pattern(rows, list(steps), 10_000)


def _py_followed_by(rows, steps, within_ms):
    """Brute-force relaxed-contiguity reference: greedy earliest-
    occurrence chaining from every start; match iff the chain completes
    within the horizon, else timeout (relaxed partials never die)."""
    out = {}
    byu: dict = {}
    for uid, eid, ms, et in rows:
        byu.setdefault(uid, []).append((ms, eid, et))
    for uid, seq in byu.items():
        seq.sort()
        for i, (ms0, eid0, et0) in enumerate(seq):
            if et0 != steps[0]:
                continue
            pos, last_ms, ok = i, ms0, True
            for m in range(1, len(steps)):
                nxt = next(
                    (j for j in range(pos + 1, len(seq))
                     if seq[j][2] == steps[m]),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                pos, last_ms = nxt, seq[nxt][0]
            out[(uid, eid0)] = (
                "match" if ok and last_ms - ms0 <= within_ms else "timeout"
            )
    return out


@given(SEQS, PATTERNS)
@settings(max_examples=15, deadline=None)
def test_followed_by_matches_brute_force(rows_raw, steps):
    from datetime import datetime, timedelta

    from flink_spark.plans.cep import SeqPattern, pattern_matches

    spark = _session()
    base = datetime(2024, 1, 1)
    rows = [
        (uid, eid, sec * 1000, et)
        for eid, (uid, sec, et) in enumerate(rows_raw)
    ]
    df = spark.createDataFrame(
        [
            (uid, eid, base + timedelta(milliseconds=ms), et)
            for uid, eid, ms, et in rows
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    pat = SeqPattern(
        steps=tuple(f"event_type = '{s}'" for s in steps),
        within_ms=10_000,
        contiguity="followed_by",
    )
    got = {
        (r.user_id, r.event_id): r.via
        for r in pattern_matches(df, pat).collect()
    }
    assert got == _py_followed_by(rows, list(steps), 10_000)


# --- skew-guarded pair join ≡ plain self-join on arbitrary inputs ------

ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from("aaabbc")),
    min_size=0, max_size=35, unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(ROWS, st.integers(1, 6))
def test_pair_self_join_grid_equals_bruteforce(rows, cap):
    """pair_self_join must emit EXACTLY the within-bucket pair set —
    at any cap, including caps that force multi-way grid splits on
    every bucket — with payloads following the id ordering."""
    import itertools

    from flink_spark.plans.pairjoin import pair_self_join
    from flink_spark.registry import release_persisted

    spark = _session()
    df = spark.createDataFrame(
        [(i, k, i * 7) for i, k in rows], "id long, k string, pay long"
    )
    got = sorted(
        (r.d1, r.d2, r.pay1, r.pay2)
        for r in pair_self_join(df, "id", ["k"], payload=["pay"],
                                cap=cap).collect()
    )
    release_persisted()
    expect = sorted(
        (a, b, a * 7, b * 7)
        for (a, ka), (b, kb) in itertools.combinations(sorted(rows), 2)
        if ka == kb
    )
    assert got == expect


def test_adversarial_identical_corpus_is_skew_guarded(tmp_path):
    """An all-identical-documents corpus (every doc in ONE bucket of
    every band) must still produce oracle-exact near-dup output with a
    tiny bucket cap forcing the grid path — the guard changes the
    physical plan, never the result."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    from flink_spark.sources import TABLES

    for t in TABLES:
        if t not in ("documents", "embeddings"):
            os.symlink(f"{sf}/{t}.parquet", tmp_path / f"{t}.parquet")
    con.execute(f"""
        COPY (SELECT CAST(i AS BIGINT) AS doc_id,
                     'the same boilerplate page repeated verbatim across
                      the corpus with enough tokens to shingle' AS text,
                     'src' || (i % 3) AS source
              FROM range(0, 60) t(i))
        TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (SELECT CAST(i AS BIGINT) AS vec_id,
                     (SELECT embedding FROM '{sf}/embeddings.parquet'
                      WHERE vec_id = 0) AS embedding,
                     'lab' AS label
              FROM range(0, 60) t(i))
        TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)
    """)
    env = dict(os.environ, FLINK_SPARK_MAX_BUCKET="8")
    script = _PAIRJOIN_SCRIPT.format(repo=repo, sf_dir=str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert "SKEW-GUARD-OK" in out.stdout, out.stderr[-3000:]


_PAIRJOIN_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from flink_spark.session import get_spark
from flink_spark.testing import compare, duck_connect
from flink_spark.registry import all_queries
spark = get_spark(cpus=4, shuffle_partitions=4)
con = duck_connect({sf_dir!r})
qs = all_queries()
for name in ["t_minhash_lsh_dups", "t_simhash_dups", "t_embedding_neardup",
             "t_ngram_jaccard_dups", "t_containment_dups",
             "e_semantic_dedup", "e_dup_clusters"]:
    errs = compare(spark, con, qs[name], {sf_dir!r})
    assert not errs, (name, errs[:2])
print("SKEW-GUARD-OK")
"""


# --- numpy kernels ≡ the JVM/SQL sequential fold, bit for bit ----------

# nonzero-norm float32 vectors (a zero vector has no cosine; ANSI mode
# raises on the JVM reference and the corpus contract excludes them)
VECS = st.lists(
    st.lists(
        st.floats(-8, 8, allow_nan=False, width=32).map(
            lambda x: float(np.float32(x))
        ),
        min_size=64, max_size=64,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
    min_size=2, max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(VECS, st.integers(3, 9))
def test_probe_cells_kernel_matches_jvm_fold(vecs, cells):
    """``_with_probe_cells`` (numpy sequential accumulation + stable
    argsort) must pick EXACTLY the cells the JVM expression fold picks
    — same left-fold float semantics, same first-index tiebreak — on
    arbitrary float32 vectors, at any cell count. This is the
    bit-exactness contract every oracle in the IVF/SemDeDup family
    rests on."""
    from flink_spark.plans.similarity import (
        _centroid,
        _norm,
        _proj,
        _with_probe_cells,
    )

    spark = _session()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: tuple(r.topc)
        for r in _with_probe_cells(
            df.select("vec_id", "embedding",
                      _norm(F.col("embedding")).alias("nrm")),
            spark, cells, 2,
        ).collect()
    }
    scored = df.select(
        "vec_id",
        F.array(*[_proj(F.col("embedding"), _centroid(k))
                  for k in range(cells)]).alias("d"),
    ).withColumn(
        "topc",
        F.expr(
            f"transform(slice(array_sort(transform(sequence(1, {cells}), "
            "j -> struct(-element_at(d, j) AS nv, j AS i))), 1, 2), "
            "x -> x.i)"
        ),
    )
    expect = {r.vec_id: tuple(r.topc) for r in scored.collect()}
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(VECS)
def test_pair_cosine_kernel_matches_jvm_fold(vecs):
    """``_pair_cosines_pandas`` must reproduce the ``_dot`` expression
    fold bit for bit on arbitrary float32 pairs (the verify stage of
    the whole embedding near-dup family)."""
    from flink_spark.plans.similarity import (
        _dot,
        _norm,
        _pair_cosines_pandas,
    )

    spark = _session()
    rows = [
        (i, i + 100, a, b)
        for i, (a, b) in enumerate(zip(vecs, reversed(vecs)))
    ]
    df = spark.createDataFrame(
        rows,
        "d1 long, d2 long, embedding1 array<float>, embedding2 array<float>",
    ).select(
        "d1", "d2", "embedding1", "embedding2",
        _norm(F.col("embedding1")).alias("nrm1"),
        _norm(F.col("embedding2")).alias("nrm2"),
    )
    got = {(r.d1, r.d2): r.cosine for r in _pair_cosines_pandas(df).collect()}
    jvm = df.select(
        "d1", "d2",
        (_dot(F.col("embedding1"), F.col("embedding2"))
         / (F.col("nrm1") * F.col("nrm2"))).alias("cosine"),
    )
    expect = {(r.d1, r.d2): r.cosine for r in jvm.collect()}
    assert got == expect  # exact float equality, not approx


@settings(max_examples=8, deadline=None)
@given(VECS, st.integers(4, 9))
def test_band_key_kernel_matches_jvm_expression(vecs, bits):
    """``_with_band_keys`` (numpy fold + sign pack) must produce the
    EXACT band keys of the ``_band_keys`` expression at any bit width
    — the candidate universe of the whole embedding near-dup family."""
    from flink_spark.plans.similarity import _band_keys, _with_band_keys

    spark = _session()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: tuple(r.bkeys)
        for r in _with_band_keys(df, spark, bits).collect()
    }
    expect = {
        r.vec_id: tuple(r.bkeys)
        for r in df.select(
            "vec_id", _band_keys(F.col("embedding"), bits).alias("bkeys")
        ).collect()
    }
    assert got == expect


# --- differential: full catalog queries vs DuckDB on RANDOM events ------
#
# The oracle suite proves Spark ≡ DuckDB on the fixture corpus; this
# proves it on arbitrary generated corpora, aimed at the semantics the
# fixture may never exercise: equal-timestamp ties (latest-row dedup,
# as-of matching), events landing exactly ON a 10 s window edge or a
# 60 s session gap, single-user corpora, all-one-type corpora.

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

EVENTS_TABLES = st.lists(
    st.tuples(
        st.integers(0, 3),                    # user_id (small → collisions)
        st.integers(0, 150),                  # seconds offset (10s/60s edges)
        st.sampled_from((0, 1, 500, 999)),    # millis (ties + near-ties)
        st.sampled_from(_EVENT_TYPES),
        st.integers(0, 100),                  # value, quarter units
    ),
    min_size=1,
    max_size=40,
)

_DIFF_QUERIES = (
    "s_dedup_latest",       # per-key latest row under (ts, event_id) ties
    "w_tumble_10s_keyed",   # exact window-edge assignment
    "w_sessionize",         # 60 s gap straddling
    "j_asof_nearest",       # latest view at-or-before each purchase
    "s_daily_unique_users", # per-day distinct under duplicates
)


# derandomized: the differential space is large enough that a random
# seed could surface a NEW edge case mid-CI; exploration runs happen
# here in development, the suite replays a fixed diverse example set
@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=EVENTS_TABLES)
def test_catalog_queries_match_oracle_on_random_events(rows):
    import os
    import shutil
    import tempfile

    import pandas as pd

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.sources import TABLES
    from flink_spark.testing import compare, duck_connect

    base = pd.Timestamp("2024-03-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                base + pd.Timedelta(seconds=s, milliseconds=ms)
                for (_, s, ms, _, _) in rows
            ],
            "user_id": [u for (u, _, _, _, _) in rows],
            "event_type": [t for (_, _, _, t, _) in rows],
            "value": [v / 4.0 for (_, _, _, _, v) in rows],
            "props": ["{}"] * len(rows),
        }
    )
    d = tempfile.mkdtemp()
    try:
        for t in TABLES:  # non-events tables come from the fixture
            if t != "events":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           os.path.join(d, f"{t}.parquet"))
        pdf.to_parquet(os.path.join(d, "events.parquet"), index=False,
                       coerce_timestamps="us")
        spark = _session()
        duck = duck_connect(d)
        qs = all_queries()
        for name in _DIFF_QUERIES:
            errs = compare(spark, duck, qs[name], d)
            assert not errs, f"{name} on random corpus: {errs[:3]}"
            release_persisted()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- differential: text/dedup queries vs DuckDB on RANDOM documents -----
#
# Same harness over generated documents tables, aimed at the text-path
# edges: empty and whitespace-only docs, punctuation-only docs, CJK
# mixed with ascii, exact-duplicate texts across sources, corpora
# smaller than the shingle width (every derived knob at its clamp
# floor).

_DOC_TEXTS = st.sampled_from((
    "",
    "   ",
    ".,!?",
    "the quick brown fox",
    "the quick brown fox",      # planted exact dup
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen",  # > shingle width
    "数据处理学习系统",
    "mixed 数据 ascii 处理 tokens",
    "UPPER lower MiXeD 123",
    "a",
))

DOCS_TABLES = st.lists(
    st.tuples(
        _DOC_TEXTS,
        st.sampled_from(("en", "zh", "de")),
        # src0 is EVAL_SOURCE: random corpora exercise the live
        # eval-set path of the decontamination family too
        st.sampled_from(("srcA", "srcB", "src0")),
    ),
    min_size=1,
    max_size=25,
)

_DOC_DIFF_QUERIES = (
    "t_token_stats",         # tokenizer on empty/punct/CJK
    "t_exact_dedup",         # md5-canonical groups incl. planted dups
    "t_quality_score",       # ratio metrics with zero-length guards
    "t_lang_id",             # n-gram heuristic vs declared lang
    "t_ngram_jaccard_dups",  # shingle join when most docs are too short
    "t_train_val_split",     # hash split determinism on tiny corpora
    "t_decontaminate_fraction",  # integer threshold boundary
    "t_decontaminate_spans",     # overlapping-span position union
    "t_substring_dedup",         # keep-first ordering on planted dups
    "t_context_chunks",          # stride/tail-window arithmetic edges
)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(rows=DOCS_TABLES)
def test_text_queries_match_oracle_on_random_documents(rows):
    import os
    import shutil
    import tempfile

    import pandas as pd

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.sources import TABLES
    from flink_spark.testing import compare, duck_connect

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for (t, _, _) in rows],
            "lang": [lg for (_, lg, _) in rows],
            "source": [s for (_, _, s) in rows],
            "n_chars": [len(t) for (t, _, _) in rows],
        }
    )
    d = tempfile.mkdtemp()
    try:
        for t in TABLES:
            if t != "documents":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           os.path.join(d, f"{t}.parquet"))
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        spark = _session()
        duck = duck_connect(d)
        qs = all_queries()
        for name in _DOC_DIFF_QUERIES:
            errs = compare(spark, duck, qs[name], d)
            assert not errs, f"{name} on random corpus: {errs[:3]}"
            release_persisted()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- differential: embedding queries vs DuckDB on RANDOM vectors --------
#
# The kernel property tests pin numpy ≡ JVM-fold identity; this pins
# full-query Spark ≡ DuckDB on generated corpora, where every derived
# knob (LSH bits, IVF cells) sits at its clamp floor and the corpus
# size is arbitrary — zero vectors, duplicate vectors, negative
# components, single-label corpora.

VEC_TABLES = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from((-1.0, -0.5, 0.0, 0.25, 1.0)),
            min_size=64, max_size=64,
        ),
        st.integers(0, 2),  # label
    ),
    min_size=12,
    max_size=30,
)

_VEC_DIFF_QUERIES = (
    "e_norm_stats",        # zero-vector norms, per-label grouping
    "e_cosine_topk",       # ties in cosine broken by neighbor_id
    "e_ann_lsh_topk",      # derived bits at the clamp floor
    "e_semantic_decontaminate",  # threshold boundary on planted dups
)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(rows=VEC_TABLES)
def test_embedding_queries_match_oracle_on_random_vectors(rows):
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.sources import TABLES
    from flink_spark.testing import compare, duck_connect

    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [v for (v, _) in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([lb for (_, lb) in rows], pa.int32()),
        }
    )
    d = tempfile.mkdtemp()
    try:
        for t in TABLES:
            if t != "embeddings":
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           os.path.join(d, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        spark = _session()
        duck = duck_connect(d)
        qs = all_queries()
        for name in _VEC_DIFF_QUERIES:
            errs = compare(spark, duck, qs[name], d)
            assert not errs, f"{name} on random vectors: {errs[:3]}"
            release_persisted()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_substring_dedup_keeper_formulations_agree(tmp_path):
    """Adversarial hot-gram corpus: one boilerplate span repeated in
    most documents (the Zipfian shape that makes a per-gram keeper
    WINDOW a single straggler task at scale). The min-struct
    formulation must stay oracle-exact — the DuckDB oracle IS the
    keeper-window formulation (ROW_NUMBER over gram), so the compare
    pins the two formulations against each other — and the Spark plan
    must contain no window node on the gram stream."""
    import os

    import duckdb

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.sources import TABLES
    from flink_spark.testing import compare, duck_connect

    con = duckdb.connect()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       tmp_path / f"{t}.parquet")
    # 180 of 200 docs embed the SAME 12-token boilerplate run (every
    # 10-gram inside it is hot); surrounding tokens are unique per doc.
    con.execute(f"""
        COPY (SELECT CAST(i AS BIGINT) AS doc_id,
                     'u' || i || 'a u' || i || 'b ' ||
                     CASE WHEN i % 10 < 9 THEN
                       'terms of service apply to all pages of this '
                       || 'site without exception thanks '
                     ELSE 'fresh unique middle content token run '
                       || 'number ' || i || ' here now ok yes '
                     END || 'u' || i || 'c u' || i || 'd' AS text,
                     'src' || (i % 3) AS source
              FROM range(0, 200) t(i))
        TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
    """)
    spark = _session()
    duck = duck_connect(str(tmp_path))
    import contextlib
    import io

    # every operator whose corpus-multiplicity step was rewritten off
    # a content-keyed window (substring keep-first, chunk multiplicity,
    # token frequency) must stay oracle-exact on the hot corpus AND
    # keep a window-free plan — the window formulation IS each one's
    # DuckDB oracle, so the compare pins the two formulations
    for name in ("t_substring_dedup", "t_chunk_dedup",
                 "t_unigram_lm_score"):
        q = all_queries()[name]
        errs = compare(spark, duck, q, str(tmp_path))
        assert not errs, f"{name} on hot-gram corpus: {errs[:3]}"
        release_persisted()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.fn(spark, str(tmp_path)).explain("formatted")
        assert "Window" not in buf.getvalue(), name
        release_persisted()


def test_hash_quota_heads_equals_rank_window():
    """The two-phase bucket selection must pick EXACTLY the rows the
    per-source rank window would, at every quota shape: 0%, 100%,
    boundary-splitting percentages, a dominant source (the straggler
    case the rewrite exists for), and single-row sources."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_spark.plans.textops import _mix_priority, hash_quota_heads

    spark = _session()
    rows = (
        [(i, "big") for i in range(5000)]
        + [(10_000 + i, "mid") for i in range(137)]
        + [(20_000, "one")]
        + [(30_000 + i, "none") for i in range(50)]
        + [(40_000 + i, "all") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    pct = {"big": 37, "mid": 61, "one": 99, "none": 0, "all": 100}

    w = Window.partitionBy("source").orderBy(
        _mix_priority("doc_id"), F.col("doc_id")
    )
    n_w = Window.partitionBy("source")
    ranked = df.select(
        "source", "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).collect()
    want = {
        (r.source, r.doc_id)
        for r in ranked
        if r.rn <= (pct[r.source] * r.n) // 100
    }

    # both selection paths must pick the identical set: the default
    # (every boundary bucket under MIX_SLIVER_MAX → refinement count
    # skipped, whole bucket windowed) and the forced phase-2 path
    import flink_spark.plans.textops as textops

    saved = textops.MIX_SLIVER_MAX
    try:
        for sliver_max in (saved, 0):
            textops.MIX_SLIVER_MAX = sliver_max
            sel, stats = hash_quota_heads(df, pct, 50)
            got = {(r.source, r.doc_id) for r in sel.collect()}
            assert got == want, f"MIX_SLIVER_MAX={sliver_max}"
            assert stats["big"] == (5000, 1850) and stats["none"] == (50, 0)
            assert stats["all"] == (50, 50) and stats["one"] == (1, 0)
    finally:
        textops.MIX_SLIVER_MAX = saved


def test_grouped_topk_equals_single_window():
    """grouped_topk must equal the single-window ROW_NUMBER form for
    any slicing: a dominant group spread across many input partitions
    (the straggler case), heavy ties resolved by the tiebreak, groups
    smaller than k, and k=1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_spark.plans.topk import grouped_topk

    spark = _session()
    rows = (
        [(i, "hot", float(i % 7)) for i in range(4000)]   # heavy ties
        + [(10_000 + i, "mid", float(i)) for i in range(37)]
        + [(20_000, "tiny", 1.0)]
    )
    df = spark.createDataFrame(
        rows, "id long, g string, v double"
    ).repartition(16)  # dominant group spans every slice

    for k in (1, 5, 50):
        got = sorted(
            tuple(r)
            for r in grouped_topk(
                df, ["g"], [F.desc("v"), "id"], k
            ).collect()
        )
        w = Window.partitionBy("g").orderBy(F.desc("v"), "id")
        want = sorted(
            tuple(r)
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        )
        assert got == want, k
