"""Generalized CEP evaluator: batch semantics + stream-batch equivalence.

The reference's CEP surface is Flink's Pattern API
(rt/app/dwd/log/DwdTrafficUserJumpDetail.java:79-119). These tests pin
the SeqPattern evaluator's semantics beyond the single jump pattern:
a 3-step pattern with hand-computed expected emissions, and streaming
equivalence for the second registered pattern (browse→buy).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flink_spark.plans.cep import SeqPattern, pattern_matches
from flink_spark.plans.state import BROWSE_BUY_PATTERN
from flink_spark.sources import load
from flink_spark.streaming import pattern_stream, replay_events, run_to_memory

from conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _t(sec: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=sec)


def test_three_step_pattern_hand_computed(spark):
    """a `next` b `next` c within 10 s — every emission hand-derived."""
    rows = [
        # user 1: clean a→b→c match (start id 1)
        (1, 1, _t(0), "a"),
        (1, 2, _t(1), "b"),
        (1, 3, _t(2), "c"),
        # user 1: a→b then c arrives past the horizon → timeout at id 4
        (1, 4, _t(20), "a"),
        (1, 5, _t(21), "b"),
        (1, 6, _t(40), "c"),
        # user 2: a then wrong successor in time → dead, silent
        (2, 7, _t(0), "a"),
        (2, 8, _t(1), "x"),
        # user 2: a with no successor at all → timeout at id 9
        (2, 9, _t(30), "a"),
        # user 3: overlapping starts — first 'a' killed by second 'a'
        # (strict contiguity), second completes through b, c
        (3, 10, _t(0), "a"),
        (3, 11, _t(1), "a"),
        (3, 12, _t(2), "b"),
        (3, 13, _t(3), "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    pat = SeqPattern(
        steps=(
            "event_type = 'a'",
            "event_type = 'b'",
            "event_type = 'c'",
        ),
        within_ms=10_000,
    )
    got = {
        (r.user_id, r.event_id): r.via
        for r in pattern_matches(df, pat).collect()
    }
    assert got == {
        (1, 1): "match",
        (1, 4): "timeout",
        (2, 9): "timeout",
        (3, 11): "match",
    }


def test_pattern_stream_browse_buy_equals_batch(spark, tmp_path):
    """Streaming SeqPattern ≡ batch, at event-id granularity.

    Sentinels on a third of the users exercise the arrival-detected
    expiry ('gap'); the rest flush through the event-time timer (the
    sentinels advance the global watermark for everyone).
    """
    users = [
        r.user_id
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    ]
    sentinels = tuple(u for u in users if u % 3 == 0)
    sdf = replay_events(
        spark, SF_DIR, str(tmp_path / "replay"), slices=5,
        sentinel_users=sentinels,
    )
    out = run_to_memory(pattern_stream(sdf, BROWSE_BUY_PATTERN), "bb_mem")
    batch = pattern_matches(load(spark, SF_DIR, "events"), BROWSE_BUY_PATTERN)

    cols = ["user_id", "event_id", "ms"]
    assert _rows(out.filter(F.col("via") == "match").select(*cols)) == _rows(
        batch.filter(F.col("via") == "match").select(*cols)
    )
    # stream splits the timeout side by detection path; batch cannot
    assert _rows(out.filter(F.col("via") != "match").select(*cols)) == _rows(
        batch.filter(F.col("via") == "timeout").select(*cols)
    )


def test_pattern_matches_single_shuffle_plan(spark):
    """The batch evaluator must stay one key-partitioned shuffle: the
    window's lead() offsets AND the downstream per-key aggregation
    reuse the same user_id partitioning — no second exchange, no join."""
    import contextlib
    import io

    from flink_spark.registry import all_queries

    df = all_queries()["s_cep_browse_buy"].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("(1) ")[0]
    assert tree.count("Exchange") == 1
    assert "Window" in tree
    for node in ("Join", "CartesianProduct", "BatchEvalPython"):
        assert node not in tree, node


def test_pattern_stream_three_step_both_flush_paths(spark, tmp_path):
    """Streaming k=3: depth-2 partial tracking, with each expiry
    detection path pinned — 'gap' when a late successor arrives (user
    1), 'timeout' when only the watermark passes the horizon (user 2,
    whose key sees no further rows; the sentinel advances the GLOBAL
    watermark)."""
    import pandas as pd

    rows = [
        (1, 1, _t(0), "a"), (1, 2, _t(1), "b"), (1, 3, _t(2), "c"),
        (1, 4, _t(20), "a"), (1, 5, _t(21), "b"), (1, 6, _t(40), "c"),
        (2, 7, _t(0), "a"), (2, 8, _t(1), "x"),
        (2, 9, _t(30), "a"),
        (3, 10, _t(0), "a"), (3, 11, _t(1), "a"),
        (3, 12, _t(2), "b"), (3, 13, _t(3), "c"),
    ]
    sentinel = [(1, -1, _t(300), "flush")]
    src = tmp_path / "stream"
    src.mkdir()
    cols = ["user_id", "event_id", "ts", "event_type"]
    pd.DataFrame(rows[:6], columns=cols).to_parquet(
        src / "0000.parquet", index=False, coerce_timestamps="us")
    pd.DataFrame(rows[6:], columns=cols).to_parquet(
        src / "0001.parquet", index=False, coerce_timestamps="us")
    pd.DataFrame(sentinel, columns=cols).to_parquet(
        src / "0002.parquet", index=False, coerce_timestamps="us")

    pat = SeqPattern(
        steps=("event_type = 'a'", "event_type = 'b'", "event_type = 'c'"),
        within_ms=10_000,
    )
    sdf = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_to_memory(pattern_stream(sdf, pat), "cep3_mem")
    got = {(r.user_id, r.event_id): r.via for r in out.collect()}
    assert got == {
        (1, 1): "match",
        (1, 4): "gap",       # expiry seen when the t=40 'c' arrived
        (2, 9): "timeout",   # no successor ever: event-time timer
        (3, 11): "match",
    }


def test_followed_by_hand_computed(spark):
    """a ⤳ b ⤳ c (followedBy, within 10 s) — noise between steps must
    be skipped, not kill the partial; every emission hand-derived."""
    rows = [
        # user 1: a .. x .. b .. y .. c — matches THROUGH the noise
        (1, 1, _t(0), "a"),
        (1, 2, _t(1), "x"),
        (1, 3, _t(2), "b"),
        (1, 4, _t(3), "y"),
        (1, 5, _t(4), "c"),
        # user 2: a, b in time, c past the horizon → timeout (start 6)
        (2, 6, _t(0), "a"),
        (2, 7, _t(1), "b"),
        (2, 8, _t(20), "c"),
        # user 3: a with b but never a c → timeout (start 9)
        (3, 9, _t(0), "a"),
        (3, 10, _t(1), "b"),
        # user 4: two starts share the same greedy b and c — both match
        (4, 11, _t(0), "a"),
        (4, 12, _t(1), "a"),
        (4, 13, _t(2), "b"),
        (4, 14, _t(3), "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    pat = SeqPattern(
        steps=("event_type = 'a'", "event_type = 'b'", "event_type = 'c'"),
        within_ms=10_000,
        contiguity="followed_by",
    )
    got = {
        (r.user_id, r.event_id): r.via
        for r in pattern_matches(df, pat).collect()
    }
    assert got == {
        (1, 1): "match",
        (2, 6): "timeout",
        (3, 9): "timeout",
        (4, 11): "match",
        (4, 12): "match",
    }


def test_pattern_stream_followed_by_equals_batch(spark, tmp_path):
    """Streaming relaxed-contiguity state machine ≡ batch greedy
    evaluator on the funnel pattern, at event-id granularity."""
    from flink_spark.plans.state import FUNNEL_PATTERN

    users = [
        r.user_id
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    ]
    sentinels = tuple(u for u in users if u % 3 == 0)
    sdf = replay_events(
        spark, SF_DIR, str(tmp_path / "replay"), slices=5,
        sentinel_users=sentinels,
    )
    out = run_to_memory(pattern_stream(sdf, FUNNEL_PATTERN), "fb_mem")
    batch = pattern_matches(load(spark, SF_DIR, "events"), FUNNEL_PATTERN)

    cols = ["user_id", "event_id", "ms"]
    assert _rows(out.filter(F.col("via") == "match").select(*cols)) == _rows(
        batch.filter(F.col("via") == "match").select(*cols)
    )
    assert _rows(out.filter(F.col("via") != "match").select(*cols)) == _rows(
        batch.filter(F.col("via") == "timeout").select(*cols)
    )
