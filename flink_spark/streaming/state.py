"""Keyed-state streaming operators via ``applyInPandasWithState``.

Covers the reference's RichFunction/ValueState/CEP family:

- W5 keyed ValueState + daily expiry → ``daily_unique_stream``
  (rt/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:69-98: ValueState
  holding last-seen date, 1-day TTL — here the state is *just* the
  last date string, so TTL is implicit in the date-rollover test)
- W6/W8 timers + CEP-with-timeout → ``cep_jump_stream``
  (rt/app/dwd/log/DwdTrafficUserJumpDetail.java:79-119: pattern
  "session start ``next`` session start ``within 10 s``", timeout
  side-output unioned with matches)
- F4 rich stateful map/filter — both of the above are its Spark shape.

Batch truth: ``flink_spark.plans.state`` (``s_daily_unique_users``,
``s_cep_jump``) — stream-batch equivalence is asserted in tests.

Scale notes: state per key is O(1) (a date string / one event tuple),
keys partition by hash across executors, and the watermark bounds both
state lifetime and timer firing — the same properties the reference
gets from keyed ValueState + TTL + event-time timers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

_DAILY_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("date_id", T.StringType()),
    ]
)
_DAILY_STATE = T.StructType([T.StructField("last_date", T.StringType())])


def daily_unique_stream(sdf: DataFrame, watermark: str = "2 seconds") -> DataFrame:
    """Emit (user_id, date_id) on each user's first event of a day.

    ValueState = last-seen date only; a row is emitted when its date
    is *later* than the stored one (events arrive per-key in event-time
    order from the replay/Kafka source). Downstream ``groupBy(date_id)
    .count()`` equals batch ``s_daily_unique_users``.
    """

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for d in pdf["ts"].dt.strftime("%Y-%m-%d"):
                if last is None or d > last:
                    out.append((key[0], d))
                    last = d
        state.update((last,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "date_id"])

    return (
        sdf.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _DAILY_OUT, _DAILY_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


_RETURNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("date_id", T.StringType()),
        T.StructField("is_back", T.IntegerType()),
    ]
)
_RETURNING_STATE = T.StructType([T.StructField("last_date", T.StringType())])


def returning_users_stream(sdf: DataFrame, watermark: str = "2 seconds") -> DataFrame:
    """7-day "back-flow" returning-user detection per login day.

    (rt/app/dws/DwsUserUserLoginWindow.java:111-117): keyed ValueState
    holds each user's last active date; on the first event of a new
    day the user counts as active, and as "back" when the gap since
    the stored date exceeds 7 days. (The reference's expression has a
    precedence bug at :114 — division binds before subtraction; we
    implement the intended days-between > 7, as documented in
    SURVEY.md §7.2(5).) Downstream ``groupBy(date_id).agg(count,
    sum(is_back))`` equals batch ``s_returning_users_7d``.
    """

    def fn(key, pdfs, state):
        from datetime import date

        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for d in pdf["ts"].dt.strftime("%Y-%m-%d"):
                if last is None or d > last:
                    back = (
                        1
                        if last is not None
                        and (date.fromisoformat(d) - date.fromisoformat(last)).days > 7
                        else 0
                    )
                    out.append((key[0], d, back))
                    last = d
        state.update((last,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "date_id", "is_back"])

    return (
        sdf.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _RETURNING_OUT, _RETURNING_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


_VISITOR_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("date_id", T.StringType()),
        T.StructField("is_new", T.IntegerType()),
    ]
)
_VISITOR_STATE = T.StructType([T.StructField("first_date", T.StringType())])


def is_new_correction_stream(sdf: DataFrame, watermark: str = "2 seconds") -> DataFrame:
    """A7 — new/old-visitor flag correction state machine.

    (rt/app/dwd/log/BaseLogApp.java:71-108): the client-reported
    ``is_new`` flag lies after reinstalls; the keyed state holds the
    first date each key was seen and rewrites the flag — 1 only on
    events of the key's first-ever day, 0 afterwards. Batch truth:
    ``s_new_vs_returning`` (a user is new only on min(date)).
    """

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        first = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            dates = pdf["ts"].dt.strftime("%Y-%m-%d")
            for eid, d in zip(pdf["event_id"], dates):
                if first is None:
                    first = d
                out.append((key[0], int(eid), d, 1 if d == first else 0))
        state.update((first,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "date_id", "is_new"]
            )

    return (
        sdf.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _VISITOR_OUT, _VISITOR_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


def cep_jump_stream(
    sdf: DataFrame, gap_ms: int = 10_000, watermark: str = "2 seconds"
) -> DataFrame:
    """Per-key jump detection: event with no successor within 10 s.

    Round 5: a declaration over the generalized pattern evaluator
    (``flink_spark.streaming.cep.pattern_stream``) instead of a
    bespoke state machine — the jump is the non-match side of the
    trivial two-step pattern. Two emission paths survive, exactly the
    reference's CEP match ∪ timeout union:

    - ``via='gap'``     — a newer event arrived more than ``gap_ms``
      later, so the stored event is a jump (the PatternSelect path);
    - ``via='timeout'`` — the event-time timer fired because the
      watermark passed stored_ms + gap_ms with no successor (the
      OutputTag timeout path).

    Sentinel/flush rows (event_id < 0) advance state but are never
    emitted. Equivalence: count of emitted rows per user equals batch
    ``s_cep_jump.jump_ct`` once every key's state is flushed.
    """
    from flink_spark.plans.cep import SeqPattern
    from flink_spark.streaming.cep import pattern_stream

    pat = SeqPattern(steps=("true", "true"), within_ms=gap_ms)
    return pattern_stream(sdf, pat, watermark).filter(F.col("via") != "match")


_ASOF_OUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("lag_us", T.LongType()),
    ]
)
_ASOF_STATE = T.StructType(
    [
        T.StructField("max_old", T.LongType()),
        T.StructField("recent", T.ArrayType(T.LongType())),
    ]
)


def asof_stream(
    sdf: DataFrame,
    watermark: str = "2 seconds",
    disorder_us: int = 2_000_000,
) -> DataFrame:
    """Streaming as-of join: purchases enriched with the latest prior view.

    The streaming form of ``j_asof_nearest``. Per-user state is a
    collapsed running max of views older than the disorder horizon
    plus a small buffer of views inside it — NOT the whole view
    history a generic stream-stream join would keep. The buffer is
    what makes bounded out-of-order arrival correct: a purchase that
    arrives late (but inside the watermark, so Spark admits it) may
    need a view timestamp SMALLER than the newest one seen; the
    buffer still holds every view within ``disorder_us`` of the
    user's max event time, and anything older is ≤ the late
    purchase's timestamp (the watermark guarantees ``p.us ≥
    global_max − delay ≥ user_max − disorder``), so the collapsed max
    is a valid candidate. ``disorder_us`` must therefore be ≥ the
    watermark delay — the default matches the default watermark.

    Within a batch, chunks are concatenated and sorted before
    processing (Arrow may deliver one group as several chunks in
    shuffle order). Ties (view at the exact purchase microsecond)
    count as prior — same rule as the batch window sort (tag 0
    before 1).
    """

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        max_old, recent = (
            (state.get[0], list(state.get[1])) if state.exists else (None, [])
        )
        chunks = [pdf for pdf in pdfs]
        if not chunks:  # pragma: no cover - NoTimeout keys always carry data
            return
        pdf = (
            pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ).sort_values(["us", "tag", "event_id"])
        out = []
        for r in pdf.itertuples(index=False):
            if r.tag == 0:
                recent.append(r.us)
            else:
                # late purchase: pick the newest view at-or-before it —
                # the buffer covers everything the horizon hasn't
                # collapsed; max_old is ≤ any admissible purchase time
                cands = [v for v in recent if v <= r.us]
                if max_old is not None:
                    cands.append(max_old)
                if cands:
                    best = max(cands)
                    out.append((r.event_id, key[0], r.us, best, r.us - best))
        hi = max(recent, default=max_old)
        if hi is not None:
            floor = hi - disorder_us
            older = [v for v in recent if v < floor]
            if older:
                fold = max(older)
                max_old = fold if max_old is None else max(max_old, fold)
                recent = [v for v in recent if v >= floor]
        state.update((max_old, recent))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "user_id", "purchase_us", "view_us", "lag_us"
                ],
            )

    ev = sdf.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "purchase").cast("int").alias("tag"),
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _ASOF_OUT, _ASOF_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )
