"""Generalized sequence-pattern (CEP) evaluation — streaming form.

Streaming counterpart of ``flink_spark.plans.cep.pattern_matches``:
the same ``SeqPattern`` value drives a k-step state machine over
``applyInPandasWithState`` with event-time timers, replacing round 4's
hard-coded jump detector (reference pattern API:
``rt/app/dwd/log/DwdTrafficUserJumpDetail.java:79-119``).

Design notes for scale:

- Step predicates are evaluated JVM-side (one boolean array column per
  row) BEFORE the stateful op — the Python state function never
  re-parses predicates, it just reads bit flags.
- Strict contiguity bounds state: an open partial must be extended by
  the very next event of its key or die, so at most k-1 partials are
  open per key at any moment (plus the per-key timer). State size is
  O(k), independent of event volume.
- Emission contract matches the batch evaluator: the pattern's first
  event, tagged ``via`` — ``'match'``, ``'gap'`` (expiry detected by a
  late successor's arrival) or ``'timeout'`` (expiry detected by the
  event-time timer). Batch folds gap∪timeout into 'timeout'.

Sentinel/flush rows (``event_id < 0``, injected by test harnesses to
advance watermarks) participate in time maths — their arrival can
expire partials — but never open a partial and are never emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from flink_spark.plans.cep import SeqPattern

_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ms", T.LongType()),
        T.StructField("via", T.StringType()),
    ]
)
# open partials, parallel arrays (≤ k-1 entries, see module docstring)
_STATE = T.StructType(
    [
        T.StructField("start_event", T.ArrayType(T.LongType())),
        T.StructField("start_ms", T.ArrayType(T.LongType())),
        T.StructField("depth", T.ArrayType(T.IntegerType())),
    ]
)


def pattern_stream(
    sdf: DataFrame, pat: SeqPattern, watermark: str = "2 seconds"
) -> DataFrame:
    """Evaluate ``pat`` over an event stream; append-mode emissions.

    Output schema: ``(user_id, event_id, ms, via)`` — the first event
    of each completed or timed-out partial. Equivalence to the batch
    evaluator (once every key's state is flushed):
    match rows ≡ batch ``via='match'``; gap∪timeout ≡ ``'timeout'``.
    """
    k = len(pat.steps)
    within = pat.within_ms
    # strict ('next'): a non-matching successor kills the partial, so
    # ≤ k-1 partials live per key. relaxed ('followed_by'): irrelevant
    # events are skipped, so every start stays open until it matches
    # or its within-horizon passes — state is O(starts per horizon),
    # bounded by the watermark, not by k.
    strict = pat.contiguity == "next"

    def fn(key, pdfs, state):
        import pandas as pd

        out = []

        def emit(se, sm, via):
            if se >= 0:  # sentinels advance time but are never emitted
                out.append((key[0], se, sm, via))

        partials: list[tuple[int, int, int]] = []
        if state.exists:
            ses, sms, ds = state.get
            partials = list(zip(ses, sms, ds))

        if state.hasTimedOut:
            wm = state.getCurrentWatermarkMs()
            live = []
            for se, sm, d in partials:
                if wm > sm + within:
                    emit(se, sm, "timeout")
                else:
                    live.append((se, sm, d))
            partials = live
        else:
            rows = pd.concat(list(pdfs)).sort_values(["ms", "event_id"])
            for r in rows.itertuples(index=False):
                flags = [bool(f) for f in r.flags]  # NULLs coalesced JVM-side
                ms = int(r.ms)
                ev = int(r.event_id)
                sentinel = ev < 0
                nxt: list[tuple[int, int, int]] = []
                for se, sm, d in partials:
                    if ms - sm > within:
                        # successor arrived past the horizon: the
                        # partial had already expired — timeout side,
                        # detected by arrival rather than timer
                        emit(se, sm, "gap")
                    elif sentinel:
                        # flush rows advance time only: they neither
                        # extend a partial nor break strict contiguity
                        nxt.append((se, sm, d))
                    elif flags[d]:
                        if d + 1 == k:
                            emit(se, sm, "match")
                        else:
                            nxt.append((se, sm, d + 1))
                    elif not strict:
                        # followed_by: an irrelevant event is skipped,
                        # the partial stays open at the same depth
                        nxt.append((se, sm, d))
                    # else (strict): in time but predicate failed —
                    # dead, silent
                partials = nxt
                if not sentinel and flags[0]:
                    if k == 1:
                        emit(ev, ms, "match")
                    else:
                        partials.append((ev, ms, 1))

        if partials:
            state.update(
                (
                    [p[0] for p in partials],
                    [p[1] for p in partials],
                    [p[2] for p in partials],
                )
            )
            wm = state.getCurrentWatermarkMs()
            horizon = min(p[1] for p in partials) + within
            # timer must be strictly ahead of the current watermark
            state.setTimeoutTimestamp(max(horizon, wm + 1))
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ms", "via"])

    prepared = sdf.withWatermark(pat.ts, watermark).select(
        pat.ts,
        F.col(pat.key).alias("user_id"),
        "event_id",
        F.unix_millis(pat.ts).alias("ms"),
        F.array(
            # NULL predicate results (e.g. on sentinel rows with NULL
            # attributes) mean "did not match", never "maybe" — coalesce
            # JVM-side so the state fn sees clean booleans
            *[
                F.coalesce(F.expr(s).cast("boolean"), F.lit(False))
                for s in pat.steps
            ]
        ).alias("flags"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, _OUT, _STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
