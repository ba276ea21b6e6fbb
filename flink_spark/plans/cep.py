"""Generalized sequence-pattern (CEP) evaluation — batch form.

The reference uses Flink CEP's general ``Pattern`` API — e.g.
``Pattern.begin("first").where(cond).next("second").where(cond)
.within(Time.seconds(10))`` with a timeout side-output
(``rt/app/dwd/log/DwdTrafficUserJumpDetail.java:79-119``). Round 4
implemented only that one hard-coded pattern; this module makes the
pattern a VALUE:

- ``SeqPattern``: a strict-contiguity ("next") predicate sequence with
  a ``within`` bound, keyed and totally ordered.
- ``pattern_matches``: the batch evaluator — pure window functions
  (lead offsets), no Python UDFs, SQL-expressible so every pattern
  query keeps a DuckDB oracle.
- ``flink_spark.streaming.cep.pattern_stream``: the streaming evaluator
  (k-step state machine over ``applyInPandasWithState``) with the same
  match/timeout emission contract.

Semantics (mirroring Flink CEP with strict contiguity and the default
every-event-may-start policy):

- every event satisfying step 0 opens a partial match;
- a partial at depth m is EXTENDED by the immediately next event of the
  key iff that event satisfies step m and arrived within ``within_ms``
  of the partial's first event; it is DISCARDED silently if the next
  event is in time but fails the predicate; it TIMES OUT (emitted on
  the timeout side) if the next event is beyond ``within_ms`` or never
  arrives;
- a partial reaching depth k is a MATCH.

Both evaluators emit the pattern's FIRST event (what the reference's
jump job forwards) tagged ``via``: ``'match'`` or ``'timeout'``
(streaming splits timeout into ``'gap'``/``'timeout'`` by how the
expiry was detected; batch cannot and need not distinguish).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class SeqPattern:
    """A predicate sequence with a time bound and a contiguity mode.

    ``steps`` are SQL boolean expressions evaluated per event row (both
    engines understand them, keeping oracles symmetric). ``within_ms``
    bounds last-event-time minus first-event-time of a full match, and
    is also the partial-match expiry horizon — exactly Flink's
    ``Pattern.within``.

    ``contiguity`` selects the step-linking rule (Flink's two main
    modes): ``'next'`` (strict — the immediately following event must
    satisfy the step or the partial dies) or ``'followed_by'``
    (relaxed — irrelevant events are skipped; a partial is extended by
    the EARLIEST later event satisfying the step). Under followed_by a
    partial never dies from a non-matching event, so every start either
    matches or times out.
    """

    steps: tuple[str, ...]
    within_ms: int
    key: str = "user_id"
    ts: str = "ts"
    contiguity: str = "next"

    def __post_init__(self) -> None:
        if len(self.steps) < 1:
            raise ValueError("SeqPattern needs at least one step")
        if self.within_ms <= 0:
            raise ValueError("within_ms must be positive")
        if self.contiguity not in ("next", "followed_by"):
            raise ValueError(
                f"contiguity must be 'next' or 'followed_by', "
                f"got {self.contiguity!r}"
            )


def pattern_matches(
    df: DataFrame, pat: SeqPattern, keep_all: bool = False
) -> DataFrame:
    """Evaluate ``pat`` over a batch event table.

    Returns one row per emission: ``(key, event_id, ms, via)`` where
    ``via`` ∈ {'match', 'timeout'} and ``event_id``/``ms`` identify the
    pattern's first event. One scan, one shuffle (the window partition
    by key); k-1 lead() columns over a single shared sort — the plan a
    hand-written per-pattern query would produce.

    ``keep_all=True`` returns every event row with a nullable ``via``
    instead of filtering, so a caller can fold emission counts AND
    whole-stream totals (e.g. per-key event_ct) in ONE aggregation over
    the same shuffle — no second scan or join.

    Exclusivity: the timeout test at depth m requires the m-prefix
    matched AND the (m+1)-th event late/absent; a full match implies
    every intermediate event was in time, so the two sides never both
    fire for one start event, and only the smallest failing depth can
    emit the timeout.

    ``followed_by`` patterns dispatch to the relaxed-contiguity
    evaluator (``_followed_by_matches``) with the same emission
    contract.
    """
    if pat.contiguity == "followed_by":
        return _followed_by_matches(df, pat, keep_all)
    k = len(pat.steps)
    w = Window.partitionBy(pat.key).orderBy("ms", "event_id")
    ev = df.select(
        pat.key,
        "event_id",
        F.unix_millis(pat.ts).alias("ms"),
        *[F.expr(s).alias(f"s{j}") for j, s in enumerate(pat.steps)],
    )
    ms = F.col("ms")
    cols: list[Column] = []
    prefix = F.col("s0")  # depth-1 partial open at this row
    match = prefix
    timeout = F.lit(False)
    for j in range(1, k):
        lead_ms = F.lead("ms", j).over(w)
        lead_s = F.lead(f"s{j}", j).over(w)
        late_or_absent = lead_ms.isNull() | (lead_ms - ms > pat.within_ms)
        timeout = timeout | (prefix & late_or_absent)
        prefix = prefix & ~late_or_absent & lead_s
        match = prefix
    via = (
        F.when(match, F.lit("match"))
        .when(timeout, F.lit("timeout"))
        .otherwise(F.lit(None))
    )
    cols.append(via.alias("via"))
    out = ev.select(pat.key, "event_id", "ms", *cols)
    return out if keep_all else out.filter(F.col("via").isNotNull())


def _followed_by_matches(
    df: DataFrame, pat: SeqPattern, keep_all: bool = False
) -> DataFrame:
    """Relaxed-contiguity (``followedBy``) batch evaluator.

    Greedy earliest-occurrence chaining: from a start event satisfying
    step 0, step m resolves to the EARLIEST later event of the key
    satisfying its predicate. Greedy is complete here — a later choice
    for step m can only shrink the candidate set for step m+1 — so a
    start matches iff ANY chain completes within ``within_ms``, which
    is Flink's followedBy match-existence semantics. A start that does
    not match times out (relaxed partials never die from irrelevant
    events).

    Plan shape: one window pass computes, per row, the next-occurrence
    position of each step (running ``min`` of a (ms, event_id) struct
    over the FOLLOWING frame — same single shuffle as the strict
    evaluator), then the chain is resolved with k-2 EQUI-joins on
    (key, position) — hash joins on unique keys, no range join, no
    explosion (each position resolves to exactly one row). k=2 needs
    no join at all.
    """
    k = len(pat.steps)
    w = Window.partitionBy(pat.key).orderBy("ms", "event_id")
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    ev = df.select(
        pat.key,
        "event_id",
        F.unix_millis(pat.ts).alias("ms"),
        *[F.expr(s).alias(f"s{j}") for j, s in enumerate(pat.steps)],
    )
    base = ev.select(
        pat.key, "event_id", "ms", "s0",
        *[
            F.min(F.when(F.col(f"s{m}"), F.struct("ms", "event_id")))
            .over(wf)
            .alias(f"nxt{m}")
            for m in range(1, k)
        ],
    )
    if k == 1:
        via = F.when(F.col("s0"), F.lit("match")).otherwise(F.lit(None))
        out = base.select(pat.key, "event_id", "ms", via.alias("via"))
        return out if keep_all else out.filter(F.col("via").isNotNull())

    if k > 2:
        # the chain joins re-scan base k-2 times — materialize the
        # window pass once instead of recomputing it per join level
        from flink_spark.registry import track_persist

        base = track_persist(base)
    cur = base.select(
        pat.key, "event_id", "ms", "s0", F.col("nxt1").alias("_pos")
    )
    for m in range(1, k - 1):
        rhs = base.select(
            F.col(pat.key).alias("_rk"),
            F.struct("ms", "event_id").alias("_rpos"),
            F.col(f"nxt{m + 1}").alias("_follow"),
        )
        cur = (
            cur.join(
                rhs,
                (F.col(pat.key) == F.col("_rk"))
                & (F.col("_pos") == F.col("_rpos")),
                "left",
            )
            .drop("_rk", "_rpos", "_pos")
            .withColumnRenamed("_follow", "_pos")
        )
    match = (
        F.col("s0")
        & F.col("_pos").isNotNull()
        & (F.col("_pos.ms") - F.col("ms") <= pat.within_ms)
    )
    via = (
        F.when(match, F.lit("match"))
        .when(F.col("s0"), F.lit("timeout"))
        .otherwise(F.lit(None))
    )
    out = cur.select(pat.key, "event_id", "ms", via.alias("via"))
    return out if keep_all else out.filter(F.col("via").isNotNull())


def pattern_oracle_sql(pat: SeqPattern, *, agg: str, alias: str = "emit_ct") -> str:
    """DuckDB oracle for a 2-step pattern's per-key emission counts.

    Handwritten-lead SQL mirroring ``pattern_matches`` for k=2 (the
    reference's pattern arity); ``agg`` picks 'match' or 'timeout'
    counting. Longer patterns compose more lead() columns the same way.
    """
    if len(pat.steps) != 2:
        raise ValueError("oracle helper covers the 2-step form")
    if pat.contiguity != "next":
        raise ValueError(
            "oracle helper emits strict-contiguity (lead) SQL; followed_by "
            "patterns need a next-occurrence chain oracle (see "
            "s_cep_funnel_skip for the hand-written form)"
        )
    if agg not in ("match", "timeout"):
        raise ValueError(f"agg must be 'match' or 'timeout', got {agg!r}")
    s0, s1 = pat.steps
    # next_ok is NULL for a key's last event (no successor): a timeout
    # by "never arrives" — COALESCE so the NULL counts on the timeout
    # side and never on the match side.
    side = (
        "s0_here AND COALESCE(next_ok, FALSE) AND COALESCE(next_s1, FALSE)"
        if agg == "match"
        else "s0_here AND NOT COALESCE(next_ok, FALSE)"
    )
    return f"""
    WITH seq AS (
      SELECT {pat.key}, event_id, epoch_ms({pat.ts}) AS ms,
             lead(epoch_ms({pat.ts})) OVER w - epoch_ms({pat.ts})
                 <= {pat.within_ms} AS next_ok,
             lead(({s1})) OVER w AS next_s1,
             ({s0}) AS s0_here
      FROM events
      WINDOW w AS (PARTITION BY {pat.key}
                   ORDER BY epoch_ms({pat.ts}), event_id)
    )
    SELECT {pat.key},
           CAST(SUM(CASE WHEN {side}
                         THEN 1 ELSE 0 END) AS BIGINT) AS {alias},
           COUNT(*) AS event_ct
    FROM seq
    GROUP BY {pat.key}
    """
