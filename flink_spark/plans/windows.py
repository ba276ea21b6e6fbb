"""Tumbling event-time window aggregates (SURVEY.md §2.5 A1-A4, §2.10 W3).

Every DWS job in the reference aggregates on 10-second tumbling
event-time windows with the window bounds stamped as ``stt``/``edt``
strings (e.g. rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:138-179).
In Spark ``window(ts, '10 seconds')`` gives the same epoch-aligned
buckets; ``window.start/end`` replace the WindowFunction finisher.

Batch and streaming share these formulations: the streaming variants in
``flink_spark.streaming`` add ``withWatermark`` and produce identical
final tables (stream-batch equivalence is tested in tests/).

Oracle note: DuckDB reproduces the bucketing with
``make_timestamp((epoch_ms(ts)//10000)*10000000)`` — epoch-ms floor to
10 s, built as a naive timestamp (never tz-converted on either side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.functions.scalar import dsum
from flink_spark.functions.text import toks_sql
from flink_spark.registry import query
from flink_spark.sources import load

# CJK-aware DuckDB tokenizer mirror (shared with plans/textops.py)
_TOKS_SQL = toks_sql("text")

# DuckDB expressions for 10s-tumble bounds formatted to seconds
_STT = "strftime(make_timestamp((epoch_ms(ts)//10000)*10000000), '%Y-%m-%d %H:%M:%S')"
_EDT = (
    "strftime(make_timestamp((epoch_ms(ts)//10000)*10000000 + 10000000),"
    " '%Y-%m-%d %H:%M:%S')"
)


def _windowed(df: DataFrame, *keys: str) -> DataFrame:
    """Group by 10s tumble (+ optional keys), stamping stt/edt strings."""
    grouped = df.groupBy(F.window("ts", "10 seconds"), *keys)
    return grouped


def _stamp(df: DataFrame) -> list[F.Column]:
    return [
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("stt"),
        F.date_format(F.col("window.end"), "yyyy-MM-dd HH:mm:ss").alias("edt"),
    ]


@query(
    "w_tumble_10s_keyed",
    oracle=f"""
    SELECT {_STT} AS stt, {_EDT} AS edt, event_type,
           COUNT(*) AS pv,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("window",),
)
def w_tumble_10s_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed 10 s tumbling window: count + exact sum per key.

    Covers A1 keyed tumble reduce + window-metadata finisher
    (rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:128-179) and A3
    SQL TUMBLE (rt/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:69-79).
    """
    ev = load(spark, sf_dir, "events")
    out = _windowed(ev, "event_type").agg(
        F.count(F.lit(1)).alias("pv"), dsum("value", "amount")
    )
    return out.select(*_stamp(out), "event_type", "pv", "amount")


@query(
    "w_tumble_10s_global",
    oracle=f"""
    SELECT {_STT} AS stt, {_EDT} AS edt,
           COUNT(*) AS pv,
           COUNT(DISTINCT user_id) AS uv,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window",),
)
def w_tumble_10s_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (non-keyed) 10 s tumbling window totals.

    Covers A2 windowAll reduce (rt/app/dws/DwsTradeOrderWindow.java:126-145
    and 5 sibling jobs). In Spark this is just a groupBy(window) — the
    single-slot bottleneck of windowAll disappears (partial aggregation
    is map-side; only one row per window crosses the shuffle).
    """
    ev = load(spark, sf_dir, "events")
    out = _windowed(ev).agg(
        F.count(F.lit(1)).alias("pv"),
        F.countDistinct("user_id").alias("uv"),
        dsum("value", "amount"),
    )
    return out.select(*_stamp(out), "pv", "uv", "amount")


@query(
    "w_event_time_fallback",
    oracle="""
    WITH et AS (
      SELECT coalesce(
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
                    THEN NULL ELSE ts END,
               date_trunc('hour', ts)) AS evt,
             user_id
      FROM events
    )
    SELECT strftime(make_timestamp((epoch_ms(evt)//10000)*10000000),
                    '%Y-%m-%d %H:%M:%S') AS stt,
           COUNT(*) AS pv
    FROM et GROUP BY 1
    """,
    tags=("window", "event-time"),
)
def w_event_time_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time extraction with a fallback chain (W2).

    Covers the reference's ``operate_time ?? create_time`` pattern
    (rt/app/dws/DwsTradeCartAddUuWindow.java:62-72 and
    DwsTradePaymentSucWindow.java:73-78): the primary event-time field
    can be absent (here: nulled for k%3==0 rows), and the coarser
    fallback timestamp buckets the row instead. ``coalesce`` keeps the
    whole chain inside codegen.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    primary = F.when(k % 3 == 0, F.lit(None)).otherwise(F.col("ts"))
    evt = F.coalesce(primary, F.date_trunc("hour", F.col("ts")))
    out = ev.select(evt.alias("evt")).groupBy(
        F.window("evt", "10 seconds")
    ).agg(F.count(F.lit(1)).alias("pv"))
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"), "pv"
    )


KEYWORDS = ("table", "query", "spark", "data", "join")
_KW_LIST = "(" + ", ".join(f"'{w}'" for w in KEYWORDS) + ")"


@query(
    "w_keyword_tumble",
    oracle=f"""
    WITH logs AS (
      SELECT e.ts, d.text
      FROM events e
      JOIN documents d ON d.doc_id = e.event_id % 500
      WHERE e.event_type = 'view'
    ),
    words AS (
      SELECT ts, unnest(({_TOKS_SQL})[1:5]) AS word
      FROM logs
    )
    SELECT {_STT} AS stt, word, COUNT(*) AS kw_ct
    FROM words
    WHERE word IN {_KW_LIST}
    GROUP BY 1, 2
    """,
    tags=("window", "udtf", "keyword"),
)
def w_keyword_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword counts per 10 s tumble — the reference's full A3+F1 job.

    The exact shape of DwsTrafficSourceKeywordPageViewWindow
    (rt/app/dws/:60-79): filter search views, tokenize the query text
    (F1 UDTF, rt/app/func/SplitFunction.java:12-27), ``LATERAL TABLE``
    → ``explode``, then TUMBLE count per word. ``documents`` plays the
    search-log text joined by id; only the leading 5 tokens count
    (bounded fan-out) and a keyword whitelist keeps output narrow. The
    doc side is broadcast (dims are small); explode happens after the
    join so the shuffle carries one row per view, not per token.
    """
    from flink_spark.functions.text import tokenize

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.slice(tokenize("text"), 1, 5).alias("toks")
    )
    logs = ev.join(
        F.broadcast(docs), docs["doc_id"] == ev["event_id"] % 500
    ).select("ts", "toks")
    words = logs.select("ts", F.explode("toks").alias("word")).filter(
        F.col("word").isin(*KEYWORDS)
    )
    out = words.groupBy(F.window("ts", "10 seconds"), "word").agg(
        F.count(F.lit(1)).alias("kw_ct")
    )
    return out.select(_stamp(out)[0], "word", "kw_ct")


@query(
    "w_agg_distinct_users",
    oracle=f"""
    SELECT {_STT} AS stt, event_type,
           COUNT(DISTINCT user_id) AS user_ct,
           COUNT(*) AS pv
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "distinct"),
)
def w_agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count inside a window group.

    Covers A4 (rt/app/dws/DwsTradeSkuOrderWindow.java:114-172 — order
    count via an accumulated ``Set<String>`` marked @TransientSink;
    rt/bean/TradeSkuOrderBean.java:44-47). Spark's count(distinct)
    expands to a two-stage exact aggregate — no driver-side set.
    """
    ev = load(spark, sf_dir, "events")
    out = _windowed(ev, "event_type").agg(
        F.countDistinct("user_id").alias("user_ct"),
        F.count(F.lit(1)).alias("pv"),
    )
    return out.select(_stamp(out)[0], "event_type", "user_ct", "pv")


@query(
    "w_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    m AS (
      SELECT user_id, us, v,
             CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       >= 60000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    s AS (
      SELECT user_id, us, v,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM m
    )
    SELECT strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(make_timestamp(MAX(us) + 60000000),
                    '%Y-%m-%d %H:%M:%S') AS edt,
           user_id,
           COUNT(*) AS ev_ct,
           CAST(SUM(v) AS DOUBLE) AS amount
    FROM s GROUP BY user_id, sid
    """,
    tags=("window", "session"),
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 60 s inactivity gap.

    The Flink window family the reference never uses but every
    clickstream pipeline eventually needs (Flink
    ``EventTimeSessionWindows.withGap``): consecutive events of one
    user merge into a session while the gap stays under 60 s; a
    quieter-than-60 s pause closes it. ``F.session_window`` is the
    native Spark form — merge condition strictly ``gap < 60 s``,
    window end = last event + gap — and the oracle reproduces exactly
    that with a lag()/cumulative-sum session id at full microsecond
    precision (``epoch_us`` ≡ ``unix_micros``; a ms-truncated mirror
    could mis-split a session whose gap straddles 60 s by <1 ms).

    Scale shape: one hash shuffle on ``user_id`` + an in-partition
    sort — identical cost to any keyed window; sessions never cross
    keys, so there is no global ordering step. The streaming form
    (``streaming/jobs.py::sessionize_stream``) shares this batch
    formulation through stream≡batch equivalence tests.
    """
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy(F.session_window("ts", "60 seconds"), "user_id").agg(
        F.count(F.lit(1)).alias("ev_ct"), dsum("value", "amount")
    )
    return out.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
        "user_id",
        "ev_ct",
        "amount",
    )


# HOP/CUMULATE mirrors: each event lands in a deterministic set of
# epoch-aligned windows; the oracles rebuild that set with unnest()
# over integer offsets — pure integer bucket arithmetic on epoch_ms.
_HOP_STT = (
    "strftime(make_timestamp(((epoch_ms(ts)//10000)*10000 - i*10000) * 1000),"
    " '%Y-%m-%d %H:%M:%S')"
)


@query(
    "w_hop_windows",
    oracle=f"""
    WITH hops AS (
      SELECT ts, event_type, value, unnest([0, 1, 2]) AS i FROM events
    )
    SELECT {_HOP_STT} AS stt, event_type,
           COUNT(*) AS pv,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM hops
    GROUP BY 1, 2
    """,
    tags=("window", "hop"),
)
def w_hop_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (HOP) windows: 30 s length, 10 s slide, keyed counts.

    Flink's ``HOP(..., INTERVAL '10' SECOND, INTERVAL '30' SECOND)``
    TVF — each event contributes to length/slide = 3 overlapping
    epoch-aligned windows. Spark's ``window(ts, '30 seconds',
    '10 seconds')`` expands the same 3 assignments inside codegen
    (no self-join, no UDF); the oracle unnests offsets [0,1,2] and
    floors each to its window start. Fan-out is the fixed factor 3 —
    at 100 TB the shuffle carries 3× rows, which is the price of HOP
    semantics in ANY engine; partial aggregation still collapses
    map-side before the exchange.
    """
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy(
        F.window("ts", "30 seconds", "10 seconds"), "event_type"
    ).agg(F.count(F.lit(1)).alias("pv"), dsum("value", "amount"))
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        "pv",
        "amount",
    )


@query(
    "w_cumulate_windows",
    oracle="""
    WITH steps AS (
      SELECT ts, user_id, unnest([1, 2, 3, 4]) AS k FROM events
    ),
    w AS (
      SELECT (epoch_ms(ts)//60000)*60000 AS start_ms,
             (epoch_ms(ts)//60000)*60000 + k*15000 AS end_ms,
             epoch_ms(ts) AS ms, user_id
      FROM steps
    )
    SELECT strftime(make_timestamp(start_ms*1000), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(make_timestamp(end_ms*1000), '%Y-%m-%d %H:%M:%S') AS edt,
           COUNT(*) AS pv,
           COUNT(DISTINCT user_id) AS uv
    FROM w
    WHERE ms < end_ms
    GROUP BY 1, 2
    """,
    tags=("window", "cumulate"),
)
def w_cumulate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE windows: 60 s cycle emitting expanding 15/30/45/60 s totals.

    Flink's ``CUMULATE(..., INTERVAL '15' SECOND, INTERVAL '1' MINUTE)``
    TVF — the "running totals within the hour" dashboard primitive.
    An event at t belongs to every window [cycle_start, cycle_start +
    k·15 s) whose end exceeds t (k = 1..4). Spark has no native
    cumulate, but the assignment set is a pure expression: explode a
    4-element step array and filter ``ts < end`` — stays in codegen,
    fan-out ≤ 4 (3 expected under uniform arrival), partial agg
    collapses map-side exactly as HOP does. Exact-distinct uv is the
    expensive honest form; swap for approx_count_distinct when the
    dashboard tolerates ~2% error.
    """
    ev = load(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    start_ms = ms - ms % F.lit(60000)  # integer floor — no double rounding
    stepped = ev.select(
        ms.alias("ms"),
        start_ms.alias("start_ms"),
        "user_id",
        F.explode(F.array(*[F.lit(k) for k in (1, 2, 3, 4)])).alias("k"),
    )
    w = stepped.select(
        "ms",
        "start_ms",
        (F.col("start_ms") + F.col("k") * 15000).alias("end_ms"),
        "user_id",
    ).filter(F.col("ms") < F.col("end_ms"))
    out = w.groupBy("start_ms", "end_ms").agg(
        F.count(F.lit(1)).alias("pv"),
        F.countDistinct("user_id").alias("uv"),
    )
    return out.select(
        F.date_format(F.timestamp_millis("start_ms"), "yyyy-MM-dd HH:mm:ss").alias(
            "stt"
        ),
        F.date_format(F.timestamp_millis("end_ms"), "yyyy-MM-dd HH:mm:ss").alias(
            "edt"
        ),
        "pv",
        "uv",
    )


TOPN_PER_WINDOW = 3


@query(
    "w_topn_per_window",
    oracle=f"""
    WITH agg AS (
      SELECT {_STT} AS stt, user_id, COUNT(*) AS pv,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY stt
                                   ORDER BY amount DESC, user_id) AS rnk
      FROM agg
    )
    SELECT stt, user_id, pv, amount, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {TOPN_PER_WINDOW}
    """,
    tags=("window", "topn"),
)
def w_topn_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed Top-N: the {TOPN_PER_WINDOW} biggest spenders per 10 s window.

    Flink SQL's canonical "TopN on a window" job (the hot-items
    pattern: window TVF → ROW_NUMBER over the window key → rn <= N).
    Spark's shape: windowed aggregate, then ``grouped_topk`` — a
    partial top-N per input slice followed by a rank over the bounded
    survivors, identical output to one ``row_number`` over the window
    bucket (the oracle's formulation) but with no task ever sorting a
    whole window's users (a hot window holds millions at event
    scale). The rank reads a decimal-exact ``amount``, so ordering is
    partition-independent; ties break on user_id, making the cut a
    total order. The rank stages carry only AGGREGATED (window, user)
    rows, never raw events.
    """
    from flink_spark.plans.topk import grouped_topk

    ev = load(spark, sf_dir, "events")
    agg = _windowed(ev, "user_id").agg(
        F.count(F.lit(1)).alias("pv"), dsum("value", "amount")
    )
    agg = agg.select(_stamp(agg)[0], "user_id", "pv", "amount")
    return grouped_topk(
        agg, ["stt"], [F.desc("amount"), "user_id"], TOPN_PER_WINDOW,
        rank_col="rnk",
    ).select(
        "stt", "user_id", "pv", "amount",
        F.col("rnk").cast("long").alias("rnk"),
    )
