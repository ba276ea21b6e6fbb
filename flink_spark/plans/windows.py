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
