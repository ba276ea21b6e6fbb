"""Watermarked window jobs + test execution helpers (W1-W3).

The batch window formulations live in ``flink_spark.plans.windows``;
``tumble_stream`` is the same aggregation with a watermark bolted on —
the Spark analog of the reference's
``assignTimestampsAndWatermarks(boundedOutOfOrderness)`` + 10 s
``TumblingEventTimeWindows`` + reduce
(rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:120-179). The
``WindowFunction`` stt/edt finisher becomes plain ``window.start/end``
columns.
"""

from __future__ import annotations

from flink_spark.sources import local_df
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_spark.functions.scalar import dsum


def tumble_stream(
    sdf: DataFrame,
    *keys: str,
    ts_col: str = "ts",
    duration: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "2 seconds",
) -> DataFrame:
    """Keyed tumbling/HOP event-time window: count + exact sum
    (A1/A3/W1/W3; with ``slide`` set, the streaming form of
    ``w_hop_windows`` — Flink HOP).

    Streaming form of ``w_tumble_10s_keyed`` — identical final table
    (stream-batch equivalence asserted in tests). State is bounded by
    the watermark: windows older than (max event time - watermark)
    finalize and evict, the Spark analog of Flink window GC. A sliding
    window multiplies live state by duration/slide overlapping windows
    — the same constant factor as its shuffle fan-out.
    """
    win = (
        F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    )
    out = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("pv"), dsum("value", "amount"))
    )
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
        *keys,
        "pv",
        "amount",
    )


def sessionize_stream(
    sdf: DataFrame,
    ts_col: str = "ts",
    gap: str = "60 seconds",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Per-user session windows with an inactivity gap (streaming form).

    Streaming form of ``w_sessionize`` — Flink's
    ``EventTimeSessionWindows.withGap`` as Spark's native
    ``session_window``: the state store keeps one open session per
    user, merges events arriving within ``gap``, and finalizes the
    session once the watermark passes its end (identical final table
    to the batch form; asserted in tests). Spark requires a watermark
    for streaming session windows — it is what bounds the merge state.
    """
    out = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count(F.lit(1)).alias("ev_ct"), dsum("value", "amount"))
    )
    return out.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
        "user_id",
        "ev_ct",
        "amount",
    )


def cumulate_stream(
    sdf: DataFrame,
    ts_col: str = "ts",
    step_sec: int = 15,
    cycle_sec: int = 60,
    watermark: str = "2 seconds",
) -> DataFrame:
    """CUMULATE windows, streaming form (Flink ``CUMULATE`` TVF parity).

    Streaming form of ``w_cumulate_windows`` — identical final table
    (stream≡batch asserted in tests). Same explode-to-slices trick as
    the batch plan: an event joins every expanding window
    [cycle_start, cycle_start + k·step) whose end exceeds it, a pure
    codegen expression with fan-out ≤ cycle/step.

    Exact-distinct ``uv`` cannot be a streaming COUNT(DISTINCT);
    instead the plan CHAINS two stateful aggregations (Spark 3.4+
    multiple-stateful-operator support, append mode): first a
    per-(window, user) count keyed on the watermarked slice-end
    timestamp, then a re-window over ``window_time`` that sums the
    per-user counts into ``pv`` and counts rows into ``uv`` — the
    reference's keyed-state ``Set<String>`` semantics
    (rt/app/dws/DwsTradeSkuOrderWindow.java:114-172) as two bounded
    window states. Both states evict at the watermark; fan-out and
    state are each bounded by cycle/step × live windows.
    """
    steps = cycle_sec // step_sec
    ms = F.unix_millis(F.col(ts_col))
    stepped = (
        sdf.select(F.col(ts_col), "user_id")
        .withColumn("ms", ms)
        .withColumn(
            "start_ms", F.col("ms") - F.col("ms") % F.lit(cycle_sec * 1000)
        )
        .withColumn(
            "k",
            F.explode(F.array(*[F.lit(k) for k in range(1, steps + 1)])),
        )
        .withColumn(
            "end_ms", F.col("start_ms") + F.col("k") * (step_sec * 1000)
        )
        .filter(F.col("ms") < F.col("end_ms"))
        .select(
            F.timestamp_millis("end_ms").alias("wend"),
            "start_ms",
            "user_id",
        )
    )
    per_user = (
        stepped.withWatermark("wend", watermark)
        .groupBy(F.window("wend", f"{step_sec} seconds"), "start_ms", "user_id")
        .agg(F.count(F.lit(1)).alias("u_pv"))
    )
    out = per_user.groupBy(
        F.window(F.window_time("window"), f"{step_sec} seconds"),
        "start_ms",
    ).agg(
        F.sum("u_pv").cast("long").alias("pv"),
        F.count(F.lit(1)).alias("uv"),
    )
    return out.select(
        F.date_format(F.timestamp_millis("start_ms"), "yyyy-MM-dd HH:mm:ss")
        .alias("stt"),
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("edt"),
        "pv",
        "uv",
    )


def keyword_tumble_stream(
    sdf: DataFrame,
    docs: DataFrame,
    keywords: tuple[str, ...],
    ts_col: str = "ts",
    duration: str = "10 seconds",
    watermark: str = "2 seconds",
) -> DataFrame:
    """A3+F1 streaming: tokenize → explode → tumbling keyword counts.

    Streaming form of ``w_keyword_tumble`` — the full
    DwsTrafficSourceKeywordPageViewWindow job
    (rt/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:60-79):
    filter search views, join the (static, broadcast) doc/text dim,
    take the leading 5 tokens, ``LATERAL TABLE``/explode, then TUMBLE
    count per word. The stream-static join and the explode are
    stateless, so the only state is the windowed count, bounded by the
    watermark. Tokenization is the CJK-aware F1 tokenizer — a Chinese
    keyword stream counts bigrams exactly like the batch/oracle form.

    Append-mode caution: the ``view`` filter below sits between the
    watermark and the aggregate, and Catalyst pushes it into the scan
    — replay-harness flush sentinels (non-view rows) would never
    advance the watermark (see ``topn_per_window_stream``). Tests run
    this job in complete mode; an append-mode run must flush with a
    far-future ``view`` event instead of the generic sentinel.
    """
    from flink_spark.functions.text import tokenize

    toks = docs.select("doc_id", F.slice(tokenize("text"), 1, 5).alias("toks"))
    ev = (
        sdf.withWatermark(ts_col, watermark)
        .filter(F.col("event_type") == "view")
    )
    logs = ev.join(
        F.broadcast(toks), toks["doc_id"] == ev["event_id"] % 500
    ).select(ts_col, "toks")
    words = logs.select(ts_col, F.explode("toks").alias("word")).filter(
        F.col("word").isin(*keywords)
    )
    out = words.groupBy(F.window(ts_col, duration), "word").agg(
        F.count(F.lit(1)).alias("kw_ct")
    )
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "word",
        "kw_ct",
    )


def distinct_users_tumble_stream(
    sdf: DataFrame,
    ts_col: str = "ts",
    duration_sec: int = 10,
    watermark: str = "2 seconds",
) -> DataFrame:
    """A4 streaming: exact windowed count(distinct user) via chained
    dedup → window aggregation (two stateful operators).

    Streaming form of the ``user_ct`` half of ``w_agg_distinct_users``
    (rt/app/dws/DwsTradeSkuOrderWindow.java:114-172 accumulates a
    ``Set<String>`` in keyed state; rt/bean/TradeSkuOrderBean.java:44-47).
    Spark Structured Streaming cannot run COUNT(DISTINCT) inside a
    streaming aggregate, so the set-semantics move to a
    ``dropDuplicates`` stage — exactly what the reference's state Set
    does — followed by an ordinary windowed count. The event time is
    floored to the window start *first* so the floored column is both
    the dedup key component and the watermark column (state for both
    operators evicts once the watermark passes the window).
    """
    floored = F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / duration_sec).cast("long") * duration_sec
    )
    deduped = (
        sdf.withColumn("wts", floored)
        .withWatermark("wts", watermark)
        .dropDuplicates(["user_id", "event_type", "wts"])
    )
    out = deduped.groupBy(
        F.window("wts", f"{duration_sec} seconds"), "event_type"
    ).agg(F.count(F.lit(1)).alias("user_ct"))
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        "user_ct",
    )


def interval_join_stream(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "5 minutes",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Stream-stream interval join: clicks within 5 min before a purchase.

    Streaming form of ``j_interval_join`` (J4,
    rt-test/app/Flink01_DataStreamJoin.java:44-53) and the W7
    join-state-TTL mechanism: the reference bounds join state with
    ``table.exec.state.ttl`` (DwdTradeOrderPreProcess.java:23-25);
    Spark bounds it with the watermark + the time-range predicate —
    rows outside ``lookback`` of the watermark are evicted from join
    state automatically.
    """
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        ).withWatermark("p_ts", watermark)
    )
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        ).withWatermark("c_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts BETWEEN p_ts - interval {lookback} AND p_ts"
        ),
    )


def left_outer_interval_join_stream(
    sdf: DataFrame,
    lookback: str = "5 minutes",
    watermark: str = "2 seconds",
) -> DataFrame:
    """J2 — stream-stream LEFT OUTER interval join (null-padded).

    Streaming form of ``j_left_outer_interval``
    (rt/app/dwd/db/DwdTradeOrderPreProcess.java:144-147): purchases
    left-join clicks by user within a 5-minute lookback. Spark emits a
    matched row as soon as the pair meets, and the null-padded row only
    once the click-side watermark passes the purchase's match window —
    the engine-native equivalent of Flink's retraction stream, with the
    final-table merge done downstream by ``upsert_sink`` (K3) keyed on
    ``p_event`` ordered by ``(c_ts, c_event)`` (A5), so the composed
    J2→K3→A5 dataflow converges to the batch left join (SURVEY.md O10).

    Far-future ``__flush__`` sentinel rows (``replay_events``) are let
    *through* both side filters so they reach both watermark nodes —
    Catalyst pushes the ``event_type`` predicate below the watermark
    operator into the scan, so a sentinel that fails the filter would
    never advance the watermark and unmatched rows would never
    null-pad. Sentinel rows carry ``event_id < 0``; consumers MUST
    drop them *outside* the streaming plan (in foreachBatch or on the
    merged table) — a ``filter(p_event >= 0)`` inside the streaming
    query is itself pushed through the join below the p-side watermark
    and re-strands the global (min-of-sides) watermark. Event times
    are floored to ms before watermarking so the join window matches
    the batch/oracle ms-floor semantics.
    """
    ms_floor = F.timestamp_millis(F.unix_millis("ts"))
    p = (
        sdf.withColumn("ts", ms_floor)
        .withWatermark("ts", watermark)
        .filter(F.col("event_type").isin("purchase", "__flush__"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        sdf.withColumn("ts", ms_floor)
        .withWatermark("ts", watermark)
        .filter(F.col("event_type").isin("click", "__flush__"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_event"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts BETWEEN p_ts - interval {lookback} AND p_ts"
        ),
        "left_outer",
    )


def topn_per_window_stream(
    sdf: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 seconds",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Finalized-window (window, user) aggregate stream for Top-N.

    Streaming form of ``w_topn_per_window`` (Flink's hot-items "TopN
    on a window"). A rank over a streaming aggregate is not
    expressible inside the streaming plan, so the job splits at the
    natural boundary: this append-mode aggregate emits each
    (window, user) row exactly once — and because append emission
    happens only when the WATERMARK passes the window end, every row
    of a given window lands in the SAME micro-batch. That makes the
    per-batch ``rank_window_topn`` below exact, not approximate: each
    foreachBatch call holds complete windows, ranks them, and ships
    the Top-N to the sink (JDBC/Kafka/upsert — any
    ``flink_spark.streaming.sinks`` writer).

    Sentinel flush rows (event_id < 0, the replay harness convention)
    must NOT be row-filtered before the aggregate: Catalyst pushes a
    ``event_id >= 0`` predicate through the EventTimeWatermark node
    into the parquet scan, so the sentinel never reaches the
    watermark tracker and the final windows never close (observed:
    the last micro-batch reported 0 input rows and an hour of windows
    went unemitted). Instead the sentinel flows through the watermark
    and is neutralized INSIDE the aggregate (conditional pv/amount),
    and its own empty window row is dropped post-agg by ``pv > 0`` —
    a filter on aggregate output cannot be pushed below the
    watermark.
    """
    real = F.col("event_id") >= 0
    agg = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), "user_id")
        .agg(
            F.sum(F.when(real, 1).otherwise(0)).alias("pv"),
            dsum(F.when(real, F.col("value")), "amount"),
        )
    )
    return agg.filter(F.col("pv") > 0).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "user_id",
        "pv",
        "amount",
    )


def rank_window_topn(batch: DataFrame, n: int | None = None) -> DataFrame:
    """Rank one finalized micro-batch of (stt, user_id, pv, amount)
    rows: Top-``n`` spenders per window, the exact ordering of the
    batch query (amount desc, user_id tiebreak — a total order, so
    stream and batch cut identically)."""
    from pyspark.sql import Window as W

    from flink_spark.plans.windows import TOPN_PER_WINDOW

    if n is None:
        n = TOPN_PER_WINDOW
    r = F.row_number().over(
        W.partitionBy("stt").orderBy(F.desc("amount"), "user_id")
    )
    return (
        batch.withColumn("rnk", r)
        .filter(F.col("rnk") <= n)
        .select("stt", "user_id", "pv", "amount",
                F.col("rnk").cast("long").alias("rnk"))
    )


def run_foreach_to_memory(sdf: DataFrame, transform, name: str):
    """Execute a streaming DF through ``foreachBatch(transform)`` and
    return all transformed rows as one batch DataFrame. Test harness
    only (rows accumulate on the driver) — production jobs pass the
    transform to a real sink's foreachBatch instead.
    """
    spark = sdf.sparkSession
    rows: list = []
    schema_box: list = []

    def fb(batch: DataFrame, _epoch: int) -> None:
        out = transform(batch)
        if not schema_box:
            schema_box.append(out.schema)
        rows.extend(out.collect())

    q = (
        sdf.writeStream.foreachBatch(fb)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return local_df(spark, rows, schema_box[0])


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming DF to completion into a memory sink.

    Drains all available input (every replay slice), lets empty
    batches fire pending event-time timeouts, stops the query, and
    returns the sink table. Test harness only — production jobs use
    the sinks in ``flink_spark.streaming.sinks``.
    """
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = sdf.sparkSession
    return spark.table(name)
