"""Config-driven routing, stream splitting, CDC-envelope projection.

Covers the reference's dynamic-routing DIM path and log fan-out:

- J6/W10 broadcast config join — rt/app/dim/DimApp.java:85-92 +
  rt/app/func/TableProcessFunction.java:40-56 (rule MapState lookup)
- P7 config-driven column pruning — TableProcessFunction.java:148-165
  (drop ``data`` keys not in the configured ``sinkColumns``)
- P5/P1 1→5 stream split with dirty side-output —
  rt/app/dwd/log/BaseLogApp.java:52-200
- P2 map-projection of the CDC envelope —
  rt/app/dwd/db/DwdTradeOrderPreProcess.java:55-72 (``data['col']``
  access over MAP<STRING,STRING> with on-read casts)

Scale notes: the config table is tiny and explicitly ``broadcast()``;
the event scan is single-pass (the split/pruning are row-local
expressions); map pruning is ``map_filter`` — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_spark.registry import query
from flink_spark.sources import local_df, load

# the table_process analog (rt/bean/TableProcess.java:5-17):
# source event_type -> (sink table, columns to keep)
ROUTING_CONFIG = [
    ("click", "dwd_click", "user_id,value"),
    ("view", "dwd_view", "user_id"),
    ("purchase", "dwd_purchase", "user_id,value,props"),
    ("signup", "dwd_signup", "user_id"),
    ("error", "dwd_error", "props"),
]

EVENT_TYPES = tuple(c[0] for c in ROUTING_CONFIG)

_CFG_VALUES = ", ".join(
    f"('{s}', '{t}', '{c}')" for s, t, c in ROUTING_CONFIG
)

# deterministic cross-engine stringification: bigint → decimal string,
# double → DECIMAL(18,2) → string (identical formatting both engines)
_VAL_STR_SQL = "CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)"


@query(
    "r_config_routing",
    oracle=f"""
    WITH cfg(source_type, sink_table, sink_columns) AS (
      VALUES {_CFG_VALUES}
    ),
    j AS (
      SELECT sink_table,
             CASE WHEN list_contains(string_split(sink_columns, ','), 'user_id')
                  THEN 1 ELSE 0 END AS has_uid,
             CASE WHEN list_contains(string_split(sink_columns, ','), 'value')
                  THEN 1 ELSE 0 END AS has_val,
             CASE WHEN list_contains(string_split(sink_columns, ','), 'props')
                  THEN 1 ELSE 0 END AS has_props,
             user_id, value, props
      FROM events e JOIN cfg ON e.event_type = cfg.source_type
    )
    SELECT sink_table,
           COUNT(*) AS row_ct,
           CAST(SUM(has_uid + has_val + has_props) AS BIGINT) AS kept_cols,
           CAST(SUM(has_uid * length(CAST(user_id AS VARCHAR))
                  + has_val * length({_VAL_STR_SQL})
                  + has_props * length(props)) AS BIGINT) AS val_chars
    FROM j GROUP BY sink_table
    """,
    tags=("routing", "config", "map"),
)
def r_config_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-config routing with map-column pruning (J6 + P7).

    Events become CDC-style ``data`` maps; the config table (the
    ``table_process`` analog) is broadcast-joined on the source key and
    each row's map is pruned to the configured ``sink_columns`` via
    ``map_filter``. The output audits the routing: rows, kept columns
    and kept-value characters per sink table (sum-of-lengths is
    order-insensitive, so it hashes identically under any shuffle).
    """
    ev = load(spark, sf_dir, "events")
    cfg = local_df(spark, 
        ROUTING_CONFIG, "source_type string, sink_table string, sink_columns string"
    )
    data = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("decimal(18,2)").cast("string"),
        F.lit("props"), F.col("props"),
    )
    # split the column list on the 5-row config side, not per event row
    cfg = cfg.withColumn("keep", F.split("sink_columns", ","))
    routed = (
        ev.withColumn("data", data)
        .join(F.broadcast(cfg), F.col("event_type") == F.col("source_type"))
        .withColumn(
            "pruned",
            F.map_filter("data", lambda k, _v: F.array_contains(F.col("keep"), k)),
        )
    )
    val_chars = F.aggregate(
        F.map_values("pruned"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return routed.groupBy("sink_table").agg(
        F.count(F.lit(1)).alias("row_ct"),
        F.sum(F.size("pruned")).cast("long").alias("kept_cols"),
        F.sum(val_chars).cast("long").alias("val_chars"),
    )


def split_events(df: DataFrame) -> tuple[dict[str, DataFrame], DataFrame]:
    """P5/P1 — one-pass 1→5 split with a dirty side output.

    Tolerant parse of ``props`` (``get_json_object`` yields null on
    malformed JSON — the OutputTag("Dirty") analog), then one filtered
    projection per branch. All branches share a single cached scan when
    written through ``foreachBatch`` (see
    ``flink_spark.streaming.sinks.routed_dim_sink``).
    """
    parsed = df.withColumn("k", F.get_json_object("props", "$.k"))
    dirty = parsed.filter(F.col("k").isNull())
    clean = parsed.filter(F.col("k").isNotNull())
    branches = {
        t: clean.filter(F.col("event_type") == t) for t in EVENT_TYPES
    }
    return branches, dirty


@query(
    "p_split_counts",
    oracle="""
    SELECT CASE WHEN json_extract_string(props, '$.k') IS NULL
                THEN 'dirty' ELSE event_type END AS branch,
           COUNT(*) AS row_ct,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    """,
    tags=("routing", "split", "json"),
)
def p_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-volume audit: rows per branch incl. the dirty side output.

    The driver-checkable view of ``split_events`` — a single scan
    labelling each row with its branch (malformed props → 'dirty'),
    matching BaseLogApp's side-output routing. ``k_sum`` verifies the
    parsed payload values survive the split.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    branch = F.when(k.isNull(), "dirty").otherwise(F.col("event_type"))
    return (
        ev.select(branch.alias("branch"), k.cast("long").alias("k"))
        .groupBy("branch")
        .agg(
            F.count(F.lit(1)).alias("row_ct"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )


@query(
    "sql_dwd_topic_db",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS date_id,
           COUNT(*) AS order_ct,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_order
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("routing", "cdc", "sql-first"),
)
def sql_dwd_topic_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A DWD job written ONLY as SQL strings over the CDC envelope.

    The reference's SQL-first path: ``MyKafkaUtil.getTopicDb``
    (rt/utils/MyKafkaUtil.java:88-98) declares ``topic_db`` with
    ``data MAP<STRING,STRING>`` via DDL, and every DWD-db job is then
    pure ``tableEnv.sqlQuery`` text over it (e.g.
    DwdTradeOrderPreProcess.java:55-72: ``data['col']`` + on-read
    casts, filtered on ``table``/``type``). This mirrors that user
    surface exactly — a ``CREATE TEMPORARY VIEW topic_db`` DDL string
    building the Maxwell-style envelope, then the job as one SQL
    string (envelope filter → map projection → typed casts → daily
    rollup); no DataFrame calls in the job body. The oracle aggregates
    the source rows directly, so envelope stringify→parse loss would
    surface as a value mismatch.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_src")
    # the getTopicDb DDL analog: a CDC envelope view with a string map
    spark.sql("""
        CREATE OR REPLACE TEMPORARY VIEW topic_db AS
        SELECT 'order_info' AS `table`,
               CASE WHEN o_orderstatus = 'O' THEN 'insert' ELSE 'update' END
                   AS `type`,
               from_json(to_json(named_struct(
                   'id',          o_orderkey,
                   'user_id',     o_custkey,
                   'total_amount', CAST(o_totalprice AS DECIMAL(18,2)),
                   'order_status', o_orderstatus,
                   'date_id',     date_format(o_orderdate, 'yyyy-MM-dd')
               )), 'map<string,string>') AS data
        FROM orders_src
    """)
    # the DWD job proper — pure SQL over the envelope
    return spark.sql("""
        SELECT data['date_id'] AS date_id,
               COUNT(*) AS order_ct,
               CAST(SUM(CAST(data['total_amount'] AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount,
               CAST(MAX(CAST(data['id'] AS BIGINT)) AS BIGINT) AS max_order
        FROM topic_db
        WHERE `table` = 'order_info'
          AND `type` = 'insert'
          AND data['date_id'] >= '1998-01-01'
        GROUP BY data['date_id']
    """)


@query(
    "p_cdc_map_projection",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS order_ct,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(MAX(o_custkey) AS BIGINT) AS max_cust
    FROM orders
    GROUP BY 1
    """,
    tags=("routing", "cdc", "map"),
)
def p_cdc_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-envelope round trip: rows → JSON → MAP<STRING,STRING> → typed.

    Builds the Maxwell-style envelope (``data`` as string→string map)
    from ``orders``, then projects with ``data['col']`` + on-read casts
    — the exact P2 shape (DwdTradeOrderPreProcess.java:55-72). The
    oracle aggregates the source directly, so any loss in the
    stringify→parse→cast round trip would surface as a value mismatch.
    """
    orders = load(spark, sf_dir, "orders")
    env = orders.select(
        F.to_json(
            F.struct("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        ).alias("value")
    )
    parsed = env.select(
        F.from_json("value", T.MapType(T.StringType(), T.StringType())).alias("data")
    )
    proj = parsed.select(
        F.col("data")["o_orderkey"].cast("long").alias("order_key"),
        F.col("data")["o_custkey"].cast("long").alias("cust_key"),
        F.col("data")["o_totalprice"].cast("decimal(18,2)").alias("price"),
        F.col("data")["o_orderstatus"].alias("status"),
    )
    return proj.groupBy("status").agg(
        F.count(F.lit(1)).alias("order_ct"),
        F.sum("price").cast("double").alias("total_price"),
        F.max("cust_key").cast("long").alias("max_cust"),
    )
