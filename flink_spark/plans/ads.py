"""ADS mapper parity: the reference's 20 REST queries, shape-for-shape.

The reference serves dashboards from 8 MyBatis mappers
(``gmall-publisher-2022/src/main/java/com/atguigu/gmall/publisher/mapper``,
20 ``@Select`` queries total) over ClickHouse DWS tables. This module
adds the mapper shapes the core catalog didn't already cover 1:1:

- funnel UNION of labeled UV counts (``UserStatsMapper.java:12-53``)
- composite-key full-outer order⋈refund stats
  (``CommodityStatsMapper.java:52-91``)
- top-k GMV pie/bar (``CommodityStatsMapper.java:119-120``)
- subsidy-rate ``round(round(x,5)/round(y,5),20)``
  (``ActivityStatsMapper.java:10-17``, ``CouponStatsMapper.java:10-17``)
- keyword × source multiIf score (``TrafficKeywordsMapper.java:10-21``)
- province rollup with the ``name IS NOT NULL AND name != ''`` guard
  (``TradeStatsMapper.java:46-53``)

Scale notes (100 TB stance): every query is one scan of the fact table
(the UNION-ALL mappers are rewritten as conditional aggregates + stack —
one pass instead of five), dims are broadcast, top-k compiles to
TakeOrderedAndProject. The oracle SQL keeps the reference's literal
UNION-ALL / join shape, proving the single-scan rewrite is equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.functions.scalar import dec2, dec4, dsum, multi_if, to_yyyymmdd
from flink_spark.functions.text import tokenize
from flink_spark.plans.relational import REV_SQL
from flink_spark.plans.textops import _TOKS
from flink_spark.registry import query
from flink_spark.sources import load


# --------------------------------------------------------------------------
# UserStatsMapper.selectUvByPage — funnel union of labeled UV counts
# --------------------------------------------------------------------------

@query(
    "ads_funnel_union",
    oracle="""
    SELECT 'home' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
    FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT 'good_detail' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT 'cart' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
    FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT 'trade' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'payment' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
    FROM events WHERE event_type = 'purchase' AND value >= 100
    """,
    tags=("ads", "union", "funnel"),
)
def ads_funnel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Home→detail→cart→trade→payment funnel as labeled UV rows.

    Covers ``UserStatsMapper.java:12-53`` (``selectUvByPage`` — five
    UNION ALL'd ``sum(uv)`` selects, one per funnel page) and the same
    file's ``selectUserChangeCtPerType``/``selectTradeUserCt`` unions.
    The reference unions five separate table scans; at 100 TB that is
    five passes over DWS. Here: ONE scan computing five conditional
    exact-distinct aggregates, stacked to the mapper's (page_id, uv_ct)
    row shape — the oracle keeps the literal UNION ALL form, proving
    equivalence of the rewrite.
    """
    ev = load(spark, sf_dir, "events")
    stages = [
        ("home", F.col("event_type") == "view"),
        ("good_detail", F.col("event_type") == "click"),
        ("cart", F.col("event_type") == "signup"),
        ("trade", F.col("event_type") == "purchase"),
        (
            "payment",
            (F.col("event_type") == "purchase") & (F.col("value") >= 100),
        ),
    ]
    agg = ev.agg(
        *[
            F.count_distinct(F.when(cond, F.col("user_id"))).alias(page)
            for page, cond in stages
        ]
    )
    stack = ", ".join(f"'{page}', {page}" for page, _ in stages)
    return agg.select(
        F.expr(f"stack({len(stages)}, {stack}) AS (page_id, uv_ct)")
    )


# --------------------------------------------------------------------------
# CommodityStatsMapper.selectCategoryStats — composite-key full outer
# --------------------------------------------------------------------------

@query(
    "ads_category_fullouter",
    oracle=f"""
    SELECT COALESCE(oct.brand, rct.brand) AS brand,
           COALESCE(oct.ptype, rct.ptype) AS ptype,
           oct.order_ct, oct.order_amount, rct.refund_ct
    FROM (SELECT p_brand AS brand, p_type AS ptype,
                 COUNT(*) AS order_ct,
                 CAST(SUM({REV_SQL}) AS DOUBLE) AS order_amount
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_returnflag <> 'R'
          GROUP BY 1, 2) oct
    FULL OUTER JOIN
         (SELECT p_brand AS brand, p_type AS ptype,
                 COUNT(*) AS refund_ct
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_returnflag = 'R'
          GROUP BY 1, 2) rct
      ON oct.brand = rct.brand AND oct.ptype = rct.ptype
    """,
    tags=("ads", "join", "fullouter"),
)
def ads_category_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order stats ⟗ refund stats on a composite category key.

    Covers ``CommodityStatsMapper.java:52-91`` (``selectCategoryStats``
    — order aggregates FULL OUTER JOIN refund aggregates on the
    3-level category key) and :15-37 (``selectTrademarkStats``, same
    shape on the trademark key; ``j_full_outer_metrics`` covers the
    single-key variant). (brand, type) plays the category hierarchy;
    ``l_returnflag = 'R'`` plays the refund table. Both sides aggregate
    BEFORE the join — the full-outer join runs on the tiny grouped
    results, not the fact table — and the part dim is broadcast into
    each side's join, so the fact table shuffles only on its group key.
    """
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    from flink_spark.plans.relational import rev_col

    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    oct_ = (
        joined.filter(F.col("l_returnflag") != "R")
        .groupBy(
            F.col("p_brand").alias("o_brand"), F.col("p_type").alias("o_ptype")
        )
        .agg(
            F.count(F.lit(1)).alias("order_ct"),
            F.sum(rev_col()).cast("double").alias("order_amount"),
        )
    )
    rct = (
        joined.filter(F.col("l_returnflag") == "R")
        .groupBy(
            F.col("p_brand").alias("r_brand"), F.col("p_type").alias("r_ptype")
        )
        .agg(F.count(F.lit(1)).alias("refund_ct"))
    )
    return oct_.join(
        rct,
        (oct_.o_brand == rct.r_brand) & (oct_.o_ptype == rct.r_ptype),
        "full_outer",
    ).select(
        F.coalesce("o_brand", "r_brand").alias("brand"),
        F.coalesce("o_ptype", "r_ptype").alias("ptype"),
        "order_ct",
        "order_amount",
        "refund_ct",
    )


# --------------------------------------------------------------------------
# CommodityStatsMapper.selectGmvByTm — top-k GMV by trademark
# --------------------------------------------------------------------------

@query(
    "ads_gmv_topk_brand",
    oracle=f"""
    SELECT p_brand AS brand,
           CAST(SUM({REV_SQL}) AS DOUBLE) AS order_amount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    ORDER BY order_amount DESC, brand
    LIMIT 10
    """,
    tags=("ads", "topk"),
)
def ads_gmv_topk_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 trademarks by GMV (the dashboard pie graph).

    Covers ``CommodityStatsMapper.java:119-120`` (``selectGmvByTm`` —
    ``group by trademark_name order by order_amount desc limit N``) and
    :39-44 (``selectTmOrderAmtPieGra``, the unlimited variant).
    Broadcast dim join; decimal partial sums merge to a bit-identical
    double; Spark plans the limit as TakeOrderedAndProject (per
    partition top-10, 10-row driver merge — no global sort at 100 TB).
    """
    from flink_spark.plans.relational import rev_col

    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(rev_col()).cast("double").alias("order_amount"))
        .orderBy(F.desc("order_amount"), "brand")
        .limit(10)
    )


# --------------------------------------------------------------------------
# ActivityStatsMapper / CouponStatsMapper — subsidy rate rounding
# --------------------------------------------------------------------------

@query(
    "ads_subsidy_rate",
    oracle="""
    SELECT CAST(strftime(l_shipdate, '%Y%m%d') AS INTEGER) AS date_num,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE)
               AS reduce_amount,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS origin_total_amount,
           ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                                * CAST(l_discount AS DECIMAL(6,4))), 5)
                      AS DOUBLE)
                 / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 5)
                        AS DOUBLE), 20) AS subsidy_rate
    FROM lineitem
    GROUP BY 1
    """,
    tags=("ads", "agg", "ratio"),
)
def ads_subsidy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity/coupon subsidy rate with the reference's double round.

    Covers ``ActivityStatsMapper.java:10-17`` and
    ``CouponStatsMapper.java:10-17`` verbatim:
    ``round(round(toFloat64(reduce),5) / round(toFloat64(origin),5), 20)``
    grouped by ``toYYYYMMDD(stt)``. The discount amount plays the
    activity/coupon reduce amount. Inner rounds run on exact decimals
    (HALF_UP on positive sums agrees across engines); the outer
    round-to-20 is the reference's own no-op guard on a double. One
    scan, group key is the date — a few thousand groups at any scale.
    """
    li = load(spark, sf_dir, "lineitem")
    reduce_dec = F.sum(dec2("l_extendedprice") * dec4("l_discount"))
    origin_dec = F.sum(dec2("l_extendedprice"))
    return li.groupBy(to_yyyymmdd("l_shipdate").alias("date_num")).agg(
        reduce_dec.cast("double").alias("reduce_amount"),
        origin_dec.cast("double").alias("origin_total_amount"),
        F.round(
            F.round(reduce_dec, 5).cast("double")
            / F.round(origin_dec, 5).cast("double"),
            20,
        ).alias("subsidy_rate"),
    )


# --------------------------------------------------------------------------
# TrafficKeywordsMapper — keyword × source multiIf score
# --------------------------------------------------------------------------

@query(
    "ads_keyword_score",
    oracle=f"""
    SELECT word AS keyword,
           CAST(SUM(CASE source WHEN 'src0' THEN 10
                                WHEN 'src1' THEN 5
                                WHEN 'src2' THEN 2
                                WHEN 'src3' THEN 1
                                ELSE 0 END) AS BIGINT) AS keyword_score
    FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
    WHERE word <> ''
    GROUP BY 1
    ORDER BY keyword_score DESC, keyword
    """,
    tags=("ads", "textops", "agg"),
)
def ads_keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword score: per-occurrence weight by source, summed per word.

    Covers ``TrafficKeywordsMapper.java:10-21`` verbatim:
    ``sum(keyword_count * multiIf(source='SEARCH',10, 'ORDER',5,
    'CART',2, 'CLICK',1, 0)) ... order by keyword_score desc`` — the
    tokenizer UDTF output re-weighted per source channel. Document
    sources src0..src3 play SEARCH/ORDER/CART/CLICK; everything else
    weighs 0, exactly like the reference's catch-all. Tokenize +
    explode + conditional weight are all codegen expressions; one
    shuffle on the word key.
    """
    docs = load(spark, sf_dir, "documents")
    weight = multi_if(
        F.col("source") == "src0", F.lit(10),
        F.col("source") == "src1", F.lit(5),
        F.col("source") == "src2", F.lit(2),
        F.col("source") == "src3", F.lit(1),
        default=F.lit(0),
    )
    return (
        docs.select("source", F.explode(tokenize("text")).alias("keyword"))
        .filter(F.col("keyword") != "")
        .groupBy("keyword")
        .agg(F.sum(weight).cast("long").alias("keyword_score"))
        .orderBy(F.desc("keyword_score"), "keyword")
    )


# --------------------------------------------------------------------------
# TradeStatsMapper.selectTradeProvinceOrderAmount — guarded province rollup
# --------------------------------------------------------------------------

@query(
    "ads_province_stats",
    oracle="""
    SELECT n_name AS province_name,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS order_amount
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IS NOT NULL AND n_name <> ''
    GROUP BY n_nationkey, n_name
    """,
    tags=("ads", "agg", "join"),
)
def ads_province_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-province order count + amount with the empty-name guard.

    Covers ``TradeStatsMapper.java:33-53`` (``selectTradeProvinceOrderCt``
    + ``selectTradeProvinceOrderAmount`` — group by (province_id,
    province_name) with the ``province_name is not null and != ''``
    data-quality guard) and :12-16 (``selectTotalAmount``, the same
    rollup without the key). nation plays province and is broadcast;
    customer is fact-sized at 100 TB, so orders⋈customer stays a
    shuffle join on the key (AQE picks broadcast when it does fit).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(F.col("n_name").isNotNull() & (F.col("n_name") != ""))
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dsum("o_totalprice", "order_amount"),
        )
        .select(
            F.col("n_name").alias("province_name"), "order_count", "order_amount"
        )
    )
