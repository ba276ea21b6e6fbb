"""Reference-job parity map (SURVEY.md §2.12 — the 23 Flink jobs + ADS).

Each entry names one runnable program of the reference and the catalog
queries / streaming operators that reproduce its computation here. The
batch queries are the DuckDB-checked truth; the ``streaming`` column
names the streaming-mode implementation where the job is stateful
(tests assert stream≡batch convergence).

``run_job(spark, sf_dir, job)`` executes every batch query a job maps
to — the "switch from the reference" entry point: a user picks their
job, gets the same outputs from the fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from flink_spark.registry import all_queries


@dataclass(frozen=True)
class JobParity:
    """One reference program and what reproduces it in this engine."""

    ref: str                                  # reference class (file under rt/)
    queries: tuple[str, ...]                  # batch catalog queries
    streaming: tuple[str, ...] = field(default_factory=tuple)  # streaming ops
    notes: str = ""


JOBS: dict[str, JobParity] = {
    # --- DIM -----------------------------------------------------------
    "DimApp": JobParity(
        ref="rt/app/dim/DimApp.java",
        queries=("r_config_routing", "p_split_counts"),
        streaming=("sinks.routed_dim_sink",),
        notes="CDC parse + dirty split + broadcast config routing + routed dim writes",
    ),
    # --- DWD log -------------------------------------------------------
    "BaseLogApp": JobParity(
        ref="rt/app/dwd/log/BaseLogApp.java",
        queries=("p_split_counts", "s_new_vs_returning"),
        streaming=("state.is_new_correction_stream", "sinks.routed_dim_sink"),
        notes="tolerant parse, is_new correction, 1→5 split, per-branch kafka sinks",
    ),
    "DwdTrafficUniqueVisitorDetail": JobParity(
        ref="rt/app/dwd/log/DwdTrafficUniqueVisitorDetail.java",
        queries=("s_daily_unique_users",),
        streaming=("state.daily_unique_stream",),
    ),
    "DwdTrafficUserJumpDetail": JobParity(
        ref="rt/app/dwd/log/DwdTrafficUserJumpDetail.java",
        queries=("s_cep_jump",),
        streaming=("state.cep_jump_stream",),
        notes="CEP next-within-10s; match ∪ timeout emission",
    ),
    # --- DWD db --------------------------------------------------------
    "DwdTradeCartAdd": JobParity(
        ref="rt/app/dwd/db/DwdTradeCartAdd.java",
        queries=("p_conditional_delta", "p_cdc_map_projection", "j_broadcast_dim_join"),
        notes="CDC map projection, insert/update delta, dic lookup join",
    ),
    "DwdTradeOrderPreProcess": JobParity(
        ref="rt/app/dwd/db/DwdTradeOrderPreProcess.java",
        queries=("j_left_outer_enrich", "j_two_key_join", "p_cdc_map_projection"),
        streaming=("jobs.interval_join_stream", "sinks.upsert_sink"),
        notes="5-way stream join + upsert-kafka changelog (final-table equivalent)",
    ),
    "DwdTradeOrderDetail": JobParity(
        ref="rt/app/dwd/db/DwdTradeOrderDetail.java",
        queries=("p_projection_filter",),
        notes="insert-only filter of the pre-processed stream",
    ),
    "DwdTradeCancelDetail": JobParity(
        ref="rt/app/dwd/db/DwdTradeCancelDetail.java",
        queries=("p_conditional_delta",),
        notes="old-image status-transition predicate",
    ),
    "DwdTradePayDetailSuc": JobParity(
        ref="rt/app/dwd/db/DwdTradePayDetailSuc.java",
        queries=("j_two_key_join", "j_broadcast_dim_join"),
        streaming=("jobs.interval_join_stream", "sinks.upsert_sink"),
    ),
    "DwdTradeOrderRefund": JobParity(
        ref="rt/app/dwd/db/DwdTradeOrderRefund.java",
        queries=("j_broadcast_dim_join", "p_json_extract"),
        notes="refund ⋈ order ⋈ dic×2 (same dim under two keys)",
    ),
    "DwdTradeRefundPaySuc": JobParity(
        ref="rt/app/dwd/db/DwdTradeRefundPaySuc.java",
        queries=("j_two_key_join",),
        notes="two-column join key",
    ),
    "DwdToolCoupon*": JobParity(
        ref="rt/app/dwd/db/DwdToolCouponGet/Order/Pay.java",
        queries=("p_conditional_delta", "p_projection_filter"),
        notes="coupon_use status transitions",
    ),
    "DwdInteractionComment": JobParity(
        ref="rt/app/dwd/db/DwdInteractionComment.java",
        queries=("j_broadcast_dim_join",),
    ),
    "DwdInteractionFavorAdd": JobParity(
        ref="rt/app/dwd/db/DwdInteractionFavorAdd.java",
        queries=("p_projection_filter",),
    ),
    "DwdUserRegister": JobParity(
        ref="rt/app/dwd/db/DwdUserRegister.java",
        queries=("f_scalar_datetime",),
        notes="insert filter + date_id derivation",
    ),
    # --- DWS -----------------------------------------------------------
    "DwsTrafficSourceKeywordPageViewWindow": JobParity(
        ref="rt/app/dws/DwsTrafficSourceKeywordPageViewWindow.java",
        queries=("w_keyword_tumble", "t_keyword_counts"),
        notes="F1 tokenizer UDTF + LATERAL TABLE + TUMBLE count",
    ),
    "DwsTrafficVcChArIsNewPageViewWindow": JobParity(
        ref="rt/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java",
        queries=("w_tumble_10s_keyed", "u_union_metrics"),
        streaming=("jobs.tumble_stream",),
        notes="3-stream union + keyed 10 s reduce",
    ),
    "DwsTrafficPageViewWindow": JobParity(
        ref="rt/app/dws/DwsTrafficPageViewWindow.java",
        queries=("w_tumble_10s_global", "s_daily_unique_users"),
        streaming=("state.daily_unique_stream", "jobs.tumble_stream"),
    ),
    "DwsUserUserLoginWindow": JobParity(
        ref="rt/app/dws/DwsUserUserLoginWindow.java",
        queries=("s_returning_users_7d", "w_tumble_10s_global"),
        notes="7-day back-flow rule (intended semantics; ref has precedence bug)",
    ),
    "DwsUserUserRegisterWindow": JobParity(
        ref="rt/app/dws/DwsUserUserRegisterWindow.java",
        queries=("w_tumble_10s_global",),
    ),
    "DwsTradeCartAddUuWindow": JobParity(
        ref="rt/app/dws/DwsTradeCartAddUuWindow.java",
        queries=("w_event_time_fallback", "s_daily_unique_users"),
        notes="operate_time ?? create_time event-time chain",
    ),
    "DwsTradeOrderWindow": JobParity(
        ref="rt/app/dws/DwsTradeOrderWindow.java",
        queries=("s_new_vs_returning", "w_tumble_10s_global"),
        streaming=("state.is_new_correction_stream",),
    ),
    "DwsTradePaymentSucWindow": JobParity(
        ref="rt/app/dws/DwsTradePaymentSucWindow.java",
        queries=("s_new_vs_returning", "w_event_time_fallback"),
    ),
    "DwsTradeSkuOrderWindow": JobParity(
        ref="rt/app/dws/DwsTradeSkuOrderWindow.java",
        queries=("s_dedup_latest", "w_agg_distinct_users", "q5_local_supplier_volume"),
        streaming=("sinks.upsert_sink",),
        notes="changelog dedup + exact distinct + snowflake broadcast enrichment",
    ),
    "DwsTradeProvinceOrderWindow": JobParity(
        ref="rt/app/dws/DwsTradeProvinceOrderWindow.java",
        queries=("w_tumble_10s_keyed", "j_broadcast_dim_join"),
    ),
    "DwsTradeTrademarkCategoryUserRefundWindow": JobParity(
        ref="rt/app/dws/DwsTradeTrademarkCategoryUserRefundWindow.java",
        queries=("j_broadcast_dim_join", "w_tumble_10s_keyed"),
        notes="dim join placed before the window (group key needs dim fields)",
    ),
    # --- ADS -----------------------------------------------------------
    "ADS (pub22 + pub mappers)": JobParity(
        ref="pub22/mapper/*.java, pub/mapper/*.java",
        queries=(
            "ads_channel_stats",
            "ads_conditional_score",
            "ads_hourly_stats",
            "ads_topk_users",
            "j_full_outer_metrics",
            "u_union_metrics",
            "q1_pricing_summary",
            "q3_shipping_priority",
        ),
        notes="20 REST queries → Spark SQL over DWS outputs (A8-A11, J7, T1-T3, U3)",
    ),
}


def run_job(
    spark: SparkSession, sf_dir: str, job: str
) -> dict[str, DataFrame]:
    """Run every batch query a reference job maps to."""
    parity = JOBS[job]
    catalog = all_queries()
    return {name: catalog[name].fn(spark, sf_dir) for name in parity.queries}


def coverage_report() -> list[tuple[str, str, int, int]]:
    """(job, ref, n_batch_queries, n_streaming_ops) per reference job."""
    return [
        (name, p.ref, len(p.queries), len(p.streaming))
        for name, p in JOBS.items()
    ]
