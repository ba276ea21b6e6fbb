"""Query catalog registry.

Every operator family from SURVEY.md §2 is expressed as a named query:
a Spark DataFrame function ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
over the same parquet tables. The driver compares row count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal arithmetic and a single
  final cast to double (bit-identical regardless of row order);
- timestamps are compared at millisecond floor (``unix_millis`` ≡
  ``epoch_ms``) or formatted to seconds, never raw (parquet ns truncates
  differently in the two engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist an intermediate and register it for ``release_persisted``.

    Catalog queries persist shared intermediates (e.g. the LSH shingle
    table feeding both sides of a candidate join) but return a lazy
    DataFrame, so they can't unpersist before the caller consumes it.
    Harnesses that run many queries in one session (bench, the oracle
    compare, the driver gate) call ``release_persisted()`` after each
    query's action completes — otherwise cached blocks accumulate for
    the life of the session and pin executor storage memory.
    """
    df = df.persist()
    # Materialize the barrier eagerly: the tracked intermediates feed
    # BOTH sides of a downstream self-join, and lazy persist lets the
    # two join stages race to compute the same partitions (duplicate
    # work + "Block already exists" churn). count() runs the pipeline
    # exactly once; every consumer then reads the cache.
    df.count()
    _PERSISTED.append(df)
    return df


def release_persisted() -> None:
    """Unpersist every intermediate tracked by ``track_persist``."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


# The driver's correctness gate snapshots at most 50 catalog queries per
# round, walking the catalog in iteration order — queries that land after
# the cap never get a CORRECTNESS row. Names listed here are emitted first:
# queries with no driver row in any round yet, then this round's new
# queries, then queries whose only green row is from an old round. The
# remainder (all green in the latest snapshot) follow in registration
# order and absorb the cap.
_SNAPSHOT_FIRST = (
    # ===== r10 rotation =====
    # block 0 — NEW this round, no driver row in any snapshot yet
    "t_leakage_safe_split_loose",
    "t_lsh_recall_curve",
    "e_lsh_recall_curve",
    "e_ann_recall_audit",
    "x_ensemble_dup_clusters",
    # block 1 — code changed THIS round (7): both composed pipelines'
    # verify legs are pair-keyed counts and the training pipeline's
    # split is cluster-keyed (+ new cluster_split_docs column); the
    # leakage splits cluster at the decoupled SPLIT_* thresholds; the
    # MinHash pair chain is threshold-parameterized (t_minhash_lsh_dups
    # / t_dup_clusters ride it); a_approx_sketch_daily's p50 predicate
    # gained an absolute tolerance floor.
    "t_training_pipeline",
    "t_corpus_pipeline",
    "t_leakage_safe_split",
    "e_leakage_safe_split",
    "t_minhash_lsh_dups",
    "t_dup_clusters",
    "a_approx_sketch_daily",
    # block 2 — the 21 queries whose newest green row is r7 (two
    # rounds stale; VERDICT r9 item #1). Code unchanged since then.
    "t_shuffle_shards",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "m_binary_meta",
    "m_decode_features",
    "m_doc_embedding_join",
    "m_frame_sample",
    "m_resize_bytes",
    "e_cosine_topk",
    "e_norm_stats",
    "s_cep_browse_buy",
    "s_cep_jump",
    "s_dedup_latest",
    "sql_revenue_forecast",
    "j_broadcast_dim_join",
    "j_interval_join",
    "j_left_outer_enrich",
    "j_left_outer_interval",
    "j_two_key_join",
    "j_wide_order_5way",
    "j_full_outer_metrics",
    # block 3 — 17 of the 46 r8-green queries, dedup/similarity family
    # first (they share modules with this round's changed code).
    "t_ngram_jaccard_dups",
    "t_containment_dups",
    "t_simhash_dups",
    "t_embedding_neardup",
    "e_dup_clusters",
    "e_semantic_dedup",
    "e_semantic_decontaminate",
    "t_substring_dedup",
    "t_cross_source_dedup",
    "t_decontaminate",
    "t_decontaminate_fraction",
    "t_decontaminate_spans",
    "t_source_mixture",
    "t_token_stats",
    "t_zipf_profile",
    "t_bm25_topk",
    "e_ann_lsh_topk",
    # 5+7+21+17 = 50 above: the head is exactly the driver's cap.
    # --- the driver's 50-query cap lands here ---
    # Everything below is r8/r9-green on unchanged code. After r10 the
    # oldest green row anywhere is r8: the 27 remaining r8-green
    # queries (46 were r8-green; 17 rotate in block 3 and the two
    # pipelines re-green in block 1), queued first here for the r11
    # rotation. Registration order absorbs the rest of the cap.
    "e_filtered_topk",
    "t_context_chunks",
    "t_distinctive_terms",
    "t_table_profile",
    "a_salted_hot_key_agg",
    "ads_category_fullouter",
    "ads_channel_stats",
    "ads_conditional_score",
    "ads_funnel_union",
    "ads_gmv_topk_brand",
    "ads_hourly_stats",
    "ads_keyword_score",
    "ads_province_stats",
    "ads_subsidy_rate",
    "ads_topk_users",
    "f_scalar_datetime",
    "j_lru_dim_join",
    "p_cdc_map_projection",
    "p_conditional_delta",
    "p_json_extract",
    "p_projection_filter",
    "p_split_counts",
    "q10_returned_items",
    "q5_local_supplier_volume",
    "r_config_routing",
    "u_union_metrics",
    "w_topn_per_window",
)


def all_queries() -> dict[str, Query]:
    """Name → Query for the full catalog (imports all plan modules).

    Ordered so the driver's capped correctness snapshot covers the
    queries with the weakest existing signal first (``_SNAPSHOT_FIRST``).
    """
    import flink_spark.plans  # noqa: F401  (registers on import)

    # The rotation list is re-edited every round by hand; a typo'd name
    # must fail LOUDLY here, not silently drop the query below the
    # driver's 50-query cap (the r8 cap-marker bug's failure mode).
    dupes = len(_SNAPSHOT_FIRST) - len(set(_SNAPSHOT_FIRST))
    if dupes:
        raise ValueError(f"_SNAPSHOT_FIRST has {dupes} duplicate name(s)")
    unknown = [n for n in _SNAPSHOT_FIRST if n not in _REGISTRY]
    if unknown:
        raise ValueError(f"_SNAPSHOT_FIRST names not registered: {unknown}")
    ordered = {n: _REGISTRY[n] for n in _SNAPSHOT_FIRST}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def spark_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}
