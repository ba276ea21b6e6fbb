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
    # block 0 — NEW this round, no driver row in any snapshot yet
    "t_leakage_safe_split",
    "e_leakage_safe_split",
    # r9 rotation, block 1 — code changed THIS round (5): the MinHash
    # verify legs are count-formed (t_minhash_lsh_dups + its
    # t_dup_clusters consumer), the BPE pair drops empty tokens, and
    # a_approx_sketch_daily gained its first value-checked oracle
    # (exact companions + per-engine sketch-accuracy predicates).
    "t_minhash_lsh_dups",
    "t_dup_clusters",
    "t_bpe_train",
    "t_bpe_segment",
    "a_approx_sketch_daily",
    # block 2 — ADVICE r8: these two were meant to re-green in r8 but
    # the old cap marker was two entries too low and they fell outside
    # the 50-query snapshot (their newest green row is r7).
    "e_pq_adc_topk",
    "e_ivfpq_topk",
    # block 3 — the 41 queries whose newest green row is r6 (two
    # rounds stale; VERDICT r8 item #2). Code unchanged since then.
    "ads_rollup_matrix",
    "e_ann_ivf_topk",
    "e_centroid_stats",
    "j_asof_nearest",
    "j_range_band",
    "j_semi_anti_customers",
    "p_pivot_event_matrix",
    "s_abandoned_browse",
    "s_cep_funnel_skip",
    "s_daily_unique_users",
    "s_new_vs_returning",
    "s_retention_cohorts",
    "s_returning_users_7d",
    "sql_dwd_topic_db",
    "t_bpe_token_stats",
    "t_chunk_dedup",
    "t_cjk_keyword_counts",
    "t_exact_dedup",
    "t_keyword_counts",
    "t_lang_id",
    "t_length_percentiles",
    "t_pack_sequences",
    "t_pii_redact",
    "t_quality_mixture_reweight",
    "t_quality_score",
    "t_repeated_ngram_coverage",
    "t_repetition_filter",
    "t_rolling_fingerprint",
    "t_source_overlap",
    "t_train_val_split",
    "t_unigram_lm_score",
    "t_vocab_prune",
    "t_winnow_fingerprints",
    "w_agg_distinct_users",
    "w_cumulate_windows",
    "w_event_time_fallback",
    "w_hop_windows",
    "w_keyword_tumble",
    "w_sessionize",
    "w_tumble_10s_global",
    "w_tumble_10s_keyed",
    # 2+5+2+41 = 50 above: the head is exactly the driver's cap.
    # --- the driver's 50-query cap lands here ---
    # Everything below is r7/r8-green on unchanged code; after this
    # round the oldest green row anywhere is r7 (21 queries), queued
    # first here for the r10 rotation (t_shuffle_shards first — it
    # rides the tokentrain module the BPE fix touched). Registration
    # order absorbs the rest of the cap.
    "t_shuffle_shards",
    "q1_pricing_summary",
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
    "q3_shipping_priority",
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
