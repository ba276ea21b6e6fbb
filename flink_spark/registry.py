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


def track_persist(df: DataFrame, eager: bool = True) -> DataFrame:
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
    # Materialize the barrier eagerly by default: most tracked
    # intermediates feed BOTH sides of a downstream self-join, and lazy
    # persist lets the two join stages race to compute the same
    # partitions (duplicate work + "Block already exists" churn).
    # count() runs the pipeline exactly once; every consumer then reads
    # the cache. ``eager=False`` is for the narrower case where every
    # consumer reads the frame in a DIFFERENT, strictly sequential
    # action (the first action populates the cache before any other
    # consumer exists) — then the count() job is pure overhead.
    if eager:
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
    # ===== r12 rotation =====
    # block 0 — never driver-checked: the one r11 demotion leads the
    # head, exactly as recorded last round.
    "e_ivf_balance_audit",
    # block 1 — NEW this round.
    "x_ensemble_training_pipeline",
    # block 2 — code changed this round (subset not already covered by
    # the stale block below): the two replay gates grew the in-query
    # precondition-check + self-repair path, and the IVF probe default
    # moved from fixed-2 to the derived scanned-fraction rule, which
    # the recall audit and the variant scoreboard exercise end-to-end.
    # (e_ann_ivf_topk / e_ivfpq_topk also changed but sit in the r9
    # stale block already; t_training_pipeline's refactor and
    # e_indexed_search_topk's new probe default are demoted below the
    # cap — both sf0.001/0.01-value-verified this session — and queue
    # first for r13.)
    "s_split_stream_replay",
    "s_semantic_split_replay",
    "e_ann_recall_audit",
    "e_ann_variant_recall",
    # block 3 — the 44 queries whose newest green row is r9 (VERDICT
    # r11 item #2: nothing older than r10 after this snapshot). Code
    # unchanged except e_ann_ivf_topk/e_ivfpq_topk (the probes rule).
    "s_new_vs_returning",
    "s_returning_users_7d",
    "s_cep_funnel_skip",
    "s_retention_cohorts",
    "s_abandoned_browse",
    "w_tumble_10s_keyed",
    "w_tumble_10s_global",
    "w_event_time_fallback",
    "w_keyword_tumble",
    "w_agg_distinct_users",
    "w_sessionize",
    "w_hop_windows",
    "sql_dwd_topic_db",
    "ads_rollup_matrix",
    "j_asof_nearest",
    "j_range_band",
    "j_semi_anti_customers",
    "p_pivot_event_matrix",
    "t_vocab_prune",
    "t_repeated_ngram_coverage",
    "t_source_overlap",
    "t_length_percentiles",
    "t_train_val_split",
    "t_pack_sequences",
    "t_bpe_token_stats",
    "t_rolling_fingerprint",
    "t_exact_dedup",
    "t_quality_score",
    "t_repetition_filter",
    "t_lang_id",
    "t_keyword_counts",
    "t_cjk_keyword_counts",
    "t_chunk_dedup",
    "t_unigram_lm_score",
    "t_winnow_fingerprints",
    "t_quality_mixture_reweight",
    "t_pii_redact",
    "e_ann_ivf_topk",
    "e_centroid_stats",
    "e_pq_adc_topk",
    "e_ivfpq_topk",
    "t_bpe_train",
    "t_bpe_segment",
    "w_cumulate_windows",
    # 1+1+4+44 = 50: the head is exactly the driver's cap.
    # --- the driver's 50-query cap lands here ---
    # r12-changed, demoted under the cap (both value-verified at
    # sf0.001 AND sf0.01 this session; the flagship additionally at
    # sf0.1): they queue first for r13's changed-code block.
    "t_training_pipeline",
    "e_indexed_search_topk",
    # r12-NEW post-rotation (the head was already at the 50-cap when it
    # landed): the ensemble streaming-dedup gate — sf0.001/0.01/0.1
    # builder-verified this round; queues with the block above for r13.
    "s_ensemble_dedup_replay",
    "s_curation_stream_replay",
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
