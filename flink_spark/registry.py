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
    # ===== r13 rotation =====
    # block 0 — never driver-checked: the two post-snapshot r12
    # streaming pipeline gates (VERDICT r12 item #1: they lead).
    "s_ensemble_dedup_replay",
    "s_curation_stream_replay",
    # block 1 — code changed in r12 but demoted below that round's cap
    # (recorded at the time): the flagship's refactor through
    # _pipeline_oracle and the derived-probe default on the
    # materialized index. Spliced before the stale drain per the
    # rotation convention (changed-code outranks stale).
    "t_training_pipeline",
    "e_indexed_search_topk",
    # block 2 — the 40 remaining queries whose newest green row is r10
    # (t_training_pipeline is drained above). 2+2+40=44.
    "q1_pricing_summary",
    "q3_shipping_priority",
    "j_broadcast_dim_join",
    "j_left_outer_enrich",
    "j_full_outer_metrics",
    "j_two_key_join",
    "j_interval_join",
    "j_left_outer_interval",
    "j_wide_order_5way",
    "sql_revenue_forecast",
    "a_approx_sketch_daily",
    "t_token_stats",
    "t_substring_dedup",
    "t_decontaminate",
    "t_decontaminate_fraction",
    "t_decontaminate_spans",
    "t_source_mixture",
    "t_ngram_jaccard_dups",
    "t_minhash_lsh_dups",
    "t_lsh_recall_curve",
    "t_dup_clusters",
    "t_leakage_safe_split",
    "t_leakage_safe_split_loose",
    "t_simhash_dups",
    "t_corpus_pipeline",
    "t_cross_source_dedup",
    "t_bm25_topk",
    "t_zipf_profile",
    "t_containment_dups",
    "e_cosine_topk",
    "e_norm_stats",
    "m_doc_embedding_join",
    "m_binary_meta",
    "m_decode_features",
    "m_frame_sample",
    "m_resize_bytes",
    "s_dedup_latest",
    "s_cep_jump",
    "s_cep_browse_buy",
    "t_shuffle_shards",
    # block 3 — code changed THIS round (r13): the four remaining
    # replay gates all drive the bucketed-store refactor
    # (_store_parts two-leg reads, leg-wise verifies) end-to-end;
    # value-verified at sf0.1 this session (140/140 full-catalog
    # pass), but the driver gate should see them on the new code.
    # Changed-code outranks the stale fill.
    "s_dedup_stream_replay",
    "s_decontam_stream_replay",
    "s_split_stream_replay",
    "s_semantic_split_replay",
    # block 4 — r11-stale fill to the cap (oldest-first, registration
    # order as the tiebreak): 44+4+2=50. The four r11-stale p_*/f_*
    # rows displaced by block 3 queue first for the r14 stale drain.
    "q10_returned_items",
    "q5_local_supplier_volume",
    # --- the driver's 50-query cap lands here ---
    "p_projection_filter",
    "p_conditional_delta",
    "p_json_extract",
    "f_scalar_datetime",
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
