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

import os

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


_PERSISTED: list[tuple[DataFrame, object | None]] = []
_WARNED_NO_RDD_HANDLE = False


def track_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize an intermediate, CUT ITS LINEAGE, and register it for
    ``release_persisted``.

    Catalog queries materialize shared intermediates (e.g. the LSH
    shingle table feeding both sides of a candidate join) but return a
    lazy DataFrame, so they can't release before the caller consumes
    it. Harnesses that run many queries in one session (bench, the
    oracle compare, the driver gate) call ``release_persisted()`` after
    each query's action completes — otherwise blocks accumulate for the
    life of the session and pin executor storage memory.

    Since r14 the barrier is ``localCheckpoint`` rather than
    ``persist()+count()``: persist keeps the full logical lineage, so
    with AQE every downstream query stage re-optimizes a plan that
    still CONTAINS the whole upstream pipeline — on the composed
    pipelines (the widest plans in the catalog) that driver-side
    re-planning was measured at ~50% of the query wall (5.45 s of
    10.97 s with zero jobs running, profile_query.py r14).
    ``localCheckpoint`` truncates the plan at the materialization point
    (guide §3.3/§5: "materialising an intermediate — write + read
    back, or localCheckpoint — truncates the plan"), which cut the
    flagship pipelines 40%/34% and every pair-chain query 16-29%
    (min-of-3 interleaved A/B, OPTIMIZATION_r14.md). The barrier
    semantics are unchanged: eager=True runs the subtree exactly once
    before any consumer exists (the race-avoidance the old count()
    bought); eager=False keeps the materialization lazy for strictly
    sequential consumers.

    Trade-off at cluster scale: a localCheckpoint is non-reliable — a
    lost executor cannot recompute its blocks from lineage (a cached
    frame could). ``FLINK_SPARK_CUT_LINEAGE=0`` selects the reliable
    profile instead: ``persist(DISK_ONLY)`` + count(), which keeps the
    full lineage (lost blocks recompute) and writes the materialized
    partitions to local disk rather than pinning executor storage
    memory — the right shape for a 100 TB run where the tracked
    intermediates dwarf cluster RAM (guide §5: "cached data competes
    with execution memory"). On the local bench the huge-plan
    re-optimization cost that truncation removes GROWS with plan
    width, so the default stays "cut".

    Consumer contract (cut profile): a checkpointed frame's blocks are
    freed by ``release_persisted()`` and are NOT recomputable from
    lineage — every consumer must run its action(s) BEFORE the harness
    releases. All catalog harnesses (bench, oracle compare, driver
    gate) do exactly one action per query, then release.
    """
    if os.environ.get("FLINK_SPARK_CUT_LINEAGE", "1") != "0":
        df = df.localCheckpoint(eager=eager)
        # Resolve the checkpointed RDD handle NOW (cheap: the analyzed
        # plan is already a LogicalRDD) so release_persisted() doesn't
        # have to reflect on plan internals at release time — the
        # handle stays valid for the frame's whole life.
        jrdd = None
        try:
            lp = df._jdf.queryExecution().analyzed()
            if lp.getClass().getSimpleName() == "LogicalRDD":
                jrdd = lp.rdd()
        except Exception:
            global _WARNED_NO_RDD_HANDLE
            if not _WARNED_NO_RDD_HANDLE:
                _WARNED_NO_RDD_HANDLE = True
                import warnings

                warnings.warn(
                    "track_persist: could not resolve the checkpointed "
                    "RDD handle (Spark internals changed?); checkpoint "
                    "blocks will be freed by the ContextCleaner on GC "
                    "instead of release_persisted()",
                    RuntimeWarning,
                    stacklevel=2,
                )
        _PERSISTED.append((df, jrdd))
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.DISK_ONLY)
    # count() materializes the barrier eagerly: most tracked
    # intermediates feed BOTH sides of a downstream self-join, and lazy
    # persist lets the two join stages race to compute the same
    # partitions (duplicate work + "Block already exists" churn).
    if eager:
        df.count()
    _PERSISTED.append((df, None))
    return df


def release_persisted() -> None:
    """Release every intermediate tracked by ``track_persist``.

    Contract: call only after the tracked frames' consumers have run
    their actions. In the default cut-lineage profile the frames are
    localCheckpoints — once their blocks are freed here they CANNOT be
    recomputed (a later action on a released frame raises a
    missing-block error). A harness that re-executes returned frames
    across release points must run with ``FLINK_SPARK_CUT_LINEAGE=0``
    (reliable persist profile, lineage recovery intact).
    """
    while _PERSISTED:
        df, jrdd = _PERSISTED.pop()
        df.unpersist()
        # A checkpointed frame is not in the CacheManager (unpersist()
        # above is a no-op for it): free its RDD blocks directly so a
        # many-query session doesn't accumulate them until a JVM GC.
        # The handle was resolved at track_persist time.
        if jrdd is not None:
            try:
                jrdd.unpersist(False)
            except Exception:
                pass  # best-effort: blocks fall to the ContextCleaner


# The driver's correctness gate snapshots at most 50 catalog queries per
# round, walking the catalog in iteration order — queries that land after
# the cap never get a CORRECTNESS row. Names listed here are emitted first:
# queries with no driver row in any round yet, then this round's new
# queries, then queries whose only green row is from an old round. The
# remainder (all green in the latest snapshot) follow in registration
# order and absorb the cap.
_SNAPSHOT_FIRST = (
    # ===== r14 rotation =====
    # block -1 — NEW this round, never driver-checked: the trained
    # coarse-quantizer IVF query (ivf_train unrolled into a
    # two-Lloyd-round DuckDB oracle; SCALING.md §R14's defaults
    # ruling made it a catalog query).
    "e_ivf_trained_topk",
    # block 0 — code changed THIS round (r14, VERDICT r13 item #1):
    # all six replay gates now run with compact_every=2 so the
    # in-stream compaction fires UNDER the driver oracle; the three
    # epoch-emulated gates additionally replay FOUR slices, so their
    # final micro-batch genuinely PROBES the bucketed base through the
    # two-leg _store_parts path (oracles re-derived at slices=4).
    "s_dedup_stream_replay",
    "s_ensemble_dedup_replay",
    "s_curation_stream_replay",
    "s_split_stream_replay",
    "s_semantic_split_replay",
    "s_decontam_stream_replay",
    # block 1 — the full 42-row r11-stale drain (VERDICT r13 item #2;
    # oldest-first, registration order as the tiebreak — the order
    # gen_rotation.py recommends). 6+42=48.
    "p_projection_filter",
    "p_conditional_delta",
    "p_json_extract",
    "f_scalar_datetime",
    "ads_channel_stats",
    "ads_conditional_score",
    "ads_hourly_stats",
    "ads_topk_users",
    "a_salted_hot_key_agg",
    "u_union_metrics",
    "j_lru_dim_join",
    "t_stratified_sample",
    "t_lsh_precision_stats",
    "t_keep_best_dedup",
    "t_context_chunks",
    "t_distinctive_terms",
    "t_perplexity_buckets",
    "t_table_profile",
    "ads_funnel_union",
    "ads_category_fullouter",
    "ads_gmv_topk_brand",
    "ads_subsidy_rate",
    "ads_keyword_score",
    "ads_province_stats",
    "r_config_routing",
    "p_split_counts",
    "p_cdc_map_projection",
    "e_filtered_topk",
    "e_ann_lsh_topk",
    "e_hard_negatives_topk",
    "t_embedding_neardup",
    "e_dup_clusters",
    "e_lsh_recall_curve",
    "x_ensemble_dup_clusters",
    "x_modality_agreement",
    "e_leakage_safe_split",
    "e_centroid_outliers",
    "e_semantic_dedup",
    "e_semantic_decontaminate",
    "e_sq8_topk",
    "s_daily_unique_users",
    "w_topn_per_window",
    # block 2 — r12 fill to the cap (oldest remaining, registration
    # order): 1+6+42=49, +1 fill = 50. The new query displaced
    # j_asof_nearest below the cap; it stays r12-fresh (still checked
    # by the full-catalog sf0.1 compare) and leads the r15 fill.
    "ads_rollup_matrix",
    # --- the driver's 50-query cap lands here ---
    "j_asof_nearest",
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
