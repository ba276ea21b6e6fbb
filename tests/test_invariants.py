"""Structural invariants of the round-6 operators.

The DuckDB oracle says both engines agree; these pin properties that
must hold of the NUMBERS themselves — the kind of bug (off-by-one
window bound, double-counted chunk, negative lag) where both engines
could agree on the same wrong formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.registry import all_queries
from flink_spark.sources import load, table_rows

from conftest import SF_DIR

_Q = all_queries()


def test_sessions_partition_events(spark):
    """Every event lands in exactly one session: session ev_ct sums to
    the event count, and sessions of one user never overlap."""
    out = _Q["w_sessionize"].fn(spark, SF_DIR)
    total = out.agg(F.sum("ev_ct")).collect()[0][0]
    assert total == table_rows(spark, SF_DIR, "events")
    overlap = (
        out.alias("a")
        .join(
            out.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.stt") < F.col("b.stt"))
            & (F.col("b.stt") < F.col("a.edt")),
        )
        .count()
    )
    assert overlap == 0


def test_asof_lag_nonnegative_and_one_row_per_purchase(spark):
    out = _Q["j_asof_nearest"].fn(spark, SF_DIR)
    assert out.filter(F.col("lag_us") < 0).count() == 0
    assert out.count() == out.select("event_id").distinct().count()


def test_hop_fanout_is_exactly_three(spark):
    """30 s / 10 s HOP: total pv across windows = 3 × events."""
    out = _Q["w_hop_windows"].fn(spark, SF_DIR)
    total = out.agg(F.sum("pv")).collect()[0][0]
    assert total == 3 * table_rows(spark, SF_DIR, "events")


def test_chunk_dedup_accounting(spark):
    for r in _Q["t_chunk_dedup"].fn(spark, SF_DIR).collect():
        assert 0 <= r["dup_chunk_ct"] <= r["chunk_ct"]
        assert abs(r["dup_ratio"] - r["dup_chunk_ct"] / r["chunk_ct"]) < 1e-12


def test_cross_source_dedup_ledger_balances(spark):
    out = _Q["t_cross_source_dedup"].fn(spark, SF_DIR).collect()
    kept = sum(r["docs_kept"] for r in out)
    total = sum(r["docs_total"] for r in out)
    assert total == table_rows(spark, SF_DIR, "documents")
    assert all(r["docs_kept"] + r["docs_ceded"] == r["docs_total"] for r in out)
    # one keeper per distinct fingerprint, corpus-wide
    from flink_spark.functions.text import fingerprint

    fps = (
        load(spark, SF_DIR, "documents")
        .select(fingerprint("text").alias("fp"))
        .distinct()
        .count()
    )
    assert kept == fps


def test_retention_cohort_bounds(spark):
    """Offset-0 actives = cohort size; no later offset exceeds it."""
    rows = _Q["s_retention_cohorts"].fn(spark, SF_DIR).collect()
    day0 = {r["cohort_day"]: r["active_users"] for r in rows if r["day_offset"] == 0}
    for r in rows:
        assert r["day_offset"] >= 0
        assert r["active_users"] <= day0[r["cohort_day"]], r


def test_winnow_density_bounds(spark):
    """Selected ≤ positions; distinct ≤ selected; density in (0, 1] and
    near the theoretical 2/(w+1) on random-ish text."""
    for r in _Q["t_winnow_fingerprints"].fn(spark, SF_DIR).collect():
        assert 0 < r["fp_selected"] <= r["window_positions"]
        assert r["fp_distinct"] <= r["fp_selected"]
        assert 0.1 < r["density"] <= 1.0


def test_semi_anti_partition_customers(spark):
    out = _Q["j_semi_anti_customers"].fn(spark, SF_DIR)
    tot = out.agg(
        F.sum(F.col("with_orders") + F.col("without_orders"))
    ).collect()[0][0]
    assert tot == table_rows(spark, SF_DIR, "customer")


def test_pivot_row_sums_match_event_count(spark):
    out = _Q["p_pivot_event_matrix"].fn(spark, SF_DIR)
    from flink_spark.plans.relational import EVENT_TYPES

    expr = sum(F.sum(t) for t in EVENT_TYPES[1:]) + F.sum(EVENT_TYPES[0])
    total = out.agg(expr.alias("n")).collect()[0][0]
    assert total == table_rows(spark, SF_DIR, "events")


def test_unigram_lm_scores_are_negative_logprobs(spark):
    for r in _Q["t_unigram_lm_score"].fn(spark, SF_DIR).collect():
        assert r["mean_doc_logprob"] < 0
        assert 0 <= r["flagged_docs"] <= r["doc_ct"]
    from flink_spark.registry import release_persisted

    release_persisted()


def test_semantic_dedup_accounting(spark):
    """Every cell: kept + dropped == population; totals cover the
    corpus exactly once; the dropped set never includes a cell's
    minimum vec_id (the keep-first rule always keeps the head)."""
    out = _Q["e_semantic_dedup"].fn(spark, SF_DIR)
    rows = out.collect()
    from flink_spark.registry import release_persisted

    release_persisted()
    assert all(r["kept_ct"] + r["dropped_ct"] == r["vec_ct"] for r in rows)
    assert all(r["kept_ct"] >= 1 for r in rows)  # head survives
    assert sum(r["vec_ct"] for r in rows) == table_rows(
        spark, SF_DIR, "embeddings"
    )


def test_quality_mixture_reweight_bounds(spark):
    """Keep counts within quota bounds and pct drawn from QMIX_PCT."""
    from flink_spark.plans.textops import QMIX_PCT

    out = _Q["t_quality_mixture_reweight"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == table_rows(
        spark, SF_DIR, "documents"
    )
    for r in out:
        assert r["keep_pct"] == QMIX_PCT[r["quality_score"]]
        assert 0 <= r["kept"] <= r["n_docs"]
        if r["keep_pct"] == 100:
            assert r["kept"] == r["n_docs"]  # rate 100 keeps everything


def test_pii_redact_masks_digits(spark):
    """Each digit run redacts >= 1 char; masking can only collapse
    payload variety, never exceed the event count."""
    out = _Q["t_pii_redact"].fn(spark, SF_DIR).collect()
    assert sum(r["num_runs"] for r in out) > 0  # live signal on fixture
    for r in out:
        assert r["redacted_chars"] >= r["num_runs"]
        assert 1 <= r["distinct_shapes"] <= r["n_events"]
        assert r["email_hits"] == 0  # fixture carries no emails


def test_mixture_and_pii_plans_are_scan_plus_agg(spark):
    """The reweight and redact plans must be one scan + aggregation —
    no join, no window, no global sort (the fully map-side shape that
    makes them free at 100 TB)."""
    for name in ("t_quality_mixture_reweight", "t_pii_redact"):
        plan = _Q[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        for node in ("Join", "Window", "CartesianProduct"):
            assert node not in plan, (name, node)
