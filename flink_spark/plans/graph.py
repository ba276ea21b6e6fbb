"""Connected components over a pair graph — the shared clustering core.

Dedup operators emit verified near-dup PAIRS (text: MinHash-LSH in
``plans.textops``; embeddings: SRP-LSH cosine in ``plans.similarity``);
what a curation pipeline acts on is the transitive closure — duplicate
CLUSTERS. This module holds the one implementation both modalities
share:

- ``connected_components(pairs)``: iterative min-label propagation on
  Spark (see ``t_dup_clusters`` for the algorithm/scale discussion);
- ``CC_SQL_CTES``: the DuckDB twin — a recursive reachability CTE over
  the same edges, assuming an in-scope ``pairs(d1, d2, ...)`` CTE.

Reference provenance: the reference has no clustering operator (its
dedup is per-key latest-row state, ``gmall-realtime``); this is part of
the beyond-reference LLM-training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Recursive min-label walk over pairs(d1, d2): emits labels(doc_id,
# cluster_id). Splice after a pairs CTE inside a WITH RECURSIVE block.
CC_SQL_CTES = """edges AS (
      SELECT d1 AS u, d2 AS v FROM pairs
      UNION ALL
      SELECT d2, d1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
    reach(root, doc_id) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT r.root, e.v FROM reach r JOIN edges e ON r.doc_id = e.u
    ),
    labels AS (
      SELECT doc_id, MIN(root) AS cluster_id FROM reach GROUP BY doc_id
    )"""


def connected_components(
    pairs: DataFrame, max_rounds: int = 20, star_after: int = 8
) -> DataFrame:
    """labels(doc_id, cluster_id) for the graph given by pairs(d1, d2).

    Three-phase. Phase 0 is ONE closed-neighborhood-min contraction
    pass: every node maps to ``min(N(u) ∪ {u})`` (a single
    groupBy-min over the symmetric edges) and the edge set is
    rewritten over those labels. Duplicate-cluster graphs are
    band-clique unions — near-cliques collapse to single labels in
    this pass, so the graph the ITERATIVE phases see is a small
    quotient (hub-and-spoke components vanish entirely), which is
    what bounds round cost when the pair graph is millions of rows.
    The pass is sound for any graph: nodes sharing a label share a
    component, the quotient preserves connectivity, and a component's
    global min m always maps to itself (its neighborhood has no
    smaller id), so the quotient component's min IS m and composing
    the two maps yields min-of-component labels.

    Then min-label propagation on the quotient (one join + one
    groupBy-min per round, converges in diameter rounds), and if that
    has not converged after ``star_after`` rounds, the graph has
    chain-shaped components and the algorithm switches to the
    alternating large-star/small-star contraction of Kiveris et al.
    (SOCC'14), which converges in O(log² n) rounds regardless of
    diameter — no cliff, no RuntimeError, just the asymptotically
    right algorithm when the cheap one stops being cheap. Convergence
    of the propagation phase is detected by the monotone label-sum
    invariant (exact decimal, one action per round); per-round lazy
    ``localCheckpoint`` cuts the iterative lineage (swap for a
    reliable HDFS checkpoint on a real cluster).

    ``pairs`` must already be persisted/cheap: phase 0 re-reads it.
    """
    edges0 = pairs.select(
        F.col("d1").alias("u"), F.col("d2").alias("v")
    ).union(pairs.select(F.col("d2").alias("u"), F.col("d1").alias("v")))
    first = (
        edges0.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("_mn", "u").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    lu = first.select(F.col("u").alias("_eu"), F.col("lbl").alias("_lu"))
    lv = first.select(F.col("u").alias("_ev"), F.col("lbl").alias("_lv"))
    edges = (
        edges0.join(lu, edges0.u == lu._eu)
        .join(lv, edges0.v == lv._ev)
        .select(F.col("_lu").alias("u"), F.col("_lv").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if edges.limit(1).count() == 0:
        # EDGELESS quotient — the common duplicate-graph case (clique
        # unions collapse entirely in phase 0): the phase-0 labels are
        # already the component minima (an edgeless quotient means the
        # labeling is constant per component, and every component's
        # min labels itself), so skip the propagation loop outright.
        # The probe shares its cost with the loop it replaces (first
        # action materializes the lazy checkpoint either way); what it
        # saves is two full join+groupBy+collect driver round-trips —
        # a fixed ~1 s per call that every CC consumer (dup clusters,
        # both leakage splits, the training pipeline, the streaming
        # split) was paying even on tiny graphs.
        core = edges.select(
            F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
        )
    else:
        core = _propagate(edges, min(star_after, max_rounds))
    if core is None:
        core = _star_contraction(
            edges.filter(F.col("u") < F.col("v")).select(
                F.col("u").alias("d1"), F.col("v").alias("d2")
            ),
            max_rounds,
        )
    core = core.select(
        F.col("doc_id").alias("_lbl"), F.col("cluster_id").alias("_root")
    )
    return first.join(
        core, first.lbl == core._lbl, "left"
    ).select(
        F.col("u").alias("doc_id"),
        F.coalesce("_root", "lbl").alias("cluster_id"),
    )


def _propagate(edges: DataFrame, rounds: int) -> DataFrame | None:
    """Min-label propagation over symmetric ``edges(u, v)``.

    Returns labels(doc_id, cluster_id) on convergence, None if the
    round budget ran out (caller falls back to star contraction).
    """
    labels = (
        edges.select(F.col("u").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    prev: object = object()  # sentinel: never equals a real first sum
    for _ in range(rounds):
        prop = edges.join(labels, edges.u == labels.doc_id).select(
            F.col("v").alias("doc_id"), "cluster_id"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=False)
        )
        cur = labels.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s
        if cur == prev:
            return labels
        prev = cur
    # an EDGELESS quotient (every component collapsed in phase 0) has
    # nothing to iterate: zero rounds is already converged
    if rounds == 0 and labels.limit(1).count() == 0:
        return labels
    return None


def _edge_signature(edges: DataFrame):
    """(count, Σu, Σv) of an edge set — exact decimal sums, one action.
    Equal signatures across rounds flag a *candidate* fixpoint; the
    caller confirms with a set compare before trusting it."""
    row = edges.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
    ).collect()[0]
    return (row.c, row.su, row.sv)


def _star_contraction(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al., SOCC'14).

    Each round rewires edges toward neighborhood minima:

    - large-star: every neighbor v > u links to min(N(u) ∪ {u});
    - small-star: every neighbor v ≤ u (plus u itself) links to
      min(N(u) ∪ {u}), over the downward (u > v) edge form.

    The edge set converges to stars centered at component minima in
    O(log² n) rounds independent of diameter — the scale path for
    chain-shaped duplicate graphs where per-round propagation would
    need diameter rounds. Each round is two groupBy-min + two joins
    on the (small) pair graph; one scalar action checks the
    (count, Σu, Σv) signature, and a candidate fixpoint is confirmed
    with an exact set compare before being trusted.
    """
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    for _ in range(max_rounds):
        # large-star over the symmetric neighborhood: emits (v, m) for
        # v > u with m = min(N(u) ∪ {u}) — output is downward (u > v)
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", "u").alias("mn")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the downward form: every v in N(u) plus u
        # links to min(N(u)); output stays downward
        mins2 = large.groupBy("u").agg(F.min("v").alias("mn"))
        nxt = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(mins2.select("u", F.col("mn").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sig = _edge_signature(nxt)
        # prev_sig is last round's nxt (== this round's input edges);
        # a match plus the equal counts it implies flags a candidate
        # fixpoint — confirm with an exact set compare before trusting
        if sig == prev_sig and nxt.exceptAll(edges).limit(1).count() == 0:
            edges = nxt
            break
        prev_sig = sig
        edges = nxt
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds; "
            "raise max_rounds"
        )
    roots = (
        edges.select(F.col("v").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .unionByName(roots)
        .distinct()
    )
