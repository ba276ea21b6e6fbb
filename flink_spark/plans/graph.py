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


def connected_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """labels(doc_id, cluster_id) for the graph given by pairs(d1, d2).

    Iterative min-label propagation: label(v) ← min(label(v), labels
    of v's neighbors) to a fixpoint; the label is the smallest id in
    the component. Each round is one join + one groupBy-min on the
    pair graph (only ids with a verified near-dup — orders of
    magnitude smaller than the corpus), rounds are bounded by
    component diameter (LSH components are band-clique unions, so
    tiny in practice; ``max_rounds`` guards adversarial chains — the
    O(log n)-round large-star/small-star contraction of Kiveris et
    al. drops in if a corpus ever hits it). Convergence is detected
    by the monotone label-sum invariant (exact decimal, one action
    per round); per-round lazy ``localCheckpoint`` cuts the iterative
    lineage (swap for a reliable HDFS checkpoint on a real cluster).

    ``pairs`` must already be persisted/cheap: the symmetrizing union
    reads it twice per round.
    """
    edges = pairs.select(F.col("d1").alias("u"), F.col("d2").alias("v")).union(
        pairs.select(F.col("d2").alias("u"), F.col("d1").alias("v"))
    )
    labels = (
        edges.select(F.col("u").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    prev = None
    for _ in range(max_rounds):
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
            break
        prev = cur
    else:
        # an unconverged label table is NOT a component labeling —
        # returning it silently would split clusters. Fail loudly; a
        # corpus that legitimately hits this has chain-shaped dup
        # components and wants the O(log n)-round star contraction.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds or switch to large-star/small-star contraction"
        )
    return labels
