"""Query catalog — importing this package registers every query.

Modules map to SURVEY.md §2 operator families:

- ``relational``  : P2-P4 projections/filters, J1-J7 joins, A8-A11 +
                    T1-T3 + U3 ADS-style aggregates (batch core).
- ``ads``         : 1:1 parity with the reference's 20 REST mapper
                    queries (funnel unions, composite full-outer,
                    top-k GMV, subsidy rate, keyword score).
- ``windows``     : A1-A4 tumbling event-time window aggregates.
- ``state``       : A5-A7, W8 stateful-streaming ops in their exact
                    batch formulations (the oracle semantics).
- ``routing``     : config-driven routing + pruning (J6/P7), 1→5
                    split with dirty side-output (P5/P1), CDC
                    MAP<STRING,STRING> envelope projection (P2).
- ``textops``     : dedup family (exact / n-gram Jaccard / MinHash-LSH)
                    and text analysis (lang-id, quality, tokens,
                    fingerprints) over ``documents``.
- ``similarity``  : embedding cosine top-k + binary/multimodal
                    plumbing over ``embeddings``/``documents``.
- ``tokentrain``  : BPE merge-table training + deterministic global
                    training-order shuffle (post-curation steps).
"""

from flink_spark.plans import (  # noqa: F401
    ads,
    relational,
    routing,
    similarity,
    state,
    textops,
    tokentrain,
    windows,
)
