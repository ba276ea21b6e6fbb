"""flink_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference Flink streaming warehouse
(BillEsaisa/flink-, surveyed in /root/repo/SURVEY.md) as idiomatic
Spark: DataFrame/SQL for the relational core, Structured Streaming +
applyInPandasWithState for the stateful streaming machinery, and a set
of large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory / tuning knobs.
- ``sources``    : batch + streaming readers over the fixture tables.
- ``functions``  : scalar/text helper functions (exact-decimal sums,
                   ClickHouse-compat shims, tokenizers, fingerprints).
- ``operators``  : reusable operator library (dedup, similarity, CEP,
                   config-driven routing, multimodal plumbing).
- ``plans``      : the query catalog — every operator of SURVEY.md §2
                   expressed as a (Spark DataFrame fn, DuckDB oracle
                   SQL) pair registered in ``registry``.
- ``streaming``  : Structured Streaming jobs mirroring the reference's
                   DWD/DWS pipelines, with batch-equivalent oracles.
"""

__version__ = "0.1.0"
