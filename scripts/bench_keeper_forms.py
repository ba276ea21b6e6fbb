"""Adversarial-skew bench: retired keeper-WINDOW forms vs shipped AGG forms.

``python scripts/bench_keeper_forms.py [skew_dir] [kernel_rows]``
(defaults: /tmp/flink_spark_scale/skewdocs 3000000)

Round 6 retired every content-keyed keeper window on equivalence tests
and well-behaved-corpus measurements; this script supplies the missing
ADVERSARIAL measurement (VERDICT r6 item #4). Two layers:

1. KERNELS, in-memory at ``kernel_rows`` with ~95% of rows under ONE
   hot key — the isolated keeper step, where the two formulations
   differ and nothing else does:
     - fp-canon:   min(doc_id) per fingerprint → per-row keep flag
                   (t_corpus_pipeline / t_training_pipeline stage 2)
     - x-source:   priority winner per fingerprint → per-source ledger
                   (t_cross_source_dedup)
     - cluster:    keep-best member per cluster (t_dup_clusters)
   The window form sorts the hot key's entire multiplicity in ONE
   task; the agg form collapses it map-side. (t_dup_clusters' full
   query is deliberately NOT run on a 1e5-duplicate corpus: candidate
   PAIR COUNT is quadratic in duplicate multiplicity in any
   formulation — at crawl scale the exact-dedup stage runs first,
   which is precisely what the pipelines do.)

2. FULL shipped queries on the parquet skew fixture
   (``scripts/gen_skew.py``): absolute walls proving the composed
   plans absorb the hot fingerprint.

Timing: one untimed warm pass (codegen), then a timed pass through the
noop sink, same discipline as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOT_FRAC = 0.95


def _noop(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def _timed(fn) -> float:
    fn()  # warm: codegen + shuffle file cache
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def _kernel_rows(spark, n: int) -> DataFrame:
    """(doc_id, fp, source): ~95% of rows share fp 'hot', rest unique."""
    hot_n = int(n * HOT_FRAC)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot_n, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("fp"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string"))
        .alias("source"),
    )


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/flink_spark_scale/skewdocs"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.session import get_spark

    spark = get_spark(app_name="bench_keeper_forms")
    results: dict[str, float] = {}

    rows = _kernel_rows(spark, n).persist()
    rows.count()

    # --- fp-canon keeper ------------------------------------------------
    def canon_window():
        w = Window.partitionBy("fp")
        _noop(
            rows.withColumn(
                "canon",
                (F.col("doc_id") == F.min("doc_id").over(w)).cast("int"),
            ).groupBy("source").agg(F.sum("canon"))
        )

    def canon_agg():
        winners = rows.groupBy("fp").agg(F.min("doc_id").alias("_keep"))
        _noop(
            rows.join(winners, "fp")
            .withColumn(
                "canon", (F.col("doc_id") == F.col("_keep")).cast("int")
            ).groupBy("source").agg(F.sum("canon"))
        )

    results["fp_canon_window"] = _timed(canon_window)
    results["fp_canon_agg"] = _timed(canon_agg)

    # --- cross-source ledger -------------------------------------------
    def xsource_window():
        w = Window.partitionBy("fp").orderBy("source", "doc_id")
        r = rows.withColumn("rn", F.row_number().over(w))
        _noop(
            r.groupBy("source").agg(
                F.count(F.lit(1)).alias("docs_total"),
                F.sum((F.col("rn") == 1).cast("int")).alias("docs_kept"),
            )
        )

    def xsource_agg():
        totals = rows.groupBy("source").agg(
            F.count(F.lit(1)).alias("docs_total")
        )
        kept = (
            rows.groupBy("fp")
            .agg(F.min(F.struct("source", "doc_id")).alias("_w"))
            .groupBy(F.col("_w.source").alias("source"))
            .agg(F.count(F.lit(1)).alias("docs_kept"))
        )
        _noop(totals.join(kept, "source", "left"))

    results["xsource_window"] = _timed(xsource_window)
    results["xsource_agg"] = _timed(xsource_agg)

    # --- cluster keep-best ---------------------------------------------
    memb = rows.select(
        F.when(F.col("fp") == "hot", F.lit(0))
        .otherwise(F.col("doc_id")).alias("cluster_id"),
        "doc_id",
        (F.col("doc_id") % 997 + 10).alias("len"),
    ).persist()
    memb.count()

    def cluster_window():
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("len").desc(), F.col("doc_id").asc()
        )
        _noop(
            memb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )

    def cluster_agg():
        _noop(
            memb.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.max(
                    F.struct(F.col("len"), (-F.col("doc_id")).alias("_nid"))
                ).alias("_best"),
            )
        )

    results["cluster_window"] = _timed(cluster_window)
    results["cluster_agg"] = _timed(cluster_agg)
    rows.unpersist()
    memb.unpersist()

    # --- full shipped queries on the parquet skew fixture ---------------
    qs = all_queries()
    for name in ["t_cross_source_dedup", "t_corpus_pipeline",
                 "t_training_pipeline"]:
        def run(name=name):
            try:
                _noop(qs[name].fn(spark, skew_dir))
            finally:
                release_persisted()

        results[f"full_{name}"] = _timed(run)

    print(json.dumps({"kernel_rows": n, "skew_dir": skew_dir,
                      "times_sec": results}))


if __name__ == "__main__":
    main()
