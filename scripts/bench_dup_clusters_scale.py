"""t_dup_clusters at the third decade (5M docs): wall + CC kernel split.

``python scripts/bench_dup_clusters_scale.py {sig|full|cc} [sf_dir]``
(default sf_dir: /tmp/flink_spark_scale/sf100docs — 5M docs = 1000x
the sf0.1 fixture; sf10docs = 500k = 100x)

One leg per fresh process. ``sig`` records the replica's density
signature (docs, LSH candidates, verified pairs, clusters) — walls
are only comparable against the same signature, never across
gen_scale.py regenerations. ``full`` is the end-to-end catalog query
(pair generation dominates). ``cc`` isolates the connected-components
kernel on the persisted pair table and times the shipped phase-0
closed-neighborhood-min contraction against the round-7 form (plain
propagation with star-contraction fallback) in the same session,
checking the label tables agree exactly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def cc_no_contract(pairs, max_rounds: int = 20, star_after: int = 8):
    """The round-7 kernel: propagation + star fallback, NO phase 0."""
    from flink_spark.plans.graph import _propagate, _star_contraction

    edges = (
        pairs.select(F.col("d1").alias("u"), F.col("d2").alias("v"))
        .union(pairs.select(F.col("d2").alias("u"), F.col("d1").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = _propagate(edges, min(star_after, max_rounds))
    if labels is None:
        labels = _star_contraction(
            edges.filter(F.col("u") < F.col("v")).select(
                F.col("u").alias("d1"), F.col("v").alias("d2")
            ),
            max_rounds,
        )
    return labels


def main() -> None:
    leg = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else (
        "/tmp/flink_spark_scale/sf100docs"
    )

    from flink_spark.registry import release_persisted, track_persist
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"bench-dupclusters-{leg}", cpus="32",
                      shuffle_partitions="64")
    if leg == "sig":
        from flink_spark.plans.graph import connected_components
        from flink_spark.plans.textops import _minhash_pairs

        t0 = time.time()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        pairs = track_persist(
            _minhash_pairs(spark, sf_dir).select("d1", "d2")
        )
        n_pairs = pairs.count()
        n_clusters = (
            connected_components(pairs)
            .select("cluster_id").distinct().count()
        )
        print(f"SIG docs={n_docs} verified_pairs={n_pairs} "
              f"clusters={n_clusters} wall={time.time() - t0:.1f}s")
    elif leg == "full":
        from flink_spark.registry import spark_queries

        t0 = time.time()
        spark_queries()["t_dup_clusters"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        print(f"FULL t_dup_clusters wall={time.time() - t0:.1f}s")
    elif leg == "cc":
        from flink_spark.plans.graph import connected_components
        from flink_spark.plans.textops import _minhash_pairs

        pairs = track_persist(
            _minhash_pairs(spark, sf_dir).select("d1", "d2")
        )
        n_pairs = pairs.count()
        t0 = time.time()
        with_c = connected_components(pairs)
        n_with = with_c.groupBy("cluster_id").count().count()
        t_with = time.time() - t0
        t0 = time.time()
        without = cc_no_contract(pairs)
        n_without = without.groupBy("cluster_id").count().count()
        t_without = time.time() - t0
        same = (
            with_c.exceptAll(without).limit(1).count() == 0
            and without.exceptAll(with_c).limit(1).count() == 0
        )
        print(f"CC pairs={n_pairs} contraction={t_with:.1f}s "
              f"(clusters={n_with}) r7-form={t_without:.1f}s "
              f"(clusters={n_without}) labels_identical={same}")
    else:
        raise SystemExit(f"unknown leg {leg!r}")
    release_persisted()


if __name__ == "__main__":
    main()
