"""Generate the ADVERSARIAL-skew embeddings fixture (vector analog of
``gen_skew.py``).

``python scripts/gen_skew_vec.py [dup_copies] [src_dir] [dst_dir]``
(defaults: 10000 /root/testdata/sf0.1 /tmp/flink_spark_scale/skewvecs)

``gen_scale.py`` replicas measure embedding VOLUME (orthogonal
transforms keep vectors spread); this fixture measures the opposite
failure mode — ONE embedding duplicated ``dup_copies`` times (fresh
vec_ids, labels round-robin), so:

- every SRP-LSH band key of the clone set collides → one hot LSH
  bucket per band (``t_embedding_neardup`` / ``e_ann_lsh_topk``);
- every clone quantizes to the same IVF cell → one hot cell
  (``e_semantic_dedup``, the IVF/PQ probes);
- the clone set is one duplicate cluster of multiplicity
  ``dup_copies`` (``e_dup_clusters``).

Default multiplicity is 1e4, not the text fixture's 1e5: the
PAIR-EMITTING operators' OUTPUT is inherently quadratic in duplicate
multiplicity (1e5 identical vectors = 5e9 qualifying pairs in ANY
formulation — which is why real pipelines run exact dedup before
near-dup pairing; see bench_keeper_forms.py's note on
t_dup_clusters). 1e4 clones already put 83% of all rows under one
bucket/cell while keeping the inherent pair volume (5e7) measurable.

Other tables symlink to the source dir. Built through Spark —
distributed union, no driver materialization.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ID_BASE = 10_000_000  # clone ids start here: disjoint from base ids


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/tmp/flink_spark_scale/skewvecs"
    )

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_skew_vec")
    os.makedirs(dst, exist_ok=True)

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_label = emb.select(F.max("label")).collect()[0][0] + 1

    hot = emb.orderBy("vec_id").limit(1).collect()[0]
    clones = spark.range(copies).select(
        (F.col("id") + ID_BASE).alias("vec_id"),
        F.lit(hot.embedding).cast("array<float>").alias("embedding"),
        (F.col("id") % n_label).cast("int").alias("label"),
    )
    out = emb.unionByName(clones).repartition(32)
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    print(f"vec skew fixture at {dst}: {n} vectors ({copies} clones)")


if __name__ == "__main__":
    main()
