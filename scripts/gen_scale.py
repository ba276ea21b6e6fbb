"""Generate a key-offset N× replica of a fixture dir for scaling benches.

``python scripts/gen_scale.py [factor] [src_dir] [dst_dir]``
(defaults: 10 /root/testdata/sf0.1 /tmp/flink_spark_scale/sf1synth)

The per-round bench fixtures stop at sf0.1; the 100 TB design claims
deserve at least one order-of-magnitude scaling data point. Raw row
duplication would poison it — every duplicated document is an exact
dup of its replicas, so dedup/LSH candidate counts explode
quadratically and measure a pathology, not throughput. Instead each
replica r offsets every key column by ``r * stride`` (joins stay
1:1-scaled: each lineitem replica joins its own orders replica) and
tags document text with a replica-unique token so near-dup semantics
scale linearly like a real corpus. Dimension tables small enough to be
broadcast everywhere (nation, region) are left at original size, as
they would be at any scale.

Replication runs through Spark (distributed union + column arithmetic,
no driver materialization) — the same job shape would produce the
fixture on a cluster.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64  # embedding width of the fixture corpus

# key columns to offset, per table (replica r adds r * stride)
KEYED = {
    "customer": ("c_custkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}
COPY = ("nation", "region")  # true dims: constant size at any sf
STRIDE = 1_000_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/flink_spark_scale/sf1synth"

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_scale")
    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        reps = []
        for r in range(factor):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * STRIDE))
            if t == "documents" and r > 0:
                # remap the token vocabulary per replica (suffix every
                # token) so replicas are NOT near-dups of each other:
                # shingle/signature spaces are disjoint across replicas
                # and near-dup density per doc stays that of the
                # original corpus — what a 10x-larger real corpus looks
                # like. Replica 0 keeps the original text.
                rep = rep.withColumn(
                    "text",
                    F.regexp_replace("text", "([A-Za-z0-9]+)", f"$1x{r}"),
                )
            if t == "embeddings" and r > 0:
                # per-replica ORTHOGONAL transform (coordinate rotation
                # + deterministic sign flips): preserves every
                # within-replica cosine exactly — replica r has the
                # original corpus's neighbor structure — while
                # cross-replica cosines decorrelate to ~0, like
                # genuinely new data. (An additive offset would be
                # wrong both ways: it makes all vectors in a replica
                # mutually similar.)
                signs = [
                    1.0
                    if int(hashlib.md5(f"{r}:{i}".encode()).hexdigest()[0], 16) >= 8
                    else -1.0
                    for i in range(DIM)
                ]
                shifted = F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda i: F.element_at(
                        "embedding", ((i + F.lit(7 * r)) % DIM) + 1
                    ),
                )
                rep = rep.withColumn(
                    "embedding",
                    F.zip_with(
                        shifted,
                        F.array(*[F.lit(s) for s in signs]),
                        lambda x, s: (x * s).cast("float"),
                    ),
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: {factor}x written")


if __name__ == "__main__":
    main()
