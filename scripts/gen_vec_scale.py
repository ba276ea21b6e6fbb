"""Generate an EMBEDDINGS-ONLY N× replica dir for vector-scale benches.

``python scripts/gen_vec_scale.py [factor] [src_dir] [dst_dir]``
(defaults: 250 /root/testdata/sf0.1 /tmp/flink_spark_scale/vecs500k —
250 × the 2,000-vector fixture = 500k vectors)

`gen_scale.py` replicates every table by the same factor, which is
wrong for vector-decade legs: 250× the documents table is 12.5M docs
of dead weight. This variant replicates ONLY ``embeddings`` (same
orthogonal-transform recipe: per-replica coordinate rotation + sign
flips preserves every within-replica cosine exactly while
cross-replica cosines decorrelate to ~0, like genuinely new data) and
COPIES every other table verbatim, so text-side queries keep fixture
cost and the vector side scales.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64

COPY = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents",
)
STRIDE = 1_000_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else (
        "/tmp/flink_spark_scale/vecs500k"
    )

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_vec_scale")
    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    df = spark.read.parquet(f"{src}/embeddings.parquet")
    reps = []
    for r in range(factor):
        rep = df.withColumn("vec_id", F.col("vec_id") + F.lit(r * STRIDE))
        if r > 0:
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
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )
    n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    print(f"wrote {n} vectors to {dst}/embeddings.parquet")


if __name__ == "__main__":
    main()
