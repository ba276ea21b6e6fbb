"""Generate an EMBEDDINGS-ONLY N× replica dir for vector-scale benches.

``python scripts/gen_vec_scale.py [factor] [src_dir] [dst_dir]``
(defaults: 250 /root/testdata/sf0.1 /tmp/flink_spark_scale/vecs500k —
250 × the 2,000-vector fixture = 500k vectors)

``python scripts/gen_vec_scale.py clustered [n] [src_dir] [dst_dir]``
(defaults: 500000 /root/testdata/sf0.1
/tmp/flink_spark_scale/vecs500k_clustered)

`gen_scale.py` replicates every table by the same factor, which is
wrong for vector-decade legs: 250× the documents table is 12.5M docs
of dead weight. This variant replicates ONLY ``embeddings`` (same
orthogonal-transform recipe: per-replica coordinate rotation + sign
flips preserves every within-replica cosine exactly while
cross-replica cosines decorrelate to ~0, like genuinely new data) and
COPIES every other table verbatim, so text-side queries keep fixture
cost and the vector side scales.

The ``clustered`` mode is the STRUCTURED-geometry twin (r12 verdict
item #4): the orthogonal-transform replica is structure-free by
construction — 250 mutually-decorrelated copies of the fixture, the
regime where a product quantizer provably cannot rank (every ADC
distance is ~equidistant) — so every PQ/IVF recall number measured on
it is a worst-case floor, not a realistic estimate. Real embedding
corpora are CLUSTERED (topics, languages, modalities). This mode
draws n vectors from a Gaussian mixture around the fixture's 10 label
centroids with the fixture's own per-label per-dimension spread
(deterministic seed), preserving the fixture's cluster geometry at
500k scale: IVF cells concentrate, PQ codebooks have structure to
exploit, and the sampled recall scoreboard measures the regime the
defaults actually deploy into. Pure numpy + pyarrow — no Spark
session, so it can't contaminate a concurrent bench.
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


def _copy_tables(src: str, dst: str) -> None:
    import shutil

    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copy(s, d)


def clustered_main() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    dst = sys.argv[4] if len(sys.argv) > 4 else (
        "/tmp/flink_spark_scale/vecs500k_clustered"
    )
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    _copy_tables(src, dst)
    fix = pq.read_table(f"{src}/embeddings.parquet")
    E = np.stack(
        [np.asarray(v, dtype=np.float64) for v in
         fix.column("embedding").to_pylist()]
    )
    labels = np.asarray(fix.column("label").to_pylist())
    uniq = np.sort(np.unique(labels))
    cent = np.stack([E[labels == c].mean(axis=0) for c in uniq])
    spread = np.stack([E[labels == c].std(axis=0) for c in uniq])

    rng = np.random.RandomState(13)  # deterministic per invocation
    lab = rng.randint(0, len(uniq), size=n)
    out = cent[lab] + rng.standard_normal((n, E.shape[1])) * spread[lab]
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(
            list(out.astype(np.float32)), type=pa.list_(pa.float32())
        ),
        "label": pa.array(uniq[lab].astype(np.int32)),
    })
    # Write a DIRECTORY of 32 files, not pq.write_table's default
    # single file with one 500k-row row group: that layout is an
    # unsplittable scan unit (one row group can't split, and even
    # chunked row groups inside a ~131 MB file yield only
    # ceil(131/128 MB) = 2 partitions under default
    # files.maxPartitionBytes) — every Arrow-batched kernel over the
    # replica (IVF assignment, exact-truth cosine, PQ encode) ran as
    # ONE task no matter how many cores the session had. That layout
    # artifact, not cell skew, was most of the r13 "IVF wall on
    # clustered geometry" watch item (158 s -> ~29 s at local[32]
    # once split; measured occupancy is uniform: 708 cells, max
    # share 0.2%). 32 files matches the Spark-written orthogonal
    # replica's layout.
    out_dir = f"{dst}/embeddings.parquet"
    if os.path.isfile(out_dir):
        os.remove(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    files = 32
    step = (n + files - 1) // files
    for i in range(files):
        pq.write_table(
            tbl.slice(i * step, step),
            f"{out_dir}/part-{i:05d}.parquet",
        )
    print(f"wrote {n} clustered vectors to {out_dir} ({files} files)")


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
    if len(sys.argv) > 1 and sys.argv[1] == "clustered":
        clustered_main()
    else:
        main()
