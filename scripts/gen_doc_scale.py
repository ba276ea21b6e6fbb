"""Generate a DOCUMENTS-ONLY N× replica dir for text-scale benches.

``python scripts/gen_doc_scale.py [factor] [src_dir] [dst_dir]``
(defaults: 1000 /root/testdata/sf0.1 /tmp/flink_spark_scale/sf100docs
— 1000 × the 5,000-doc fixture = 5M documents)

The documents twin of ``gen_vec_scale.py``: `gen_scale.py` replicates
every table by the same factor, which for the flagship's 5M-doc
budget leg would drag 600M lineitem rows of dead weight along.
This variant replicates ONLY ``documents`` and copies every other
table verbatim. Two differences from gen_scale's documents path,
both needed at factor 1000:

- the replica axis is an ``explode(sequence(0, factor-1))`` — one
  narrow map, not a union of ``factor`` DataFrames (a 1000-branch
  union plan chokes the analyzer);
- the per-replica token remap suffixes every whitespace token with
  ``x<r>`` via split/transform/array_join (gen_scale's regexp with a
  constant replacement can't carry the replica number as a column).
  Same property: replicas are NOT near-dups of each other — shingle
  spaces are disjoint across replicas, so near-dup density per doc
  stays that of the original corpus, like a genuinely larger crawl.

As with every regenerated replica: never compare walls across
regenerations — only within one directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

COPY = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
)
STRIDE = 1_000_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else (
        "/tmp/flink_spark_scale/sf100docs"
    )

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_doc_scale")
    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    from flink_spark.plans.textops import EVAL_SOURCE

    docs = spark.read.parquet(f"{src}/documents.parquet")
    # The held-out benchmark source stays FIXED while the corpus
    # scales (r13): in production the eval set is a constant-size
    # benchmark, and replicating it factor× breaks the contract every
    # decontamination stage is built on — the eval shingle set stops
    # being broadcast-sized (at factor 10000 its driver collect alone
    # exceeds spark.driver.maxResultSize). Eval docs are copied
    # verbatim; only the corpus replicates.
    eval_docs = docs.filter(F.col("source") == EVAL_SOURCE)
    corpus = docs.filter(F.col("source") != EVAL_SOURCE)
    # Parallelize BEFORE the explode: the source fixture is one file =
    # one task, and a repartition placed after the select would
    # exchange only the exploded output — the whole factor× explode +
    # per-token remap would run single-threaded first (measured: at
    # factor 10000 that one task is an hour; spread across 64 it's
    # minutes). Shuffling 5k source rows is free.
    out = (
        corpus.repartition(64)
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("r")
        )
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("r").cast("long") * F.lit(STRIDE),
        )
        .withColumn(
            "text",
            F.when(F.col("r") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(
                            w, F.lit("x"), F.col("r").cast("string")
                        ),
                    ),
                    " ",
                )
            ),
        )
        .drop("r")
    )
    # already 64 partitions from the pre-explode repartition; a second
    # exchange here would move the full factor× row set for nothing
    out.unionByName(eval_docs).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"wrote {n} documents to {dst}/documents.parquet")


if __name__ == "__main__":
    main()
