"""Measure the MinHash-LSH verify leg: r8 array form vs r9 count form.

``python scripts/bench_minhash_verify.py {sig|old|new|pairkey} [sf_dir]``
(default sf_dir: /tmp/flink_spark_scale/sf10docs — the dense 500k-doc
replica whose candidate density blew the array verify for the Jaccard
sibling in round 8; note the replica naming: sf10docs = 500k docs =
100x the sf0.1 fixture, sf100docs = 5M docs = 1000x)

One leg per invocation — fresh process, same lab discipline as every
SCALING.md number. ``sig`` prints the replica's density signature
(docs, distinct LSH candidate pairs, verified pairs) so walls recorded
against this replica can be told apart from a future regeneration's.

The ``old`` leg reconstructs the round-8 verify exactly: both docs'
full shingle arrays joined onto every candidate, array_intersect per
pair. It exists only as the measured BEFORE. ``new`` is the
co-occurrence-count-over-candidate-docs form the r8 verdict sketched
(measured worst: df-uncapped fan-out). ``pairkey`` is the standalone
reconstruction of the SHIPPED form — the (d1, d2, digest)-keyed count
of ``flink_spark.plans.textops._minhash_pairs`` — and is the leg the
SCALING.md §R9 table's shipped number (79.7 s) came from.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _bands_cand(spark, sf_dir):
    from flink_spark.plans.pairjoin import pair_self_join
    from flink_spark.plans.textops import (
        _band_keys_spark,
        _hashed_shingles_spark,
        _minhash_cols_spark,
        _shingled,
    )

    sh, ex = _shingled(spark, sf_dir, persist=True)
    sigs = (
        _hashed_shingles_spark(ex)
        .groupBy("doc_id")
        .agg(*_minhash_cols_spark())
    )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*_band_keys_spark())).alias("bkey")
    )
    cand = pair_self_join(bands, "doc_id", ["bkey"]).distinct()
    return sh, cand


def old_pairs(spark, sf_dir):
    """The round-8 array-carrying verify, verbatim shape."""
    from flink_spark.plans.textops import JACCARD_THRESHOLD

    sh, cand = _bands_cand(spark, sf_dir)
    x = sh.select(F.col("doc_id").alias("d1"), F.col("sl").alias("sl1"))
    y = sh.select(F.col("doc_id").alias("d2"), F.col("sl").alias("sl2"))
    shared = F.size(F.array_intersect("sl1", "sl2"))
    jac = shared.cast("double") / (F.size("sl1") + F.size("sl2") - shared)
    return (
        cand.join(x, "d1")
        .join(y, "d2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("d1", "d2", jac.alias("jaccard"))
    )


def pairkey_pairs(spark, sf_dir):
    """Candidate-pair-keyed count: postings streamed through a
    (d1, d2, s) equijoin — 1:1 per key by construction (distinct
    shingles per doc, distinct candidate pairs), so no fan-out
    anywhere; exchange is Σ|sl| narrow rows per side and the shared
    count collapses in partial agg."""
    from flink_spark.plans.textops import JACCARD_THRESHOLD
    from flink_spark.registry import track_persist

    sh, cand = _bands_cand(spark, sf_dir)
    cand = track_persist(cand)
    posts = sh.select(
        "doc_id", F.size("sl").alias("sz"), F.explode("sl").alias("s")
    ).select("doc_id", "sz", F.unhex(F.md5("s")).alias("s"))
    p1 = cand.join(
        posts, cand.d1 == posts.doc_id
    ).select("d1", "d2", "s", F.col("sz").alias("sz1"))
    p2 = cand.join(
        posts, cand.d2 == posts.doc_id
    ).select("d1", "d2", "s", F.col("sz").alias("sz2"))
    counts = (
        p1.join(p2, ["d1", "d2", "s"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared"),
             F.first("sz1").alias("sz1"), F.first("sz2").alias("sz2"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("sz1") + F.col("sz2") - F.col("shared")
    )
    return counts.filter(jac >= JACCARD_THRESHOLD).select(
        "d1", "d2", jac.alias("jaccard")
    )


def main() -> None:
    leg = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else (
        "/tmp/flink_spark_scale/sf10docs"
    )

    from flink_spark.registry import release_persisted
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"bench-minhash-{leg}", cpus="32",
                      shuffle_partitions="64")
    t0 = time.time()
    if leg == "sig":
        from flink_spark.plans.textops import _minhash_pairs

        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        _, cand = _bands_cand(spark, sf_dir)
        n_cand = cand.count()
        n_pairs = _minhash_pairs(spark, sf_dir).count()
        print(f"SIG docs={n_docs} lsh_candidates={n_cand} "
              f"verified_pairs={n_pairs} wall={time.time() - t0:.1f}s")
    elif leg == "old":
        n = old_pairs(spark, sf_dir).count()
        print(f"OLD pairs={n} wall={time.time() - t0:.1f}s")
    elif leg == "new":
        from flink_spark.plans.textops import _minhash_pairs

        n = _minhash_pairs(spark, sf_dir).count()
        print(f"NEW pairs={n} wall={time.time() - t0:.1f}s")
    elif leg == "pairkey":
        n = pairkey_pairs(spark, sf_dir).count()
        print(f"PAIRKEY pairs={n} wall={time.time() - t0:.1f}s")
    else:
        raise SystemExit(f"unknown leg {leg!r}")
    release_persisted()


if __name__ == "__main__":
    main()
