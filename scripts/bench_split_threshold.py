"""Measure the leakage-safe split at the dedup vs loose threshold.

``python scripts/bench_split_threshold.py {sig|pairs|split|pipeline} \
    [threshold] [sf_dir]``
(default threshold 0.8; default sf_dir /tmp/flink_spark_scale/sf10docs —
the dense 500k-doc replica; see bench_minhash_verify.py for the replica
naming trap: sf10docs = 500k docs = 100x sf0.1, sf100docs = 5M = 1000x)

One leg per invocation, fresh process — the SCALING.md lab discipline.

- ``sig``: density signature at the given threshold (docs, LSH
  candidate pairs, verified pairs, CC cluster count) so the qualifying-
  pair growth at the loose threshold is recorded against this exact
  replica generation.
- ``pairs``: wall of verified-pair generation (the shared kernel
  ``_minhash_pairs`` at the threshold).
- ``split``: wall of the full leakage-safe split audit at the
  threshold (``_leakage_split_tagged`` + audit aggregate — the body of
  t_leakage_safe_split / t_leakage_safe_split_loose).
- ``pipeline``: wall of t_training_pipeline (threshold arg ignored) —
  the round-10 pipeline with the pair-keyed verify + cluster-keyed
  split, for the decade compare against the r9 array-verify form.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    leg = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else (
        "/tmp/flink_spark_scale/sf10docs"
    )

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"bench-split-{leg}", cpus="32",
                      shuffle_partitions="64")
    from flink_spark.plans.graph import connected_components
    from flink_spark.plans.textops import (
        _leakage_split_audit,
        _leakage_split_tagged,
        _minhash_pairs,
    )

    t0 = time.time()
    if leg == "sig":
        from flink_spark.plans.pairjoin import pair_self_join
        from flink_spark.plans.textops import (
            _band_keys_spark,
            _hashed_shingles_spark,
            _minhash_cols_spark,
            _shingled,
        )
        from pyspark.sql import functions as F

        sh, ex = _shingled(spark, sf_dir, persist=True)
        docs = sh.count()
        sigs = (
            _hashed_shingles_spark(ex).groupBy("doc_id")
            .agg(*_minhash_cols_spark())
        )
        bands = sigs.select(
            "doc_id", F.explode(F.array(*_band_keys_spark())).alias("bkey")
        )
        cands = pair_self_join(bands, "doc_id", ["bkey"]).distinct().count()
        pairs = _minhash_pairs(spark, sf_dir, thr).select("d1", "d2")
        pairs = pairs.persist()
        npairs = pairs.count()
        nclusters = (
            connected_components(pairs)
            .select("cluster_id").distinct().count()
        )
        print(f"SIG thr={thr} docs={docs} cands={cands} "
              f"pairs={npairs} clusters={nclusters}")
    elif leg == "pairs":
        n = _minhash_pairs(spark, sf_dir, thr).count()
        print(f"PAIRS thr={thr} rows={n} wall={time.time() - t0:.1f}s")
    elif leg == "split":
        rows = _leakage_split_audit(
            _leakage_split_tagged(spark, sf_dir, thr)
        ).collect()
        print(f"SPLIT thr={thr} rows={len(rows)} "
              f"wall={time.time() - t0:.1f}s")
    elif leg == "pipeline":
        n = all_queries()["t_training_pipeline"].fn(spark, sf_dir).count()
        print(f"PIPELINE rows={n} wall={time.time() - t0:.1f}s")
    else:
        raise SystemExit(f"unknown leg {leg!r}")
    release_persisted()


if __name__ == "__main__":
    main()
