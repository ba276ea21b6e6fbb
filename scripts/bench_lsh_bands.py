"""Measure the SRP banding dial: catalog walls at LSH_BANDS ∈ {4, 8}.

``FLINK_SPARK_LSH_BANDS=N python scripts/bench_lsh_bands.py [sf_dir]``
(default sf_dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1; the
500k-vector decade leg is /tmp/flink_spark_scale/sf10docs)

One band-count per fresh process (the knob is read at import). Times
every SRP-banded catalog query — warm pass + min-of-2 timed passes,
the bench.py discipline — preceded by the bench canary so walls from
two processes normalize onto the same session speed. The r10
`e_lsh_recall_curve` audit measured WHY this dial matters: recall at
the COSDUP_THRESHOLD band is ~0.5 at 4 bands vs ~0.76 at 8 (SCALING.md
§R10); this script measures WHAT it costs, per query, at the fixture
and at the 500k decade replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every catalog query whose candidate generation rides the SRP band
# keys (_with_band_keys / _band_keys): the dial's whole blast radius.
BANDED = [
    "e_ann_lsh_topk",
    "t_embedding_neardup",
    "e_dup_clusters",
    "e_leakage_safe_split",
    "e_lsh_recall_curve",
    "x_ensemble_dup_clusters",
]
# Decade legs trim the list / passes (minutes per pass at 500k):
# BENCH_LSH_QUERIES=a,b,c BENCH_LSH_RUNS=1 narrows both.
_Q_ENV = os.environ.get("BENCH_LSH_QUERIES")
if _Q_ENV:
    BANDED = [q.strip() for q in _Q_ENV.split(",") if q.strip()]
N_RUNS = max(1, int(os.environ.get("BENCH_LSH_RUNS", "2")))
CANARY = ["q1_pricing_summary", "t_exact_dedup", "w_tumble_10s_keyed"]
CANARY_REF_SEC = 2.128  # the r9 reference session (bench.py CANARY_REF)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from flink_spark.plans.similarity import LSH_BANDS
    from flink_spark.registry import release_persisted, spark_queries
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"bench-lsh-bands-{LSH_BANDS}", cpus="32",
                      shuffle_partitions="32")
    qs = spark_queries()

    def run(name: str) -> float:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
        finally:
            release_persisted()
        return time.time() - t0

    canary = {}
    for name in CANARY:
        run(name)
    for _ in range(2):
        for name in CANARY:
            t = run(name)
            if name not in canary or t < canary[name]:
                canary[name] = t
    canary_total = sum(canary.values())

    times = {}
    for name in BANDED:
        run(name)
    for _ in range(N_RUNS):
        for name in BANDED:
            t = run(name)
            if name not in times or t < times[name]:
                times[name] = t

    print(json.dumps({
        "bands": LSH_BANDS,
        "sf_dir": sf_dir,
        "queries": {n: round(t, 3) for n, t in times.items()},
        "total_sec": round(sum(times.values()), 3),
        "session_factor": round(canary_total / CANARY_REF_SEC, 3),
    }))


if __name__ == "__main__":
    main()
