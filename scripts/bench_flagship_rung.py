"""One decade-ladder rung: t_training_pipeline COLD on a replica dir,
funnel fingerprint + wall as one JSON line (r13 verdict #4's runner).

``python scripts/bench_flagship_rung.py [sf_dir] [--ensemble]``
(default sf_dir: /tmp/flink_spark_scale/sfqdocs — the quality-passing
replica from ``gen_doc_scale.py --quality``)

Env knobs follow the 100x-rung lessons (SCALING.md §R13): size
``SPARK_GRAFT_CPUS`` / ``SPARK_GRAFT_SHUFFLE`` to the aggregation
state, not the core count — for >10M-doc runs use cpus<=16 and
shuffle>=256 per 96 g heap (heap via ``SPARK_DRIVER_MEM``, the
``session.get_spark`` knob). Defaults here are the 5M-rung shape
(local[32], shuffle 256).

The funnel fingerprint (summed across sources) is the honesty check
the quality replicas exist for: a pair-stage-heavy rung must show
``quality_docs ≈ total_docs`` (minus the fixed eval set), or the LSH
banding/verify/CC stages never saw the advertised scale. Never
compare walls across replica regenerations.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/flink_spark_scale/sfqdocs"
    ensemble = "--ensemble" in sys.argv[1:]

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "256")
    spark = get_spark(
        app_name="flagship-rung", cpus=cpus, shuffle_partitions=shuffle,
    )
    name = "x_ensemble_training_pipeline" if ensemble else (
        "t_training_pipeline"
    )
    fn = all_queries()[name].fn
    t0 = time.time()
    rows = fn(spark, sf_dir).collect()
    wall = round(time.time() - t0, 1)
    release_persisted()
    funnel = {
        k: sum(r[k] for r in rows)
        for k in ("total_docs", "quality_docs", "exact_unique",
                  "neardup_kept", "clean_docs", "survivor_docs",
                  "mix_kept", "kept_tokens", "n_contexts")
    }
    print(json.dumps({
        "metric": "flagship_rung", "query": name, "sf_dir": sf_dir,
        "wall_sec": wall, "cpus": int(cpus), "shuffle": int(shuffle),
        "sources": len(rows), **funnel,
    }))


if __name__ == "__main__":
    main()
