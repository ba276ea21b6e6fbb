"""Adversarial-skew bench for the EMBEDDING family (vector analog of
``bench_keeper_forms.py`` — VERDICT r7 item #3).

``python scripts/bench_vec_skew.py [copies ...]``
(default ladder: 1000 10000)

For each multiplicity: build the ``gen_skew_vec.py`` fixture (one
embedding cloned ``copies`` times → one hot LSH bucket per band, one
hot IVF cell, one duplicate cluster), then run the four skew-exposed
operators through the noop sink, one untimed warm pass + one timed
pass (bench.py discipline):

- ``t_embedding_neardup``  — hot bucket trips the ``MAX_BUCKET``
  probe → grid-split pair join (the insurance path, otherwise only
  exercised by the all-identical property test);
- ``e_dup_clusters``       — the clone set is one cluster of
  multiplicity ``copies`` through connected_components;
- ``e_semantic_dedup``     — every clone quantizes to one IVF cell:
  the per-cell kernel's worst case;
- ``e_ann_lsh_topk``       — the hot vector is a query; its bucket
  holds every clone.

Pair-emitting operators are NOT run past 1e4 copies: their output is
inherently quadratic in duplicate multiplicity (1e5 identical vectors
= 5e9 qualifying pairs in any formulation — real pipelines run exact
dedup first; same argument as bench_keeper_forms.py's t_dup_clusters
note). The top-k probe is output-bounded and runs at every rung.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = "/tmp/flink_spark_scale"

PAIR_QUERIES = ["t_embedding_neardup", "e_dup_clusters", "e_semantic_dedup"]
PROBE_QUERIES = ["e_ann_lsh_topk"]
PAIR_CAP = 10_000


def _noop(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1_000, 10_000]

    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.session import get_spark

    spark = get_spark(app_name="bench_vec_skew", cpus=32)
    qs = all_queries()
    results: dict[str, dict[str, float]] = {}
    for copies in rungs:
        dst = f"{BASE}/skewvecs{copies}"
        if not os.path.exists(f"{dst}/embeddings.parquet"):
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "gen_skew_vec.py"),
                 str(copies), SRC, dst],
                check=True,
            )
        names = PROBE_QUERIES + (
            PAIR_QUERIES if copies <= PAIR_CAP else []
        )
        for name in names:
            def run(name=name, dst=dst):
                _noop(qs[name].fn(spark, dst))
                release_persisted()

            run()  # warm: codegen + derived-knob jobs
            t0 = time.time()
            run()
            dt = round(time.time() - t0, 2)
            results.setdefault(name, {})[str(copies)] = dt
            print(f"{name} @ {copies}: {dt} s", flush=True)
    print(json.dumps({"vec_skew": results}))


if __name__ == "__main__":
    main()
