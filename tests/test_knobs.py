"""The scale knobs must keep Spark plan and DuckDB oracle symmetric.

SCALING.md documents env knobs that widen the banded self-joins as the
corpus grows (FLINK_SPARK_SIMHASH_BITS / _LSH_BITS / _IVF_CELLS). Their
contract is that the oracle SQL is rebuilt from the same constants, so
correctness holds at ANY width — this test re-runs the oracle compare
at non-default widths in a subprocess (the knobs are read at import
time, so a fresh interpreter is required).
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from flink_spark.session import get_spark
from flink_spark.testing import compare, duck_connect
from flink_spark.registry import all_queries
spark = get_spark(cpus=4, shuffle_partitions=4)
con = duck_connect({sf_dir!r})
qs = all_queries()
for name in {queries!r}:
    errs = compare(spark, con, qs[name], {sf_dir!r})
    assert not errs, (name, errs[:2])
print("KNOB-SYMMETRY-OK")
"""


def test_widened_knobs_stay_oracle_symmetric(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        FLINK_SPARK_SIMHASH_BITS="48",
        FLINK_SPARK_LSH_BITS="6",
        FLINK_SPARK_IVF_CELLS="16",
    )
    script = _SCRIPT.format(
        repo=repo,
        sf_dir="/root/testdata/sf0.001",
        queries=["t_simhash_dups", "t_embedding_neardup", "e_ann_lsh_topk",
                 "e_ann_ivf_topk"],
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert "KNOB-SYMMETRY-OK" in out.stdout, out.stderr[-2000:]
