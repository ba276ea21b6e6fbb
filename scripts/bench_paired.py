"""Run bench.py N times back-to-back and adjudicate min-of-N.

``python scripts/bench_paired.py [n_sessions]`` (default 2)

SCALING.md §R12 rule, made executable: budget verdicts are declared
only on min-of-N across ≥2 idle sessions; each session normalizes by
its OWN mean canary factor; a session whose start/end canary spread
exceeds SPREAD_TRUST is flagged (its normalization is noise — r12
measured two sessions whose raw 88-query totals agreed to 0.5% while
their canary means differed 39%, the drifting one flagged by a 0.208
spread). Prints ONE JSON line:

    {"sessions": [...], "min_raw": {...}, "min_normalized": {...},
     "budgets": {...}}

Environment passes through (SPARK_GRAFT_SF_DIR / _CPUS / _BENCH_RUNS),
so the paired run measures whatever shape the single run would.
Sessions run SEQUENTIALLY in fresh interpreters — concurrent Spark
work contaminates every wall, including ours.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SPREAD_TRUST = 0.1  # above this, a session's factor is untrustworthy

# Budgets on file (SCALING.md), checked only at the reference shape.
BUDGETS_SF01 = {"t_training_pipeline": 12.5}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sessions = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            capture_output=True, text=True,
        )
        if out.returncode != 0 or not out.stdout.strip():
            sys.stderr.write(out.stderr)
            raise SystemExit(
                f"bench session {i} failed (rc={out.returncode}); "
                "stderr above"
            )
        line = out.stdout.strip().splitlines()[-1]
        sessions.append(json.loads(line))

    # min-raw over ALL sessions; min-normalized over TRUSTED sessions
    # only (r13 ADVICE: an untrusted session's factor is declared noise
    # by its own artifact — mixing its canary-normalized values into a
    # min would rule budgets on numbers nobody trusts). bench.py r14+
    # carries the always-divided map under "normalized_canary";
    # "normalized" itself falls back to raw when untrusted.
    min_raw: dict[str, float] = {}
    min_norm: dict[str, float] = {}
    trusted = [s for s in sessions if s["canary"].get(
        "session_factor_spread", 1.0) <= SPREAD_TRUST]
    for s in sessions:
        for q, t in s["queries"].items():
            if q not in min_raw or t < min_raw[q]:
                min_raw[q] = t
    for s in trusted:
        for q, t in s.get("normalized_canary", s["normalized"]).items():
            if q not in min_norm or t < min_norm[q]:
                min_norm[q] = t

    sf = sessions[0]["sf"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    budgets = {}
    if sf == 0.1 and cpus == "32":
        for q, limit in BUDGETS_SF01.items():
            # Ruled on trusted-session normalized walls; with no
            # trusted session in the batch the verdict falls back to
            # the raw min (stated in the basis) rather than silently
            # using a noisy factor.
            got = min_norm.get(q) if trusted else min_raw.get(q)
            budgets[q] = {
                "limit_normalized_sec": limit,
                "min_normalized_sec": got,
                "basis": "normalized (trusted sessions)" if trusted
                else "raw (no trusted session)",
                "verdict": (
                    "IN" if got is not None and got <= limit else "OUT"
                ),
            }
    print(json.dumps({
        "n_sessions": n,
        "sessions": [
            {
                "total_sec": s["value"],
                "canary": {
                    k: s["canary"][k]
                    for k in ("session_factor", "session_factor_start",
                              "session_factor_end", "session_factor_spread")
                },
                "factor_trusted":
                    s["canary"]["session_factor_spread"] <= SPREAD_TRUST,
            }
            for s in sessions
        ],
        "n_trusted": len(trusted),
        "min_raw_total_sec": round(sum(min_raw.values()), 3),
        "min_normalized_total_sec": round(sum(min_norm.values()), 3),
        "min_raw": min_raw,
        "min_normalized": min_norm,
        "budgets": budgets,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
