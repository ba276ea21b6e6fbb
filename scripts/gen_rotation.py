"""Freshness audit + recommended snapshot rotation for registry.py.

``python scripts/gen_rotation.py``

The driver's correctness gate snapshots at most 50 catalog queries per
round (registry iteration order), so ``_SNAPSHOT_FIRST`` is re-edited
every round to put the weakest-signal queries first. This tool
automates the bookkeeping half of that edit:

- reads every CORRECTNESS_r*.json and computes, per catalog query, the
  newest round with a fully-green row (rows+schema+hash, no err);
- prints the freshness histogram and any never-checked queries;
- prints a recommended head ordering: never-checked first, then
  stale-ascending (oldest newest-green first, registration order as
  the tiebreak), with a marker where the 50-query cap lands.

What it CANNOT know is which queries' code changed in the current
round — splice those after the never-checked block by hand (the
VERDICT convention), then paste into ``_SNAPSHOT_FIRST``. The
registry asserts name validity at import, so typos fail loudly.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAP = 50


def main() -> None:
    from flink_spark.registry import all_queries

    newest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r*.json")
    )):
        m = re.search(r"r(\d+)\.json$", path)
        if m is None:
            continue  # backup/variant file (e.g. *_retry.json): skip
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            ok = (row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match") and not row.get("err"))
            if ok and newest.get(name, -1) < rnd:
                newest[name] = rnd

    qs = list(all_queries())
    hist: dict[int | None, int] = {}
    for n in qs:
        hist[newest.get(n)] = hist.get(newest.get(n), 0) + 1
    print("freshness histogram (newest green round -> #queries):")
    for k in sorted(hist, key=lambda x: (x is None, x)):
        print(f"  {'never' if k is None else f'r{k}'}: {hist[k]}")

    reg_order = {n: i for i, n in enumerate(qs)}
    head = sorted(
        qs, key=lambda n: (newest.get(n, -1), reg_order[n])
    )
    print("\nrecommended _SNAPSHOT_FIRST (splice changed-code queries "
          "after the never-checked block by hand):")
    for i, n in enumerate(head):
        tag = "never" if n not in newest else f"r{newest[n]}"
        if i == CAP:
            print(f"    # --- the driver's {CAP}-query cap lands here ---")
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()
