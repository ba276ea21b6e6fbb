"""Generate a paraphrase-density replica for the split-threshold study.

``python scripts/gen_paraphrase.py [factor] [src_dir] [dst_dir]``
(defaults: 10 /root/testdata/sf0.1 /tmp/flink_spark_scale/paradocs)

The key-offset replicas (`gen_scale.py`) keep per-doc near-dup density
constant but BIMODAL: candidate pairs are either near-copies
(jaccard >= 0.8) or unrelated (~0), so a split threshold below the
dedup threshold admits nothing — measured on `sf10docs`
(pairs@0.5 == pairs@0.8 == 25,086). Real crawls have a paraphrase band
between the two. This generator manufactures it: each source doc gets
``factor`` replicas —

- replica 0: the original text;
- replicas 1..5: PARAPHRASES — every 12th token replaced with a
  replica-unique junk token. A replaced token kills ~3 of the 3-token
  shingles, so ~1/4 of shingles differ: jaccard(base, paraphrase)
  ~ (3/4)/(5/4) = 0.6 — above the loose 0.5 gate, below the 0.8 dedup
  gate. Two paraphrases of one base differ at disjoint positions
  (~1/2 shared shingles, jaccard ~1/3 — below both gates), so the
  loose graph's extra edges are base↔paraphrase, transitively
  clustering the whole family.
- replicas 6..9: NEAR-COPIES — every 36th token replaced: ~1/12 of
  shingles differ, jaccard ~ (11/12)/(13/12) ~ 0.85 — above the dedup
  gate, so the strict graph is non-trivial on the same corpus.

Distributed replication through Spark (union + higher-order token
transform, no driver materialization), doc_id offset per replica like
`gen_scale.py` so ids never collide.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

STRIDE = 1_000_000_000
PARA_EVERY = 12   # paraphrase band: jaccard to base ~0.6
COPY_EVERY = 36   # near-copy band: jaccard to base ~0.85


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/flink_spark_scale/paradocs"

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_paraphrase")
    os.makedirs(dst, exist_ok=True)
    base = spark.read.parquet(f"{src}/documents.parquet")

    parts = []
    for r in range(factor):
        rep = base.withColumn("doc_id", F.col("doc_id") + F.lit(r * STRIDE))
        if r > 0:
            every = PARA_EVERY if r <= 5 else COPY_EVERY
            # replace token positions congruent to r (mod every) with a
            # replica-and-position-unique junk token; pure column ops
            toks = F.split(F.col("text"), " ")
            mutated = F.transform(
                toks,
                lambda x, i: F.when(
                    (i + F.lit(r)) % every == 0,
                    F.concat(F.lit(f"zz{r}q"), i.cast("string")),
                ).otherwise(x),
            )
            rep = rep.withColumn("text", F.array_join(mutated, " "))
        parts.append(rep.withColumn("n_chars", F.length("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"wrote {dst}/documents.parquet rows={n}")


if __name__ == "__main__":
    main()
