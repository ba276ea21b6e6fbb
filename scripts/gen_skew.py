"""Generate the ADVERSARIAL-skew documents fixture for keeper benches.

``python scripts/gen_skew.py [dup_copies] [src_dir] [dst_dir]``
(defaults: 100000 /root/testdata/sf0.1 /tmp/flink_spark_scale/skewdocs)

`gen_scale.py` replicas measure VOLUME (keys offset, corpora stay
well-behaved). This fixture measures the opposite failure mode — the
Zipfian corpus a real crawl delivers, where the engine's skew
insurance must carry the plan:

- ONE document's exact text duplicated ``dup_copies`` times (fresh
  doc_ids, round-robin sources): one md5 fingerprint now holds
  ~95% of all rows — the hot-fp case for the exact-dedup keeper and
  the cross-source ledger. Round-robin sources make the hot
  fingerprint a genuinely cross-source duplicate group.
- ONE boilerplate sentence appended to 2% of the base docs: a
  repeated multi-token span at percent mass — the hot-gram case the
  substring/ngram family already guards (kept here so the fixture
  stresses every rewritten shape at once).

Other tables symlink to the source dir (documents-only stress, same
layout trick as the `sf10docs`/`sf100docs` replicas). Built through
Spark — distributed union + column arithmetic, no driver
materialization — so the same job produces the fixture at any scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ID_BASE = 10_000_000  # clone ids start here: disjoint from base ids
BOILERPLATE = (
    "all rights reserved terms of service apply contact the site "
    "administrator for further information about this page"
)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/flink_spark_scale/skewdocs"

    from flink_spark.session import get_spark

    spark = get_spark(app_name="gen_skew")
    os.makedirs(dst, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_src = docs.select("source").distinct().count()

    # base docs, 2% tagged with the boilerplate span (deterministic:
    # by doc_id residue, so reruns produce the identical corpus)
    base = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE)),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("long"))

    hot = docs.orderBy("doc_id").limit(1).collect()[0]
    clones = (
        spark.range(copies)
        .select(
            (F.col("id") + ID_BASE).alias("doc_id"),
            F.lit(hot.text).alias("text"),
            F.lit(hot.lang).alias("lang"),
            F.concat(
                F.lit("src"), (F.col("id") % n_src).cast("string")
            ).alias("source"),
            F.lit(len(hot.text)).cast("long").alias("n_chars"),
        )
    )
    out = base.unionByName(clones).repartition(32)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"skew fixture at {dst}: {n} docs ({copies} hot-fp clones)")


if __name__ == "__main__":
    main()
