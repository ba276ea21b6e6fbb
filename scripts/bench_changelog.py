"""Measure incremental changelog maintenance vs full recompute.

``python scripts/bench_changelog.py [events_parquet_dir] [epochs]``
(defaults: /root/testdata/sf0.1 20)

The scale claim behind ``streaming.changelog.changelog_agg_stream``:
maintaining a downstream rollup from the retraction stream costs
O(batch + |touched groups|) per epoch REGARDLESS of how large the
accumulated table has grown, while recomputing the rollup from the
committed table costs O(table) and grows every epoch. Wall-clock at
local fixture sizes is mostly fixed job overhead, so the script
reports BOTH seconds and the honest scale metric, rows scanned:

- incremental: |changelog batch| + |state rows| per epoch (flat);
- recompute:   |committed table| per epoch (grows linearly).

Events are sliced into ``epochs`` equal time-order files; each loop
turn drops ONE file into the replay dir and drains it with an
``availableNow`` run of the producer (``upsert_sink(...,
changelog=True)``), then times (a) the incremental consumer over the
new changelog epoch and (b) a full ``groupBy(event_type)`` recompute
from ``read_upsert_table``.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    key = sys.argv[3] if len(sys.argv) > 3 else "event_id"
    # argv[4]: range-bucket span for a monotone key (0 = hash bucketing)
    span = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    work = "/tmp/flink_spark_changelog_bench"

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    replay = os.path.join(work, "replay")
    os.makedirs(replay)

    from flink_spark.session import get_spark
    from flink_spark.sources import load
    from flink_spark.streaming import (
        changelog_agg_stream,
        read_agg_state,
        read_upsert_table,
        upsert_sink,
    )
    from flink_spark.streaming.sinks import read_changelog

    spark = get_spark(app_name="bench_changelog")
    ev = load(spark, src, "events")
    pdf = ev.orderBy("ts", "event_id").toPandas()  # harness-side slicing,
    n = len(pdf)                                   # like streaming.replay_events
    per = math.ceil(n / epochs)
    print(f"events: {n} rows, {epochs} epochs of ~{per}")

    table = os.path.join(work, "upsert")
    state = os.path.join(work, "aggstate")
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )

    rows = []
    for e in range(epochs):
        part = pdf.iloc[e * per:(e + 1) * per]
        part.to_parquet(f"{replay}/{e:04d}.parquet", index=False,
                        coerce_timestamps="us")
        t0 = time.time()
        q = (
            upsert_sink(sdf, table, keys=[key],
                        order_cols=["ts", "event_id"], changelog=True,
                        bucket_expr=F.floor(F.col(key) / span).cast("long")
                        if span else None)
            .option("checkpointLocation", os.path.join(work, "prod_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_prod = time.time() - t0

        batch_rows = (
            read_changelog(spark, table).filter(F.col("_epoch") == e).count()
        )
        st = read_agg_state(spark, state)
        state_rows = st.count() if st is not None else 0

        t0 = time.time()
        qc = (
            changelog_agg_stream(spark, table, ["event_type"], ["value"],
                                 state)
            .option("checkpointLocation", os.path.join(work, "cons_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qc.awaitTermination()
        t_inc = time.time() - t0

        t0 = time.time()
        tbl = read_upsert_table(spark, table)
        tbl.groupBy("event_type").agg(
            F.sum("value").alias("value_sum"),
            F.count(F.lit(1)).alias("row_ct"),
        ).write.mode("overwrite").format("noop").save()
        table_rows = tbl.count()
        t_re = time.time() - t0

        rows.append((e, batch_rows, state_rows, table_rows, t_prod,
                     t_inc, t_re))
        print(f"epoch {e:3d}  batch={batch_rows:7d}  state={state_rows:3d}  "
              f"table={table_rows:8d}  producer={t_prod:6.2f}s  "
              f"incremental={t_inc:6.2f}s  recompute={t_re:6.2f}s")

    inc_scan = sum(r[1] + r[2] for r in rows)
    re_scan = sum(r[3] for r in rows)
    print(f"\nrows scanned across {epochs} epochs: "
          f"incremental={inc_scan} (batch+state), recompute={re_scan} "
          f"({re_scan / max(inc_scan, 1):.1f}x)")
    print(f"seconds: incremental={sum(r[5] for r in rows):.1f}, "
          f"recompute={sum(r[6] for r in rows):.1f}")


if __name__ == "__main__":
    main()
