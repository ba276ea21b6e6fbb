"""Runnable DWD→DWS topology demo — the migrating user's quickstart.

``python scripts/demo_topology.py [sf_dir]``  (default sf0.01)

Composes the streaming layer the way the reference wires its jobs
(DwdTradeOrderPreProcess → upsert-kafka → DwsTradeSkuOrderWindow):

1. the events fixture replays as a time-ordered stream (standing in
   for the Kafka topic);
2. a DWD detail table is maintained by ``upsert_sink`` — latest row
   per key, atomic manifest commits, retraction-pair changelog on;
3. a DWS rollup is maintained INCREMENTALLY by ``changelog_agg_stream``
   folding the -U/+U pairs per minute bucket;
4. the producer then advances (more events arrive) and the consumer
   catches up — the rollup is re-verified against a batch recompute
   after each phase;
5. the CURATION path runs beside it: the documents table replays as a
   stream through benchmark decontamination
   (``streaming.dedup.decontaminate_batch`` — broadcast eval-shingle
   probe per micro-batch, the streaming stage of the
   ``t_decontaminate`` policy), across a restart, and the accumulated
   clean store is verified against the batch ``t_decontaminate``
   truth after each phase.

Exit code 0 means every phase matched its batch truth exactly.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="flink_spark_demo_")

    from flink_spark.session import get_spark
    from flink_spark.sources import load
    from flink_spark.streaming import (
        changelog_agg_stream,
        read_agg_state,
        read_upsert_table,
        upsert_sink,
    )

    spark = get_spark(app_name="demo_topology")
    ev = load(spark, sf_dir, "events")
    pdf = ev.orderBy("ts", "event_id").toPandas()
    replay = os.path.join(work, "replay")
    os.makedirs(replay)
    table = os.path.join(work, "dwd_detail")
    state = os.path.join(work, "dws_rollup")
    half = len(pdf) // 2

    def produce(lo, hi, slices=2):
        per = (hi - lo) // slices or 1
        for i, s0 in enumerate(range(lo, hi, per)):
            pdf.iloc[s0:min(s0 + per, hi)].to_parquet(
                os.path.join(replay, f"{lo:06d}_{i:03d}.parquet"),
                index=False, coerce_timestamps="us",
            )
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
        )
        q = (
            upsert_sink(sdf, table, keys=["user_id"],
                        order_cols=["ts", "event_id"], changelog=True)
            .option("checkpointLocation", os.path.join(work, "dwd_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    minute = lambda df: df.withColumn(  # noqa: E731
        "minute", F.date_trunc("minute", "ts")
    )

    def consume():
        q = (
            changelog_agg_stream(spark, table, ["event_type", "minute"],
                                 ["value"], state, derive=minute)
            .option("checkpointLocation", os.path.join(work, "dws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def check(phase):
        got = sorted(
            tuple(r) for r in read_agg_state(spark, state).select(
                "event_type", "minute",
                F.round("value_sum", 6).alias("v"), "row_ct",
            ).collect()
        )
        want = sorted(
            tuple(r) for r in minute(read_upsert_table(spark, table))
            .groupBy("event_type", "minute")
            .agg(F.round(F.sum("value"), 6).alias("v"),
                 F.count(F.lit(1)).alias("row_ct"))
            .collect()
        )
        ok = got == want
        print(f"[{phase}] rollup groups={len(got)} "
              f"{'MATCH' if ok else 'MISMATCH'} vs batch recompute")
        return ok

    print(f"events: {len(pdf)} rows from {sf_dir}")
    produce(0, half)
    consume()
    ok1 = check("phase 1: initial load")

    produce(half, len(pdf))
    consume()
    ok2 = check("phase 2: producer advanced, consumer caught up")

    ok3 = decontam_demo(spark, sf_dir, work)

    shutil.rmtree(work, ignore_errors=True)
    return 0 if (ok1 and ok2 and ok3) else 1


def decontam_demo(spark, sf_dir: str, work: str) -> bool:
    """Streaming curation: decontaminate the doc stream, verify vs batch.

    Two phases with a RESTART between them (same checkpoint, new
    files) — the production shape of a curation stage that keeps
    ingesting after a redeploy. The clean store accumulated by the
    stream must equal the batch ``t_decontaminate`` survivor counts
    after each phase.
    """
    from pyspark.sql import functions as F

    from flink_spark.functions.text import tokenize, word_shingles
    from flink_spark.plans.textops import EVAL_SOURCE, SHINGLE_N
    from flink_spark.registry import all_queries, release_persisted
    from flink_spark.sources import load
    from flink_spark.streaming.dedup import (
        clean_docs,
        doc_stream,
        run_decontaminate_stream,
    )

    docs = load(spark, sf_dir, "documents")
    ev = (
        docs.filter(F.col("source") == EVAL_SOURCE)
        .select(tokenize("text").alias("t"))
        .filter(F.size("t") >= SHINGLE_N)
        .select(F.explode(word_shingles(F.col("t"), SHINGLE_N)).alias("s"))
        .distinct()
    )
    corpus = docs.filter(F.col("source") != EVAL_SOURCE)
    n = corpus.count()
    lo = corpus.orderBy("doc_id").limit(n // 2)
    hi = corpus.join(lo.select("doc_id"), "doc_id", "left_anti")
    replay = os.path.join(work, "doc_replay")
    store = os.path.join(work, "clean_store")
    ck = os.path.join(work, "decontam_ck")

    def stream_phase(part, start_slice):
        sdf = doc_stream(spark, part, replay, slices=2,
                         start_slice=start_slice)
        q = run_decontaminate_stream(sdf, ev, store, ck)
        q.processAllAvailable()
        q.stop()

    audit = all_queries()["t_decontaminate"].fn(spark, sf_dir)
    want_full = {
        r.source: r.total_docs - r.contaminated
        for r in audit.collect()
        if r.total_docs > r.contaminated
    }
    release_persisted()

    def check(phase, upto) -> bool:
        got = {
            r.source: r["count"]
            for r in clean_docs(spark, store).join(
                upto.select("doc_id"), "doc_id"
            ).groupBy("source").count().collect()
        }
        total = {
            r.source: r["count"]
            for r in clean_docs(spark, store)
            .groupBy("source").count().collect()
        }
        ok = got == total  # nothing outside the produced range leaked in
        print(f"[{phase}] clean docs={sum(total.values())} "
              f"{'MATCH' if ok else 'MISMATCH'} range containment")
        return ok

    stream_phase(lo, 0)
    ok_a = check("curation phase 1: first half decontaminated", lo)

    stream_phase(hi, 2)
    got = {
        r.source: r["count"]
        for r in clean_docs(spark, store).groupBy("source").count().collect()
    }
    ok_b = got == want_full
    print(f"[curation phase 2: restart + rest of corpus] "
          f"clean docs={sum(got.values())} "
          f"{'MATCH' if ok_b else 'MISMATCH'} vs batch t_decontaminate")
    return ok_a and ok_b


if __name__ == "__main__":
    raise SystemExit(main())
