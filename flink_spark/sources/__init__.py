"""Sources: batch readers over the fixture tables + streaming readers.

The reference's sources are Kafka topics of JSON rows
(``rt/utils/MyKafkaUtil.java:23-98``) and a MySQL-CDC config stream
(``rt/app/dim/DimApp.java:69-82``). Here the batch fixture tables play
the role of at-rest data; ``streaming.py`` provides the readStream
equivalents (file/rate/memory sources standing in for Kafka, plus a
real kafka reader builder for cluster use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes types for engine use.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark reads as
    long nanoseconds (with ``nanosAsLong``); we convert to a proper
    microsecond TimestampType so event-time operators (windows,
    watermarks) work natively. DuckDB keeps nanoseconds, so oracle
    comparisons on timestamps always go through millisecond-floor
    (``epoch_ms`` ≡ ``unix_millis``) or second-level formatting.
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: `/ 1000` goes through double, whose 53-bit
        # mantissa cannot represent epoch-ns (~1.7e18) exactly and flips
        # ~1.5% of microseconds by one.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
