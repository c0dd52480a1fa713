"""Parquet fixture sources (TESTDATA.md).

The reference crawls live Google APIs with pagination + rate limiting
(main.go:189-730, main.go:99-102); our sources are declarative parquet
scans, so pagination/pacing collapse into Spark's own scan planning
(files.maxPartitionBytes) and predicate/column pushdown does the
"crawl only what you need" job (e.g. the ACTIVE-project filter at
main.go:722 becomes a pushed-down filter).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TimestampType regardless of
    how the fixture stored it. Generations of the fixture have used
    TIMESTAMP(NANOS) (read as long via nanosAsLong, exact integer
    `div 1000` to micros — `div` not `/` because epoch nanos ~1.7e18
    exceed double's 2^53 exact range), plain TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ by Spark's inferTimestampNTZ), or TIMESTAMP with tz.
    Downstream window/session/unix_micros plans all assume
    TimestampType, so dispatch on the actual scanned type.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        # Session tz is UTC in this environment; NTZ micros -> TIMESTAMP
        # is an exact reinterpretation, matching the oracle's naive read.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # nanosAsLong is a no-op for micros-encoded fixtures but keeps
        # the nanos-encoded generation readable at all.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_events_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
