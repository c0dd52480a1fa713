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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The events fixture stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read nanos as long and convert to a
        # microsecond timestamp. Integer division (`div`), not `/`:
        # epoch nanos (~1.7e18) exceed double's 2^53 exact range, so
        # float division truncates 1µs low for a double-digit share of
        # rows and boundary events land in the wrong window.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
