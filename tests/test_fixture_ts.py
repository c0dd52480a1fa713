"""Events fixture ts-type normalization: the driver has regenerated
the events table with different physical ts encodings across rounds
(TIMESTAMP(NANOS), then plain TIMESTAMP(MICROS) read as NTZ); the
loader must yield the same TimestampType column for every generation
(round-3 regression: every events query crashed on the micros
fixture)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gsuites_gcp_graphdb_spark.sources.fixtures import (
    load_table,
    normalize_events_ts,
)


def test_load_events_yields_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.filter(F.col("ts").isNull()).limit(1).count() == 0


def test_normalize_long_nanos(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)
    nanos = int(base.timestamp() * 1_000_000) * 1000
    df = spark.createDataFrame([(nanos,)], "ts long")
    out = normalize_events_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0].ts == base


def test_normalize_ntz_micros(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)
    df = spark.createDataFrame(
        [(base,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    out = normalize_events_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    # session tz is UTC: NTZ micros reinterpret exactly
    assert out.collect()[0].ts == base


def test_normalize_timestamp_passthrough(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 1, 500000)
    df = spark.createDataFrame(
        [(base,)], T.StructType([T.StructField("ts", T.TimestampType())])
    )
    out = normalize_events_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0].ts == base
