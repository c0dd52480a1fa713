"""Build small graphs from literal (label, key) tuples — the analog of
hand-written addV/addE Gremlin (README.md:331-349 examples, golden
mini-graph FIXTURES.md §3). Ids are derived with the same
deterministic hash as the bulk path, so literal graphs merge cleanly
with derived ones."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import NATURAL_KEY, vertex_id


def vertices_of(
    spark: SparkSession, items: list[tuple[str, str]]
) -> DataFrame:
    """items: [(label, natural_key), ...] -> vertex DataFrame."""
    df = spark.createDataFrame(items, "label string, key string")
    kind = F.create_map(
        *[x for l, p in NATURAL_KEY.items() for x in (F.lit(l), F.lit(p))]
    )[F.col("label")]
    return df.select(
        vertex_id(F.col("label"), F.col("key")).alias("id"),
        "label",
        F.when(kind == "email", F.col("key")).alias("email"),
        F.when(kind == "name", F.col("key")).alias("name"),
        F.when(kind == "projectid", F.col("key")).alias("projectid"),
        F.when(kind == "email", F.lit(False)).alias("is_external"),
    )


def edges_of(
    spark: SparkSession,
    items: list[tuple[str, str, str, str]],
    label: str = "in",
    weight: int = 1,
) -> DataFrame:
    """items: [(src_label, src_key, dst_label, dst_key), ...]."""
    df = spark.createDataFrame(
        items, "sl string, sk string, dl string, dk string"
    )
    return df.select(
        vertex_id(F.col("sl"), F.col("sk")).alias("src"),
        vertex_id(F.col("dl"), F.col("dk")).alias("dst"),
        F.lit(label).alias("label"),
        F.lit(weight).cast("int").alias("weight"),
    )
