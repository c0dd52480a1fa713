"""Streaming graph ingestion — the Structured-Streaming analog of the
reference's incremental crawl (main.go's rate-limited API walkers,
SURVEY.md §2B B12/B15).

A stream of membership events (member string + container key, i.e.
exactly the `type:email` bindings getIamPolicy emits) is parsed with
the total member parser and merged into the persisted graph inside
``foreachBatch`` using the idempotent upsert kernel. Because merges
are idempotent, micro-batch REPLAYS are safe — end-to-end
exactly-once graph state from an at-least-once source, with no
dedup bookkeeping.

Scale notes: each micro-batch does one anti-join against the current
snapshot keyed on the hashed id; `maxFilesPerTrigger`/rate limits
bound batch size (the streaming form of the reference's 4 rps
throttle, main.go:99-102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.export import load, save
from ..graph.loaders import parse_member_bindings
from ..graph.schema import vertex_id
from ..graph.traversal import Graph
from ..graph.upsert import upsert_edges, upsert_vertices


def bindings_to_graph_parts(
    bindings: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(member, dst_key) rows -> (vertices, edges) to merge: principal
    vertex + role vertex + principal->role edge."""
    parsed = parse_member_bindings(bindings)
    principal_v = parsed.select(
        vertex_id(F.col("src_label"), F.col("src_key")).alias("id"),
        F.col("src_label").alias("label"),
        F.when(
            F.col("src_label").isin("user", "group", "serviceAccount"),
            F.col("src_key"),
        ).alias("email"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("projectid"),
        F.lit(False).alias("is_external"),
    )
    role_v = parsed.select(
        vertex_id("role", F.col("dst_key")).alias("id"),
        F.lit("role").alias("label"),
        F.lit(None).cast("string").alias("email"),
        F.col("dst_key").alias("name"),
        F.lit(None).cast("string").alias("projectid"),
        F.lit(None).cast("boolean").alias("is_external"),
    )
    edges = parsed.select(
        vertex_id(F.col("src_label"), F.col("src_key")).alias("src"),
        vertex_id("role", F.col("dst_key")).alias("dst"),
        F.lit("in").alias("label"),
        F.lit(1).cast("int").alias("weight"),
    )
    return principal_v.unionByName(role_v), edges


def start_binding_ingest(
    spark: SparkSession,
    stream: DataFrame,
    graph_path: str,
    checkpoint_path: str,
    query_name: str = "graph_ingest",
):
    """Run a binding stream into the parquet-persisted graph at
    ``graph_path`` (created if absent). Returns the StreamingQuery."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            g = load(s, graph_path)
        except Exception:
            from ..graph.build import empty_edges, empty_vertices

            g = Graph(empty_vertices(s), empty_edges(s))
        new_v, new_e = bindings_to_graph_parts(batch)
        merged_v = upsert_vertices(g.vertices, new_v).localCheckpoint()
        merged_e = upsert_edges(g.edges, new_e).localCheckpoint()
        save(Graph(merged_v, merged_e), graph_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
