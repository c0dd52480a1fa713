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


_POINTER = "_CURRENT"


def _read_pointer(graph_path: str) -> str | None:
    import os

    ptr = os.path.join(graph_path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        return f.read().strip()


def load_snapshot(spark: SparkSession, graph_path: str) -> Graph | None:
    """Load the graph the _CURRENT pointer designates, or None when no
    snapshot has ever been committed. Any error OTHER than an absent
    pointer propagates — a transient read failure must never be
    mistaken for 'graph does not exist yet'."""
    import os

    ver = _read_pointer(graph_path)
    if ver is None:
        return None
    return load(spark, os.path.join(graph_path, ver))


def _commit_snapshot(g: Graph, graph_path: str, batch_id: int) -> None:
    """Write a versioned snapshot dir, then atomically swing the
    pointer (write-temp + rename). The previous snapshot stays intact
    until the pointer moves, so a crash mid-write leaves the prior
    state readable; a replayed batch rewrites its own version dir and
    re-points — idempotent. Old versions beyond the last two are
    pruned after the swap."""
    import os
    import shutil

    os.makedirs(graph_path, exist_ok=True)
    ver = f"v{batch_id}"
    save(g, os.path.join(graph_path, ver))
    tmp = os.path.join(graph_path, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(ver)
    os.replace(tmp, os.path.join(graph_path, _POINTER))
    keep = {ver, f"v{batch_id - 1}"}
    for entry in os.listdir(graph_path):
        if (
            entry.startswith("v")
            and entry not in keep
            and os.path.isdir(os.path.join(graph_path, entry))
        ):
            shutil.rmtree(os.path.join(graph_path, entry), ignore_errors=True)


def start_binding_ingest(
    spark: SparkSession,
    stream: DataFrame,
    graph_path: str,
    checkpoint_path: str,
    query_name: str = "graph_ingest",
):
    """Run a binding stream into the versioned graph snapshot store at
    ``graph_path`` (created if absent). Returns the StreamingQuery.

    Durability: snapshots are immutable version dirs + an atomic
    pointer, never an in-place overwrite of the directory being read —
    so a crash mid-commit cannot destroy accumulated state, and only
    a genuinely-absent pointer means 'start empty' (other load errors
    fail the batch and the checkpoint retries it). On an object store
    swap os.replace for a conditional-put of the pointer object."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        g = load_snapshot(s, graph_path)
        if g is None:
            from ..graph.build import empty_edges, empty_vertices

            g = Graph(empty_vertices(s), empty_edges(s))
        new_v, new_e = bindings_to_graph_parts(batch)
        merged_v = upsert_vertices(g.vertices, new_v).localCheckpoint()
        merged_e = upsert_edges(g.edges, new_e).localCheckpoint()
        _commit_snapshot(Graph(merged_v, merged_e), graph_path, batch_id)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def merge_graph_into_store(
    spark: SparkSession,
    graph_path: str,
    vertices: DataFrame,
    edges: DataFrame,
    version: int,
) -> Graph:
    """Batch MERGE INTO the versioned snapshot store — the Delta-style
    upsert sink, without a table format: load the _CURRENT snapshot
    (empty graph when the pointer is absent), apply the idempotent
    get-or-create upsert kernel, commit an immutable new version dir
    and atomically swing the pointer. Re-running the same (version,
    payload) is a no-op replay — the version dir is rewritten with
    identical content and the pointer re-swung — so batch callers get
    the same exactly-once-state guarantee as the streaming ingest.

    Returns the merged Graph (as committed)."""
    g = load_snapshot(spark, graph_path)
    if g is None:
        from ..graph.build import empty_edges, empty_vertices

        g = Graph(empty_vertices(spark), empty_edges(spark))
    merged_v = upsert_vertices(g.vertices, vertices).localCheckpoint()
    merged_e = upsert_edges(g.edges, edges).localCheckpoint()
    merged = Graph(merged_v, merged_e)
    _commit_snapshot(merged, graph_path, version)
    return merged
