"""The idempotent upsert kernel (SURVEY.md §2.3).

Every snippet the reference emits is a conditional merge — vertex form
(main.go:205-211)::

    if (!g.V().hasLabel('user').has('email', E).hasNext())
        g.addV('user').property('email', E)...

edge form (main.go:317-322)::

    if (!g1.outE('in').where(inV().hasId(g2.id())).hasNext())
        g1.addEdge('in', g2, 'weight', 1)

i.e. per-row existence probes against an index. The Spark-native
formulation replaces thousands of point probes with ONE set
operation: a ``left_anti`` join on the key followed by a union.
This is both the correctness kernel (idempotence: loading a batch
twice is a no-op) and the scale win (two shuffles total per batch,
instead of per-row index lookups; at 100 TB the anti-join is a
shuffle-on-key that AQE can plan as broadcast when the incoming
batch is small).

It also makes load order irrelevant: the reference needs a strict
file concat order (init→users→...→roles, README.md:286-289) and a
two-pass group scan (main.go:225-267) so containers exist before
members; set-semantics merge is order-independent within and across
batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import EDGE_SCHEMA, VERTEX_SCHEMA


def upsert_vertices(vertices: DataFrame, incoming: DataFrame) -> DataFrame:
    """Get-or-create vertices by natural key.

    ``id = xxhash64(label, key)`` is a pure function of the natural
    key (schema.vertex_id), so id-equality IS (label, key)-equality
    and the merge key is the single long column — cheaper to shuffle
    than (label, string-key) and collision-safe at our cardinalities.
    First writer wins on property conflicts, matching the reference's
    get-or-create (properties are only set at creation).
    """
    return vertices.unionByName(vertex_delta(vertices, incoming))


def upsert_edges(edges: DataFrame, incoming: DataFrame) -> DataFrame:
    """Get-or-create edges by (src, dst, label)."""
    return edges.unionByName(edge_delta(edges, incoming))


def vertex_delta(vertices: DataFrame, incoming: DataFrame) -> DataFrame:
    """The rows `upsert_vertices` would ADD — batch-deduped incoming
    anti-joined against the existing ids. Isolated so incremental
    sinks (streaming/ingest.py) can persist O(delta), not O(graph)."""
    incoming = incoming.select(*VERTEX_SCHEMA.fieldNames()).dropDuplicates(
        ["id"]
    )
    return incoming.join(vertices, ["id"], "left_anti")


def edge_delta(edges: DataFrame, incoming: DataFrame) -> DataFrame:
    """The rows `upsert_edges` would ADD (see vertex_delta)."""
    incoming = incoming.select(*EDGE_SCHEMA.fieldNames()).dropDuplicates(
        ["src", "dst", "label"]
    )
    return incoming.join(edges, ["src", "dst", "label"], "left_anti")


def upsert(
    vertices: DataFrame,
    edges: DataFrame,
    new_vertices: DataFrame | None = None,
    new_edges: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Merge a batch of vertices and/or edges into the graph."""
    if new_vertices is not None:
        vertices = upsert_vertices(vertices, new_vertices)
    if new_edges is not None:
        edges = upsert_edges(edges, new_edges)
    return vertices, edges


def drop_all(vertices: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``g.V().drop().iterate()`` analog (README.md:320-329)."""
    return vertices.limit(0), edges.limit(0)


def remove_vertices(
    vertices: DataFrame, edges: DataFrame, victim_ids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Selective ``g.V().has(...).drop()`` — delete a vertex set AND
    its incident edges (Gremlin drop() cascades to edges), the
    offboarding scenario: remove a principal, every membership and
    grant disappears with it.

    Mutation-surface complement of upsert: three anti-joins (one on
    vertices, one per edge endpoint), each a shuffle-on-key that AQE
    plans broadcast when the victim set is small — never per-row
    deletes."""
    ids = victim_ids.select("id").dropDuplicates()
    kept_v = vertices.join(ids, ["id"], "left_anti")
    kept_e = edges.join(
        ids, edges.src == ids.id, "left_anti"
    )
    kept_e = kept_e.join(
        ids, kept_e.dst == ids.id, "left_anti"
    )
    return kept_v, kept_e


def _anti(a: DataFrame, b: DataFrame) -> DataFrame:
    """Rows of a absent from b — null-safe anti-join on every column.

    Equivalent to except for unique-key rows, but (a) it's the
    shuffle-on-key plan that scales (except materializes both sides
    distinct), and (b) it sidesteps a Catalyst internal-attribute bug
    with exceptAll over deeply self-referencing union/upsert plans.
    """
    left = a.alias("l")
    right = b.alias("r")
    cond = None
    for c in a.columns:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        cond = eq if cond is None else cond & eq
    return left.join(right, cond, "left_anti")


def graph_diff(
    vertices_a: DataFrame,
    edges_a: DataFrame,
    vertices_b: DataFrame,
    edges_b: DataFrame,
) -> dict[str, DataFrame]:
    """Snapshot diff (SURVEY.md §2C set-ops row): what A has that B
    lacks and vice versa — the audit-friendly capability echo of
    idempotence (diff(load(G,X), G) == the genuinely-new rows of X).
    """
    return {
        "vertices_only_a": _anti(vertices_a, vertices_b),
        "vertices_only_b": _anti(vertices_b, vertices_a),
        "edges_only_a": _anti(edges_a, edges_b),
        "edges_only_b": _anti(edges_b, edges_a),
    }


def assert_unique_keys(vertices: DataFrame) -> int:
    """Sanity invariant: natural-key identity means no duplicate ids.
    Returns the duplicate count (0 when healthy)."""
    return (
        vertices.groupBy("id").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    ).count()
