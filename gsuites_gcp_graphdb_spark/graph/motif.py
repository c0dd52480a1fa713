"""Motif (pattern) matching over the property graph — the
GraphFrames-style ``find()`` surface, compiling declaratively to
joins (one join per edge term, vertices attached per named variable).

Pattern grammar (semicolon-separated edge terms)::

    (a)-[e]->(b); (b)-[e2]->(c)      # 2-hop chain
    (a)-[]->(b)                      # anonymous edge
    (a)-[e]->(b); (a)-[e2]->(c)      # fan-out from a

Each named vertex variable becomes a struct column with the full
vertex row; named edge variables become edge structs. Repeated
variables unify (same vertex id), exactly like GraphFrames.

The compiled plan is pure equi-joins, so Catalyst picks broadcast/SMJ
per side and AQE handles skew — pattern matching inherits the whole
optimizer (no custom executor). Scale note: patterns are acyclic
chains/stars in practice; each edge term adds one join keyed on
vertex id, the same shape as the traversal builder's out()."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .traversal import Graph

_TERM = re.compile(
    r"^\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w*)\s*\)$"
)


def _parse(pattern: str) -> list[tuple[str, str, str]]:
    terms = []
    seen_edges: set[str] = set()
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        src, ename, dst = m.groups()
        if ename:
            # A repeated edge variable would derive the same
            # __e_src/__e_dst columns twice — ambiguous columns or
            # silently wrong joins. GraphFrames rejects it too.
            if ename in seen_edges:
                raise ValueError(
                    f"duplicate edge variable {ename!r} in motif pattern"
                )
            seen_edges.add(ename)
        terms.append((src, ename, dst))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(g: Graph, pattern: str, edge_label: str | None = None) -> DataFrame:
    """Match ``pattern`` against the graph; returns one row per match
    with a struct column per named variable."""
    terms = _parse(pattern)
    v_struct = F.struct(*[F.col(c) for c in g.vertices.columns])
    e_struct = F.struct(*[F.col(c) for c in g.edges.columns])

    edges = g.edges
    if edge_label is not None:
        edges = edges.filter(F.col("label") == edge_label)

    result: DataFrame | None = None
    bound_vertices: set[str] = set()
    anon = 0

    for src, ename, dst in terms:
        anon += 1
        e_id = ename or f"__e{anon}"
        e_df = edges.select(
            e_struct.alias(e_id),
            F.col("src").alias(f"__{e_id}_src"),
            F.col("dst").alias(f"__{e_id}_dst"),
        )
        if result is None:
            result = e_df
        else:
            cond = None
            if src and src in bound_vertices:
                cond = F.col(f"{src}.id") == F.col(f"__{e_id}_src")
            if dst and dst in bound_vertices:
                c2 = F.col(f"{dst}.id") == F.col(f"__{e_id}_dst")
                cond = c2 if cond is None else cond & c2
            result = (
                result.join(e_df, cond) if cond is not None
                else result.crossJoin(e_df)
            )
        for var, key in ((src, f"__{e_id}_src"), (dst, f"__{e_id}_dst")):
            if not var:
                continue
            if var in bound_vertices:
                # already joined in; unification enforced by the join
                # condition above (or below for the first term)
                result = result.filter(F.col(f"{var}.id") == F.col(key))
                continue
            v_df = g.vertices.select(
                v_struct.alias(var), F.col("id").alias(f"__{var}_id")
            )
            result = result.join(
                v_df, F.col(key) == F.col(f"__{var}_id")
            ).drop(f"__{var}_id")
            bound_vertices.add(var)

    keep = [c for c in result.columns if not c.startswith("__")]
    return result.select(*keep)
