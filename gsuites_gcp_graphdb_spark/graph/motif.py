"""Motif (pattern) matching over the property graph — the
GraphFrames-style ``find()`` surface, compiling declaratively to
joins (one join per edge term, vertices attached per named variable).

Pattern grammar (semicolon-separated edge terms)::

    (a)-[e]->(b); (b)-[e2]->(c)      # 2-hop chain
    (a)-[]->(b)                      # anonymous edge
    (a)-[e]->(b); (a)-[e2]->(c)      # fan-out from a
    (a)-[]->(b); !(a)-[]->(c)        # negated term: NO a->c edge

Each named vertex variable becomes a struct column with the full
vertex row; named edge variables become edge structs. Repeated
variables unify (same vertex id), exactly like GraphFrames — as does
negation: a `!(x)-[]->(y)` term compiles to a LEFT ANTI join and
requires both endpoints bound by positive terms and no edge variable
(GraphFrames imposes the same rules).

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
    r"^(!?)\s*\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w*)\s*\)$"
)


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    seen_edges: set[str] = set()
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        bang, src, ename, dst = m.groups()
        neg = bang == "!"
        if neg:
            if ename:
                raise ValueError(
                    f"negated term may not name an edge: {raw!r}"
                )
            if not src or not dst:
                raise ValueError(
                    f"negated term needs named endpoints: {raw!r}"
                )
        if ename:
            # A repeated edge variable would derive the same
            # __e_src/__e_dst columns twice — ambiguous columns or
            # silently wrong joins. GraphFrames rejects it too.
            if ename in seen_edges:
                raise ValueError(
                    f"duplicate edge variable {ename!r} in motif pattern"
                )
            seen_edges.add(ename)
        terms.append((neg, src, ename, dst))
    if not terms:
        raise ValueError("empty motif pattern")
    if all(neg for neg, *_ in terms):
        raise ValueError("motif pattern needs at least one positive term")
    pos_vars = {
        v for neg, s, _, d in terms if not neg for v in (s, d) if v
    }
    for neg, s, _, d in terms:
        if neg and (s not in pos_vars or d not in pos_vars):
            raise ValueError(
                "negated-term endpoints must be bound by positive terms"
            )
    return terms


def _order_positive(
    terms: list[tuple[str, str, str]], allow_disconnected: bool
) -> list[tuple[str, str, str]]:
    """Greedily order positive terms so every term after the first
    shares a named vertex variable with the prefix. Preserves the
    given order whenever it is already connected. A pattern with no
    such ordering is disconnected: its compilation is a cartesian
    product (|E|^k blow-up at scale), so raise unless the caller
    explicitly opts in with ``allow_disconnected=True``."""
    remaining = list(terms)
    ordered: list[tuple[str, str, str]] = []
    bound: set[str] = set()
    while remaining:
        pick = None
        if ordered:
            for t in remaining:
                s, _, d = t
                if (s and s in bound) or (d and d in bound):
                    pick = t
                    break
        if pick is None:
            if ordered and not allow_disconnected:
                raise ValueError(
                    "disconnected motif pattern: term shares no vertex "
                    "variable with the rest, so matching is a cartesian "
                    "product over the edge set; pass "
                    "allow_disconnected=True if that is intended"
                )
            pick = remaining[0]
        remaining.remove(pick)
        ordered.append(pick)
        s, _, d = pick
        bound.update(v for v in (s, d) if v)
    return ordered


def find(
    g: Graph,
    pattern: str,
    edge_label: str | None = None,
    allow_disconnected: bool = False,
) -> DataFrame:
    """Match ``pattern`` against the graph; returns one row per match
    with a struct column per named variable. Disconnected patterns
    (cartesian semantics) require ``allow_disconnected=True``."""
    terms = _parse(pattern)
    v_struct = F.struct(*[F.col(c) for c in g.vertices.columns])
    e_struct = F.struct(*[F.col(c) for c in g.edges.columns])

    edges = g.edges
    if edge_label is not None:
        edges = edges.filter(F.col("label") == edge_label)

    result: DataFrame | None = None
    bound_vertices: set[str] = set()
    anon = 0

    pos_terms = _order_positive(
        [(s, e, d) for neg, s, e, d in terms if not neg],
        allow_disconnected,
    )
    for src, ename, dst in pos_terms:
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

    # Negated terms compile to LEFT ANTI joins against the edge
    # relation — matches where the forbidden edge exists are removed.
    # Anti-join is the scale-correct NOT EXISTS: no fan-out, AQE picks
    # broadcast when the edge side (or its distinct projection) is
    # small.
    for src, dst in [(s, d) for neg, s, _, d in terms if neg]:
        neg_e = edges.select(
            F.col("src").alias("__n_src"), F.col("dst").alias("__n_dst")
        )
        result = result.join(
            neg_e,
            (F.col(f"{src}.id") == F.col("__n_src"))
            & (F.col(f"{dst}.id") == F.col("__n_dst")),
            "left_anti",
        )

    keep = [c for c in result.columns if not c.startswith("__")]
    return result.select(*keep)
