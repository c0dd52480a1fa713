"""Motif pattern matching (graph/motif.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.graph.literal import edges_of, vertices_of
from gsuites_gcp_graphdb_spark.graph.motif import find
from gsuites_gcp_graphdb_spark.graph.traversal import Graph


@pytest.fixture(scope="module")
def g(spark):
    v = vertices_of(
        spark,
        [
            ("user", "u1"), ("user", "u2"),
            ("group", "g1"),
            ("role", "r1"),
            ("project", "p1"),
        ],
    )
    e = edges_of(
        spark,
        [
            ("user", "u1", "group", "g1"),
            ("user", "u2", "group", "g1"),
            ("group", "g1", "role", "r1"),
            ("role", "r1", "project", "p1"),
        ],
    )
    return Graph(v.cache(), e.cache())


def test_single_edge_motif(g):
    m = find(g, "(a)-[e]->(b)")
    assert m.count() == 4
    assert set(m.columns) == {"a", "e", "b"}
    users_to_groups = m.filter(
        (F.col("a.label") == "user") & (F.col("b.label") == "group")
    )
    assert users_to_groups.count() == 2


def test_chain_motif(g):
    m = find(g, "(a)-[]->(b); (b)-[]->(c)")
    # chains: u1->g1->r1, u2->g1->r1, g1->r1->p1
    assert m.count() == 3
    paths = {
        (r["a"]["email"] or r["a"]["name"], r["c"]["name"] or r["c"]["projectid"])
        for r in m.collect()
    }
    assert ("u1", "r1") in paths and ("g1", "p1") in paths


def test_three_hop_chain(g):
    m = find(g, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(d)")
    # u1->g1->r1->p1 and u2->g1->r1->p1
    assert m.count() == 2
    assert {r["a"]["email"] for r in m.collect()} == {"u1", "u2"}


def test_fanout_motif(g):
    # two users sharing a group: (a)-[]->(g); (b)-[]->(g)
    m = find(g, "(a)-[]->(grp); (b)-[]->(grp)").filter(
        F.col("a.id") < F.col("b.id")
    )
    rows = m.collect()
    assert len(rows) == 1
    assert {rows[0]["a"]["email"], rows[0]["b"]["email"]} == {"u1", "u2"}


def test_bad_pattern(g):
    with pytest.raises(ValueError):
        find(g, "(a)->(b)")
    with pytest.raises(ValueError):
        find(g, "")


def test_duplicate_edge_variable_rejected(g):
    with pytest.raises(ValueError, match="duplicate edge variable"):
        find(g, "(a)-[e]->(b); (b)-[e]->(c)")


def test_negated_term(spark, g):
    """!(a)-[]->(c) removes matches with the forbidden edge; adding
    that edge removes the match."""
    pat = "(a)-[e1]->(b); (b)-[e2]->(c); !(a)-[]->(c)"
    base = find(g, pat)
    # u1->g1->r1, u2->g1->r1, g1->r1->p1: no closing edges exist
    assert base.count() == 3
    closed = Graph(
        g.vertices,
        g.edges.unionByName(
            edges_of(spark, [("user", "u1", "role", "r1")])
        ),
    )
    out = find(closed, pat)
    # the u1 chain now has a direct u1->r1 edge -> excluded; the new
    # edge also creates a new chain u1->r1->p1 (no u1->p1 edge)
    rows = {
        (r["a"]["label"], r["a"]["email"] or r["a"]["name"], r["c"]["label"])
        for r in out.collect()
    }
    assert ("user", "u1", "role") not in rows
    assert out.count() == 3  # u2 chain + g1 chain + new u1->r1->p1 chain


def test_negation_validation(g):
    with pytest.raises(ValueError, match="positive term"):
        find(g, "!(a)-[]->(b)")
    with pytest.raises(ValueError, match="named endpoints"):
        find(g, "(a)-[]->(b); !(a)-[]->()")
    with pytest.raises(ValueError, match="may not name an edge"):
        find(g, "(a)-[]->(b); !(a)-[x]->(b)")
    with pytest.raises(ValueError, match="bound by positive"):
        find(g, "(a)-[]->(b); !(a)-[]->(z)")


def test_disconnected_pattern_raises(g):
    with pytest.raises(ValueError, match="disconnected motif"):
        find(g, "(a)-[]->(b); (c)-[]->(d)")
    # all-anonymous terms never share a variable either
    with pytest.raises(ValueError, match="disconnected motif"):
        find(g, "()-[e1]->(); ()-[e2]->()")


def test_disconnected_pattern_opt_in(g):
    out = find(g, "(a)-[]->(b); (c)-[]->(d)", allow_disconnected=True)
    n = g.edges.count()
    assert out.count() == n * n


def test_connected_but_badly_ordered_pattern_reorders(g):
    # term 2 shares nothing with term 1 at its position, but the
    # pattern is connected overall — must compile join-only, not raise
    pat = "(a)-[]->(b); (c)-[]->(d); (b)-[]->(c)"
    inorder = "(a)-[]->(b); (b)-[]->(c); (c)-[]->(d)"
    got = find(g, pat)
    want = find(g, inorder)
    cols = ["a", "b", "c", "d"]

    def keys(df):
        return sorted(
            tuple(r[v]["id"] for v in cols) for r in df.collect()
        )

    assert keys(got) == keys(want)


def test_flagship_motif_plan_has_no_cartesian(spark, sf_dir):
    from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG

    df = CATALOG["g_motif_flagship"].fn(spark, str(sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
