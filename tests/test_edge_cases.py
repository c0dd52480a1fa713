"""Totality on degenerate inputs: empty graphs, empty batches,
singleton docs — the places distributed code usually breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.graph.algorithms import (
    connected_components,
    pagerank,
    reachable_from,
)
from gsuites_gcp_graphdb_spark.graph.build import empty_edges, empty_vertices
from gsuites_gcp_graphdb_spark.graph.literal import vertices_of
from gsuites_gcp_graphdb_spark.graph.traversal import Graph
from gsuites_gcp_graphdb_spark.graph.upsert import upsert_vertices
from gsuites_gcp_graphdb_spark.operators import dedup as dd
from gsuites_gcp_graphdb_spark.operators import text as tx


@pytest.fixture(scope="module")
def empty_graph(spark):
    return Graph(empty_vertices(spark), empty_edges(spark))


def test_empty_graph_traversal(empty_graph):
    g = empty_graph
    assert g.counts() == (0, 0)
    assert not g.V().hasLabel("user").hasNext()
    assert g.V().out("in").count() == 0
    with pytest.raises(StopIteration):
        g.V().next()


def test_empty_graph_algorithms(spark, empty_graph):
    src = spark.createDataFrame([], "id long")
    assert reachable_from(empty_graph, src).count() == 0
    assert connected_components(empty_graph).count() == 0
    # vertices but no edges: everyone is their own component, rank=base
    v = vertices_of(spark, [("user", "a"), ("user", "b")])
    g = Graph(v, empty_edges(spark))
    assert connected_components(g).select("component").distinct().count() == 2
    ranks = pagerank(g, iterations=2).collect()
    assert all(abs(r.rank - 1.0) < 1e-9 for r in ranks)


def test_empty_upsert_batch(spark, empty_graph):
    v = vertices_of(spark, [("user", "a")])
    merged = upsert_vertices(v, empty_vertices(spark))
    assert merged.count() == 1
    merged2 = upsert_vertices(empty_vertices(spark), v)
    assert merged2.count() == 1


def test_degenerate_documents(spark):
    rows = [
        (1, ""),  # empty text
        (2, "single"),  # one token
        (3, "a a a a a a"),  # all-identical tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # no crashes, sane outputs
    posts = dd.shingle_sets(docs, "doc_id", "text", 3).collect()
    assert all(r.set_size >= 1 for r in posts)
    sh = dd.simhash64(docs, "doc_id", "text").collect()
    assert len(sh) == 3
    stats = {r.doc_id: r for r in tx.token_stats(docs).collect()}
    assert stats[3].uniq_ratio == pytest.approx(1 / 6, abs=1e-6)
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    # empty and single-token docs share no shingles with doc 3
    assert all({p.id_a, p.id_b} != {1, 2} or p.jaccard <= 1.0 for p in pairs)


def test_minhash_single_doc(spark):
    docs = spark.createDataFrame([(1, "just one doc here")], "doc_id long, text string")
    assert dd.minhash_lsh_candidates(docs).count() == 0
    assert dd.minhash_dedup_pairs(docs).count() == 0


def test_repetition_stats_empty_doc_is_null_not_inf(spark):
    """Round-4 advice: empty text must yield NULL fractions via the
    nullif guards (identically to DuckDB's nullif), never inf/nan —
    a fixture regeneration with an empty document must not diverge
    the ns_text_repetition oracle."""
    from gsuites_gcp_graphdb_spark.operators.text import repetition_stats

    rows = {
        r.doc_id: r
        for r in repetition_stats(
            spark.createDataFrame(
                [(1, ""), (2, "x y x y")], "doc_id long, text string"
            )
        ).collect()
    }
    assert rows[1].top2_char_frac is None
    assert rows[1].dup_tok_frac == 0.0  # split('') -> [''], 1 token
    assert rows[2].top2_char_frac is not None


def test_round5_ops_on_empty_and_degenerate_input(spark, empty_graph):
    """Round-5 operators must degrade to empty/identity results, not
    crash, on empty graphs and empty corpora."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import k_core
    from gsuites_gcp_graphdb_spark.operators import sketches as sk
    from gsuites_gcp_graphdb_spark.operators.text import (
        normalize_text,
        pii_scrub,
        tfidf_top_term,
    )

    assert k_core(empty_graph, k=2).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert normalize_text(empty_docs).count() == 0
    assert pii_scrub(empty_docs).count() == 0
    assert tfidf_top_term(empty_docs).count() == 0
    sketch = sk.cms_build(empty_docs.select(F.col("text").alias("k")), "k")
    assert sketch.count() == 0
    # probing an empty sketch reads every candidate as 0, not null
    cand = spark.createDataFrame([("x",)], "k string")
    [row] = sk.cms_estimate(sketch, cand, "k").collect()
    assert row.cms_est == 0


def test_kcore_isolated_and_self_contained(spark):
    """Vertices with no edges never enter any k-core; a clique IS its
    own (n-1)-core."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import k_core
    from gsuites_gcp_graphdb_spark.graph.literal import edges_of

    v = vertices_of(
        spark, [("group", x) for x in "abcd"] + [("user", "lonely")]
    )
    e = edges_of(
        spark,
        [
            ("group", a, "group", b)
            for a in "abcd"
            for b in "abcd"
            if a < b
        ],
    )
    g = Graph(v, e)
    core3 = k_core(g, k=3)
    assert core3.count() == 4  # the K4 clique, all degree 3
    assert {r.core_deg for r in core3.collect()} == {3}


def test_graph_summary_edge_free(spark):
    """graph_summary degenerates explicitly: an edge-free graph
    reports 0 edges / 0 max degree / all-sinks (never NULL, which
    would diverge from the oracle's count FILTER form and silently
    pass gates); a fully empty graph reports NULL avg (0/0) but still
    exactly one row."""
    from gsuites_gcp_graphdb_spark.graph.build import empty_edges
    from gsuites_gcp_graphdb_spark.plans.graph_queries import summarize_graph

    v = vertices_of(spark, [("user", "a"), ("user", "b")])
    g = Graph(v, empty_edges(spark))
    [row] = summarize_graph(g).collect()
    assert (row.n_vertices, row.n_edges, row.max_out_degree, row.n_sinks) == (
        2, 0, 0, 2,
    )
    assert row.avg_out_degree == 0.0
    empty = Graph(v.limit(0), empty_edges(spark))
    [row0] = summarize_graph(empty).collect()
    assert (row0.n_vertices, row0.n_edges, row0.n_sinks) == (0, 0, 0)
    assert row0.avg_out_degree is None


def test_ktruss_semantics(spark):
    """k-truss contracts: a K4 clique survives the 4-truss (every
    edge in 2 triangles); a star has NO 3-truss (edges share no
    common neighbours); peeling cascades — removing an edge's support
    can knock out previously-supported edges."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import k_truss
    from gsuites_gcp_graphdb_spark.graph.literal import edges_of

    k4 = [
        ("group", a, "group", b)
        for a in "abcd"
        for b in "abcd"
        if a < b
    ]
    star = [("user", "hub"), ]  # star edges below
    v = vertices_of(
        spark,
        [("group", x) for x in "abcd"]
        + [("user", "hub")]
        + [("user", f"leaf{i}") for i in range(3)],
    )
    e = edges_of(
        spark,
        k4 + [("user", "hub", "user", f"leaf{i}") for i in range(3)],
    )
    g = Graph(v, e)
    t4 = k_truss(g, k=4).collect()
    assert len(t4) == 6 and all(r.support == 2 for r in t4)  # the K4
    t3 = k_truss(g, k=3)
    # star edges never in any triangle -> absent from the 3-truss
    assert t3.count() == 6
    # chain a-b-c (one triangle abc sharing edge with nothing else):
    # the 5-truss of ANY of this graph is empty
    assert k_truss(g, k=5).count() == 0


def test_ktruss_converges_within_oracle_bound(spark, sf_dir):
    """The g_ktruss oracle unrolls 6 peel rounds; the engine must
    reach its fixpoint within that bound at fixture scale (same
    pinning discipline as test_kcore_converges_within_oracle_bound)."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import k_truss
    from gsuites_gcp_graphdb_spark.plans.graph_queries import _graph

    g = _graph(spark, sf_dir)
    bounded = k_truss(g, k=3, max_iter=6)
    free = k_truss(g, k=3, max_iter=50)
    assert sorted(map(tuple, bounded.collect())) == sorted(
        map(tuple, free.collect())
    )


def test_gapfill_locf_empty_series_table(spark):
    """Degenerate pin (round-7, VERDICT r6 item 8): gapfill over an
    EMPTY sparse table must return an empty dense grid — the
    min/max-slot aggregate has no groups, so no chunk rows, no slots,
    no crash — matching the oracle's empty result on the same input
    (the DuckDB twin's generate_series over zero series emits zero
    rows)."""
    from gsuites_gcp_graphdb_spark.operators import timeseries as tss

    sparse = spark.createDataFrame(
        [], "series string, slot long, v double"
    )
    out = tss.gapfill_locf(sparse, "series", "slot", ["v"])
    assert out.count() == 0
    assert {"series", "slot", "v", "observed"} <= set(out.columns)


def test_ktruss_k2_keeps_triangle_free_edges(spark):
    """Degenerate pin (round-7): the 2-truss is the WHOLE graph —
    support >= 0 holds vacuously — so edges in no triangle must
    survive with support 0. (Pre-round-7 the 0-support edges produced
    no support row and the semi-join dropped them for any k; the
    catalog's k=3 was unaffected, but k <= 2 now short-circuits.)"""
    from gsuites_gcp_graphdb_spark.graph.algorithms import k_truss
    from gsuites_gcp_graphdb_spark.graph.literal import edges_of

    # a path a-b-c: no triangles at all
    v = vertices_of(spark, [("user", x) for x in "abc"])
    e = edges_of(
        spark, [("user", "a", "user", "b"), ("user", "b", "user", "c")]
    )
    g = Graph(v, e)
    t2 = k_truss(g, k=2).collect()
    assert len(t2) == 2 and all(r.support == 0 for r in t2)
    assert k_truss(g, k=3).count() == 0


def test_cycle_core(spark):
    """Kahn-peel cycle core: a pure DAG peels to empty; a 3-cycle
    with pendant chains keeps exactly the cycle; two cycles joined by
    a connector keep the connector too (documented semantics)."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import cycle_core
    from gsuites_gcp_graphdb_spark.graph.literal import (
        edges_of,
        vertices_of,
    )
    from gsuites_gcp_graphdb_spark.graph.traversal import Graph

    def core_keys(pairs):
        names = sorted({x for p in pairs for x in p})
        v = vertices_of(spark, [("group", n) for n in names])
        e = edges_of(
            spark, [("group", a, "group", b) for a, b in pairs]
        )
        g = Graph(v, e)
        out = cycle_core(g)
        lk = {
            r.id: r.email
            for r in v.selectExpr("id", "email").collect()
        }
        return sorted(lk[r.id] for r in out.collect())

    # DAG -> empty
    assert core_keys([("a", "b"), ("b", "c"), ("a", "c")]) == []
    # 3-cycle + pendant in/out chains -> just the cycle
    assert core_keys(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a"), ("b", "y")]
    ) == ["a", "b", "c"]
    # two 2-cycles joined by a connector -> connector included
    assert core_keys(
        [("a", "b"), ("b", "a"), ("b", "v"), ("v", "c"),
         ("c", "d"), ("d", "c")]
    ) == ["a", "b", "c", "d", "v"]
    # a self-loop IS a cycle — a group directly a member of itself is
    # the simplest loop the audit exists to catch (round-7 advisory:
    # the old src != dst pre-filter made this graph report is_dag).
    assert core_keys([("a", "b"), ("b", "c"), ("b", "b")]) == ["b"]
    # self-loop hanging off a real cycle: both survive
    assert core_keys(
        [("a", "b"), ("b", "a"), ("c", "c"), ("b", "c")]
    ) == ["a", "b", "c"]


def test_strongly_connected_components(spark):
    """Exact SCC on literal digraphs: (a) two 2-cycles joined by a
    one-way connector — the connector is a SINGLETON (the case the
    Kahn-peel cycle_core over-approximates); (b) a 3-cycle with a
    chord and a pendant; (c) a pure chain (all singletons); (d) a
    nested-color graph needing two outer rounds; (e) string ids."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        strongly_connected_components,
    )

    def scc_of(n, pairs, ids=None):
        ids = ids or list(range(1, n + 1))
        v = spark.createDataFrame(
            [(i,) for i in ids],
            "id long" if isinstance(ids[0], int) else "id string",
        )
        e = spark.createDataFrame(
            pairs,
            "src long, dst long"
            if isinstance(ids[0], int)
            else "src string, dst string",
        )
        out = strongly_connected_components(v, e)
        groups = {}
        for r in out.collect():
            groups.setdefault(r.scc, set()).add(r.id)
        assert sum(len(g) for g in groups.values()) == len(ids)
        assert all(min(g) == k for k, g in groups.items())
        return sorted(
            tuple(sorted(g)) for g in groups.values()
        )

    # (a) a<->b, connector v, c<->d  (ids: a=1 b=2 v=3 c=4 d=5)
    assert scc_of(
        5, [(1, 2), (2, 1), (2, 3), (3, 4), (4, 5), (5, 4)]
    ) == [(1, 2), (3,), (4, 5)]
    # (b) 3-cycle 1->2->3->1 with chord 2->1, pendant 4->1
    assert scc_of(4, [(1, 2), (2, 3), (3, 1), (2, 1), (4, 1)]) == [
        (1, 2, 3),
        (4,),
    ]
    # (c) chain: all singletons
    assert scc_of(4, [(1, 2), (2, 3), (3, 4)]) == [
        (1,),
        (2,),
        (3,),
        (4,),
    ]
    # (d) two outer rounds: SCC {1,4} colors everything in round 1,
    # SCC {2,3} only resolves after {1,4} is removed
    assert scc_of(4, [(1, 2), (2, 3), (3, 2), (1, 4), (4, 1)]) == [
        (1, 4),
        (2, 3),
    ]
    # (e) string ids, self-loop is a singleton
    assert scc_of(
        3,
        [("x", "y"), ("y", "x"), ("z", "z")],
        ids=["x", "y", "z"],
    ) == [("x", "y"), ("z",)]
