"""NN-Descent kNN-graph construction (operators/knngraph): planted-
cluster effectiveness (the census on the near-random fixture pins
exactness; THIS pins that the algorithm actually finds structure
when structure exists), structural invariants of every stage, and
init determinism. Complements ns_nn_descent's cross-engine replay."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.operators import knngraph as kg


def _clustered_df(spark, n_clusters=10, per=20, dim=16):
    """Deterministic planted clusters: near-orthogonal axis-aligned
    centres (mass on coordinate c) with a small sin wobble, members
    perturbed on ALL coordinates so scores are distinct (measured:
    intra-cluster cosine >= 0.992, inter <= 0.143 — a tie-free,
    cleanly separated geometry; an earlier same-centre variant made
    every intra score ~1.0 and the id tie-break collapsed the
    mutual graph)."""
    rows = []
    for c in range(n_clusters):
        centre = [
            (10.0 if d == c else 0.0)
            + 0.5 * math.sin(0.9 * (c + 1) * (d + 1))
            for d in range(dim)
        ]
        for m in range(per):
            v = [
                centre[d] + 0.2 * math.sin(1.3 * (m + 1) * (d + 2))
                for d in range(dim)
            ]
            rows.append((c * per + m, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_nn_descent_finds_planted_clusters(spark):
    emb = _clustered_df(spark)
    k = 6
    ladder = kg.nn_descent(emb, k=k, rounds=3)
    q = emb.select(F.col("vec_id").cast("bigint").alias("a"))
    truth = kg.brute_force_topk(emb, q, k=k).select("a", "b")
    n_truth = truth.count()
    hits = [
        g.select("a", "b").join(truth, ["a", "b"], "left_semi").count()
        for g in ladder
    ]
    recalls = [h / n_truth for h in hits]
    # monotone (theorem for the keep-best-k cut rule) ...
    assert recalls == sorted(recalls)
    # ... and effective: cluster-mates dominate the true top-6, and
    # three rounds from a random seed graph must recover nearly all
    # of them (measured: 1.0 on this fixture; bound left slack).
    assert recalls[-1] >= 0.9
    # random seed alone must NOT already be there — otherwise this
    # test would pass with descent_round broken.
    assert recalls[0] < 0.5


def test_nn_descent_stage_invariants(spark):
    emb = _clustered_df(spark, n_clusters=4, per=10)
    k = 5
    for g in kg.nn_descent(emb, k=k, rounds=2):
        assert g.where(F.col("a") == F.col("b")).count() == 0
        assert g.where(F.col("rk") > k).count() == 0
        # per-node ranks are contiguous 1..deg (row_number cut)
        bad = (
            g.groupBy("a")
            .agg(F.max("rk").alias("mx"), F.count("*").alias("c"))
            .where(F.col("mx") != F.col("c"))
            .count()
        )
        assert bad == 0


def test_knn_components_recover_planted_clusters(spark):
    """Mutual-kNN + CC must recover the planted clusters exactly:
    10 components, each of size 20, rep = the cluster's min id."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        connected_components,
    )
    from gsuites_gcp_graphdb_spark.graph.traversal import Graph as _G

    emb = _clustered_df(spark)
    final = kg.nn_descent(emb, k=6, rounds=3)[-1]
    mut = kg.mutual_edges(final, tau=0.4)
    # no cross-cluster mutual edge survives tau on this geometry
    assert (
        mut.where(
            (F.col("a") / 20).cast("int")
            != (F.col("b") / 20).cast("int")
        ).count()
        == 0
    )
    nodes = (
        mut.select(F.col("a").alias("id"))
        .union(mut.select(F.col("b").alias("id")))
        .distinct()
    )
    comp = connected_components(
        _G(
            nodes,
            mut.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        )
    )
    labelled = comp.withColumn(
        "cluster", (F.col("id") / 20).cast("int")
    )
    # purity: every component lives inside one planted cluster
    impure = (
        labelled.groupBy("component")
        .agg(F.countDistinct("cluster").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    assert impure == 0
    # coverage: mutual-kNN at k=6 may fracture a cluster or drop a
    # node on the margin (measured: 197/200 nodes, 12 components on
    # this geometry) but must recover essentially all of the corpus
    n_nodes = comp.count()
    n_comp = comp.select("component").distinct().count()
    assert n_nodes >= 190
    assert 10 <= n_comp <= 15


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01", "sf0.1"]
)
def test_knn_components_oracle_rounds_converged(sf):
    """The unrolled hash-min bound (20 rounds) is a fixpoint at EVERY
    driver scale factor, including the largest (sf0.1 — where a
    single long-chain component would first appear): 24 rounds yield
    the identical clustering (the kcore convergence-within-bound
    discipline, extended past the sf the docstrings cite)."""
    import duckdb

    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        _sql_knn_components,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'/root/testdata/{sf}/embeddings.parquet'"
    )
    a = con.sql(_sql_knn_components(rounds=20)).fetchall()
    b = con.sql(_sql_knn_components(rounds=24)).fetchall()
    assert a == b and len(a) > 0


def test_beam_search_on_planted_clusters(spark):
    """Serving-side search over the built graph: on separable
    geometry a 6-hop beam-16 search must find essentially the true
    top-6 for every query (the graph itself is near-perfect there),
    and the query id never appears in its own results."""
    emb = _clustered_df(spark)
    knn = kg.nn_descent(emb, k=6, rounds=3)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    # kNN edges alone disconnect into 10 islands here (measured:
    # recall 0.39 — only entry-point clusters reachable); the
    # permutation-init long links restore navigability (NSW trick)
    graph = knn.select("a", "b").union(kg.permutation_init(e, 6))
    q = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    res = kg._topk(
        kg.beam_search(graph, emb, q, beam=16, hops=6, n_entries=4)
        .select("a", "b", "s"),
        6,
    )
    assert res.where(F.col("a") == F.col("b")).count() == 0
    truth = kg.brute_force_topk(emb, q, k=6).select("a", "b")
    n_truth = truth.count()
    hit = res.select("a", "b").join(truth, ["a", "b"], "left_semi").count()
    assert hit / n_truth >= 0.95


def test_nn_descent_arrow_scorer_parity(spark):
    """The Arrow einsum scorer (production path) must build a graph
    of the same QUALITY as the oracle-exact fold scorer — scores
    differ only in final ulps, so near-tie cut flips are allowed but
    recall against shared truth must agree within a hair."""
    emb = _clustered_df(spark, n_clusters=6, per=15)
    truth = kg.brute_force_topk(
        emb, emb.select(F.col("vec_id").cast("bigint").alias("a")), 5
    ).select("a", "b")
    n_truth = truth.count()

    def rec(arrow):
        g = kg.nn_descent(emb, k=5, rounds=2, arrow=arrow)[-1]
        return (
            g.select("a", "b")
            .join(truth, ["a", "b"], "left_semi")
            .count()
            / n_truth
        )

    assert abs(rec(True) - rec(False)) <= 0.02


def test_delete_batch_compacts_and_bounds_rewrite(spark):
    """Tombstone deletion on planted clusters: the compacted graph
    contains NO edge touching a deleted id; survivors that never
    pointed at a dead node keep byte-identical lists (the bounded-
    rewrite contract, same discipline as insert_batch); re-knit
    lists stay inside the survivor corpus and inside the node's own
    planted cluster (the dead neighbour's out-list is where the
    replacements live)."""
    emb = _clustered_df(spark)
    g = kg.nn_descent(emb, k=6, rounds=3)[-1]
    # delete one-quarter: every 4th id
    tomb = emb.where(F.col("vec_id") % 4 == 1).select(
        F.col("vec_id").cast("bigint").alias("id")
    )
    dead = {r.id for r in tomb.collect()}
    out = kg.delete_batch(g, emb, tomb, k=6)
    upd = [(r.a, r.b) for r in out["updated"].select("a", "b").collect()]
    assert upd, "compacted graph is empty"
    assert all(a not in dead and b not in dead for a, b in upd)
    affected = {r.a for r in out["affected"].collect()}
    assert affected and affected.isdisjoint(dead)
    # untouched survivors: lists byte-identical (s and rk included)
    old = {
        (r.a, r.b, r.s, r.rk)
        for r in g.collect()
        if r.a not in dead and r.a not in affected
    }
    new = {
        (r.a, r.b, r.s, r.rk)
        for r in out["updated"].collect()
        if r.a not in affected
    }
    assert old == new
    # re-knit stays intra-cluster on this separable geometry
    re_rows = [
        (a, b) for a, b in upd if a in affected
    ]
    assert re_rows and all(a // 20 == b // 20 for a, b in re_rows)


def test_beam_search_tombstones_route_through_dead(spark):
    """Lazy-delete serving (FreshDiskANN pattern): with tombstones
    supplied, beam search never RETURNS a dead id, the entry set
    skips dead ids, and recall among survivors stays high because
    dead nodes still ROUTE (their adjacency is bridged v→d→b). The
    same search with the dead rows physically dropped but unbridged
    would strand any cluster whose links ran through them."""
    emb = _clustered_df(spark)
    knn = kg.nn_descent(emb, k=6, rounds=3)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    graph = knn.select("a", "b").union(kg.permutation_init(e, 6))
    tomb = emb.where(F.col("vec_id") % 4 == 1).select(
        F.col("vec_id").cast("bigint").alias("id")
    )
    dead = {r.id for r in tomb.collect()}
    q = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    res = kg._topk(
        kg.beam_search(
            graph, emb, q, beam=16, hops=6, n_entries=4,
            tombstones=tomb,
        ).select("a", "b", "s"),
        6,
    )
    rows = [(r.a, r.b) for r in res.collect()]
    assert rows and all(b not in dead for _, b in rows)
    assert all(a != b for a, b in rows)
    # truth among survivors only
    surv = emb.join(
        tomb.select(F.col("id").alias("vec_id")), ["vec_id"], "left_anti"
    )
    truth = kg.brute_force_topk(surv, q, k=6).select("a", "b")
    n_truth = truth.count()
    hit = (
        res.select("a", "b").join(truth, ["a", "b"], "left_semi").count()
    )
    assert hit / n_truth >= 0.9


def test_nn_descent_scorer_edge_set_equivalence(spark):
    """The production default (Arrow einsum) and the census/oracle
    mode (strict left-fold HOF) must build the IDENTICAL edge set on
    the driver fixture at sf0.01 — scores differ only in final ulps,
    and no top-k cut on this corpus sits on an ulp-sized tie. This is
    the receipt that lets the catalog stay oracle-exact on the fold
    while production builds take the kernel: same graph, either
    scorer."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    fold = {
        (r.a, r.b)
        for r in kg.nn_descent(emb, k=10, rounds=2, arrow=False)[-1]
        .select("a", "b")
        .collect()
    }
    arrow = {
        (r.a, r.b)
        for r in kg.nn_descent(emb, k=10, rounds=2, arrow=True)[-1]
        .select("a", "b")
        .collect()
    }
    assert fold == arrow and len(fold) > 0


def test_knn_scorer_env_default(monkeypatch):
    """None defers to SPARK_GRAFT_KNN_SCORER; 'fold' flips the
    default off, anything else (including unset) means Arrow — the
    production default the module docstring promises."""
    monkeypatch.delenv("SPARK_GRAFT_KNN_SCORER", raising=False)
    assert kg._resolve_arrow(None) is True
    monkeypatch.setenv("SPARK_GRAFT_KNN_SCORER", "fold")
    assert kg._resolve_arrow(None) is False
    assert kg._resolve_arrow(True) is True
    monkeypatch.setenv("SPARK_GRAFT_KNN_SCORER", "arrow")
    assert kg._resolve_arrow(None) is True
    assert kg._resolve_arrow(False) is False
    # case/space-insensitive, and anything else is a loud error —
    # a typo must not silently select a scorer
    monkeypatch.setenv("SPARK_GRAFT_KNN_SCORER", " FOLD ")
    assert kg._resolve_arrow(None) is False
    monkeypatch.setenv("SPARK_GRAFT_KNN_SCORER", "flod")
    with pytest.raises(ValueError):
        kg._resolve_arrow(None)


def test_beam_search_tombstoned_query_excluded(spark):
    """With query_emb=None, a tombstoned id passed as a QUERY must
    not resolve: its rows vanish from the result's `a` side too (the
    qe binding happens after the survivor filter), so the docstring
    guarantee — tombstoned ids never enter the results — holds on
    both columns."""
    emb = _clustered_df(spark, n_clusters=4, per=10)
    e = kg._normalize(emb, "vec_id", "embedding")
    graph = kg.permutation_init(e, 6)
    tomb = spark.createDataFrame([(0,), (13,)], "id long")
    q = spark.createDataFrame([(0,), (13,), (25,)], "a long")
    res = kg.beam_search(
        graph, emb, q, beam=8, hops=2, n_entries=4, tombstones=tomb
    )
    rows = [(r.a, r.b) for r in res.collect()]
    assert rows, "surviving query must still return rows"
    assert all(a == 25 for a, _ in rows)
    assert all(b not in (0, 13) for _, b in rows)


def test_insert_batch_links_and_untouched_lists(spark):
    """Search-based insertion on planted clusters: every new node
    links inside its own cluster (the beam + long links find it),
    and base lists NOT in `touched` are byte-identical in the
    updated graph — the bounded-rewrite contract."""
    emb = _clustered_df(spark)
    base = emb.where(F.col("vec_id") % 3 != 2)
    batch = emb.where(F.col("vec_id") % 3 == 2)
    g = kg.nn_descent(base, k=6, rounds=3)[-1]
    e_base = kg._normalize(base, "vec_id", "embedding")
    sg = g.select("a", "b").union(kg.permutation_init(e_base, 6))
    out = kg.insert_batch(
        g, base, batch, k=6, beam=16, hops=6, search_graph=sg
    )
    new_e = out["new_edges"].collect()
    assert new_e, "insertion produced no edges"
    assert all(r.a // 20 == r.b // 20 for r in new_e)
    touched = {r.a for r in out["touched"].collect()}
    old = {
        (r.a, r.b) for r in g.collect() if r.a not in touched
    }
    upd = {
        (r.a, r.b)
        for r in out["updated"].collect()
        if r.a not in touched and r.a % 3 != 2
    }
    assert old == upd


def test_permutation_init_deterministic_and_bounded(spark):
    emb = _clustered_df(spark, n_clusters=3, per=7)
    e = kg._normalize(emb, "vec_id", "embedding")
    g1 = sorted(
        (r.a, r.b) for r in kg.permutation_init(e, k=4).collect()
    )
    g2 = sorted(
        (r.a, r.b) for r in kg.permutation_init(e, k=4).collect()
    )
    assert g1 == g2
    ids = {r.id for r in e.select("id").collect()}
    assert all(a in ids and b in ids and a != b for a, b in g1)
    from collections import Counter

    deg = Counter(a for a, _ in g1)
    assert max(deg.values()) <= 4


def test_knn_probe_equals_beam_search(spark, tmp_path):
    """The saved-index probe (knn_save → knn_probe, partition-pruned
    reads) must be RESULT-IDENTICAL to in-query beam_search on the
    same graph — the graph-ANN twin of test_ivf_saved_index_probe:
    same entry pick, same hop expansion, same (s DESC, b ASC) cuts.
    Also pins the entry-set contract (n_entries > max_entries is a
    loud error, not a silently-smaller entry pool)."""
    emb = _clustered_df(spark)
    e = kg._normalize(emb, "vec_id", "embedding")
    knn = kg.nn_descent(emb, k=6, rounds=2, arrow=False)[-1]
    links = kg.permutation_init(e, 6)
    graph = knn.select("a", "b").union(links.select("a", "b"))
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=8, max_entries=16,
                long_links=links)
    q = emb.where(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    beam = kg.beam_search(
        graph, emb, q, beam=8, hops=3, n_entries=4, arrow=False
    )
    probe = kg.knn_probe(
        spark, path, q, beam=8, hops=3, n_entries=4, arrow=False
    )
    b_rows = {(r.a, r.b, r.rk) for r in beam.collect()}
    p_rows = {(r.a, r.b, r.rk) for r in probe.collect()}
    assert b_rows and p_rows == b_rows
    # loaded frames feed in-query beam_search identically
    idx = kg.knn_load(spark, path)
    loaded = kg.beam_search(
        idx["graph"].select("a", "b").union(idx["links"]),
        idx["vectors"].select(
            F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
        ),
        q,
        beam=8,
        hops=3,
        n_entries=4,
        arrow=False,
    )
    assert {(r.a, r.b, r.rk) for r in loaded.collect()} == b_rows
    with pytest.raises(ValueError):
        kg.knn_probe(spark, path, q, n_entries=17)


def test_delete_cycles_keep_recall(spark):
    """Repeated delete_batch consolidation must not degrade graph
    navigability (r12 VERDICT item 3, driver-scale leg of the x64
    probe): three consecutive delete/consolidate cycles (~10% of the
    current corpus each), after each the compacted graph + survivor
    long links serves a fixed surviving query set — recall@6 vs
    survivor truth must hold a floor on every cycle, and no edge may
    touch a deleted id."""
    emb = _clustered_df(spark)
    g = kg.nn_descent(emb, k=6, rounds=3, arrow=False)[-1]
    cur = emb
    q = emb.where(
        (F.col("vec_id") % 10 > 3) & (F.col("vec_id") % 3 == 0)
    ).select(F.col("vec_id").cast("bigint").alias("a"))
    recalls = []
    for i in range(3):
        tomb = cur.where(F.col("vec_id") % 10 == i).select(
            F.col("vec_id").cast("bigint").alias("id")
        )
        out = kg.delete_batch(g, cur, tomb, k=6, arrow=False)
        g = out["updated"].localCheckpoint()
        assert (
            g.join(
                tomb.select(F.col("id").alias("b")), ["b"], "left_semi"
            ).count()
            == 0
        )
        cur = cur.join(
            tomb.select(F.col("id").alias("vec_id")),
            ["vec_id"],
            "left_anti",
        ).localCheckpoint()
        ce = kg._normalize(cur, "vec_id", "embedding")
        sg = g.select("a", "b").union(
            kg.permutation_init(ce, 6).select("a", "b")
        )
        res = kg._topk(
            kg.beam_search(
                sg, cur, q, beam=16, hops=6, n_entries=4, arrow=False
            ).select("a", "b", "s"),
            6,
        )
        truth = kg.brute_force_topk(cur, q, k=6).select("a", "b")
        n_truth = truth.count()
        hit = (
            res.select("a", "b")
            .join(truth, ["a", "b"], "left_semi")
            .count()
        )
        recalls.append(hit / n_truth)
    # floor on EVERY cycle — separable geometry keeps true
    # neighbourhoods intact across deletions, so the bound's slack
    # covers only re-knit/entry-pick noise
    assert all(r >= 0.85 for r in recalls), recalls


def test_knn_refresh_matches_insert_batch(spark, tmp_path):
    """Refreshing the SAVED index must produce exactly
    insert_batch's "updated" edge set (same search graph, same
    back-link re-cut) — the disk/in-query twin contract the IVF
    family pins with test_ivf_saved_index_probe. Also pins the
    retry guard: re-refreshing the same batch inserts nothing,
    touches nothing, and leaves the adjacency byte-identical."""
    emb = _clustered_df(spark)
    base = emb.where(F.col("vec_id") % 3 != 2)
    batch = emb.where(F.col("vec_id") % 3 == 2)
    knn = kg.nn_descent(base, k=6, rounds=2, arrow=False)[-1]
    e = kg._normalize(base, "vec_id", "embedding")
    links = kg.permutation_init(e, 6)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, base, path, n_parts=8, max_entries=16,
                long_links=links)
    out = kg.knn_refresh(
        spark, path, batch, k=6, beam=8, hops=3, n_entries=4,
        arrow=False,
    )
    assert out["inserted"] == batch.count()
    sg = knn.select("a", "b").union(links.select("a", "b"))
    ins = kg.insert_batch(
        knn, base, batch, k=6, beam=8, hops=3, n_entries=4,
        search_graph=sg, arrow=False,
    )
    want = {(r.a, r.b, r.rk) for r in ins["updated"].collect()}
    got = {
        (r.a, r.b, r.rk)
        for r in spark.read.parquet(f"{path}/adjacency")
        .select("a", "b", "rk")
        .collect()
    }
    assert got == want and len(got) > 0
    # vectors: every id exactly once
    v = spark.read.parquet(f"{path}/vectors")
    assert v.count() == emb.count()
    assert v.select("id").distinct().count() == emb.count()
    # retry: idempotent no-op
    out2 = kg.knn_refresh(
        spark, path, batch, k=6, beam=8, hops=3, n_entries=4,
        arrow=False,
    )
    assert out2 == {"inserted": 0, "touched": 0}
    got2 = {
        (r.a, r.b, r.rk)
        for r in spark.read.parquet(f"{path}/adjacency")
        .select("a", "b", "rk")
        .collect()
    }
    assert got2 == want
    assert v.count() == emb.count()
    # refreshed entries keep the global md5 order: probing with the
    # full corpus graph finds new ids as results
    probe = kg.knn_probe(
        spark, path,
        batch.limit(3).select(F.col("vec_id").cast("bigint").alias("a")),
        beam=8, hops=3, n_entries=4, arrow=False,
    )
    assert probe.count() > 0


def test_knn_compact_matches_delete_batch(spark, tmp_path):
    """Compacting the SAVED index must produce exactly delete_batch's
    "updated" edge set — the disk/in-query twin contract for the
    delete leg (same bridge, same re-knit, same cuts). Also pins:
    vectors and links drop every dead endpoint, the entry table is
    re-derived when deletions eat into its saved superset, and a
    post-compact probe still serves (no dead ids anywhere)."""
    emb = _clustered_df(spark)
    knn = kg.nn_descent(emb, k=6, rounds=2, arrow=False)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    links = kg.permutation_init(e, 6)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=8, max_entries=16,
                long_links=links)
    tomb = emb.where(F.col("vec_id") % 5 == 1).select(
        F.col("vec_id").cast("bigint").alias("id")
    )
    out = kg.knn_compact(spark, path, tomb, k=6, arrow=False)
    ref = kg.delete_batch(knn, emb, tomb, k=6, arrow=False)
    assert out["deleted"] == tomb.count()
    assert out["affected"] == ref["affected"].count()
    want = {(r.a, r.b, r.rk) for r in ref["updated"].collect()}
    got = {
        (r.a, r.b, r.rk)
        for r in spark.read.parquet(f"{path}/adjacency")
        .select("a", "b", "rk")
        .collect()
    }
    assert got == want and len(got) > 0
    dead = {r.id for r in tomb.collect()}
    v = spark.read.parquet(f"{path}/vectors")
    assert v.count() == emb.count() - len(dead)
    assert v.join(tomb, ["id"], "left_semi").count() == 0
    lk = spark.read.parquet(f"{path}/links")
    assert (
        lk.join(tomb.select(F.col("id").alias("a")), ["a"], "left_semi")
        .count()
        == 0
    )
    assert (
        lk.join(tomb.select(F.col("id").alias("b")), ["b"], "left_semi")
        .count()
        == 0
    )
    ents = spark.read.parquet(f"{path}/entries")
    assert ents.count() == 16
    assert ents.join(tomb, ["id"], "left_semi").count() == 0
    # post-compact serving: surviving queries get results, none dead
    q = emb.where(F.col("vec_id") % 5 == 0).limit(5).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    res = kg.knn_probe(
        spark, path, q, beam=8, hops=3, n_entries=4, arrow=False
    )
    rows = [(r.a, r.b) for r in res.collect()]
    assert rows and all(b not in dead for _, b in rows)


def test_knn_probe_without_links(spark, tmp_path):
    """An index saved WITHOUT long links (long_links=None writes an
    empty relation) must still probe — the reader falls back to
    adjacency-only — and equal beam_search over the bare graph."""
    emb = _clustered_df(spark, n_clusters=4, per=10)
    knn = kg.nn_descent(emb, k=5, rounds=2, arrow=False)[-1]
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=4, max_entries=8)
    q = emb.where(F.col("vec_id") % 9 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    beam = kg.beam_search(
        knn.select("a", "b"), emb, q, beam=6, hops=2, n_entries=3,
        arrow=False,
    )
    probe = kg.knn_probe(
        spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
    )
    assert {(r.a, r.b, r.rk) for r in probe.collect()} == {
        (r.a, r.b, r.rk) for r in beam.collect()
    }


def test_knn_repartition_preserves_probe(spark, tmp_path):
    """Resizing the layout (n_parts 4 -> 8) moves rows between
    partition files but must not change ANY probe result, and must
    survive a subsequent refresh under the new modulus."""
    emb = _clustered_df(spark, n_clusters=6, per=15)
    base = emb.where(F.col("vec_id") % 7 != 3)
    batch = emb.where(F.col("vec_id") % 7 == 3)
    knn = kg.nn_descent(base, k=5, rounds=2, arrow=False)[-1]
    e = kg._normalize(base, "vec_id", "embedding")
    links = kg.permutation_init(e, 5)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, base, path, n_parts=4, max_entries=8,
                long_links=links)
    q = base.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    before = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
        ).collect()
    }
    out = kg.knn_repartition(spark, path, 8)
    assert out["n_parts"] == 8 and out["rows_rewritten"] > 0
    after = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
        ).collect()
    }
    assert after == before and before
    # layout actually changed modulus: pa values reach past old range
    pas = {
        r.pa
        for r in spark.read.parquet(f"{path}/adjacency")
        .select("pa")
        .distinct()
        .collect()
    }
    assert max(pas) >= 4
    # refresh still works under the new modulus
    r2 = kg.knn_refresh(
        spark, path, batch, k=5, beam=6, hops=2, n_entries=3,
        arrow=False,
    )
    assert r2["inserted"] == batch.count()


def test_knn_compact_drops_emptied_partitions(spark, tmp_path):
    """r13 ADVICE (medium): dynamic partition overwrite replaces only
    partitions PRESENT in the written data, so a pa/pv partition whose
    EVERY row died writes nothing and its old files would survive —
    deleted adjacency lists, vectors, and links resurfacing after
    compaction. knn_compact must drop those emptied directories
    explicitly (the ivf_delete rule). This deletes every id hashing
    into one partition of a 4-part index and asserts no dead row
    survives any relation, the emptied dirs are gone from disk, and
    the honest "deleted" count excludes absent ids."""
    import os

    emb = _clustered_df(spark, n_clusters=6, per=15)
    knn = kg.nn_descent(emb, k=5, rounds=2, arrow=False)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    links = kg.permutation_init(e, 5)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=4, max_entries=8,
                long_links=links)
    part = (
        emb.select(
            F.pmod(
                F.xxhash64(F.col("vec_id").cast("bigint")), F.lit(4)
            ).alias("p")
        )
        .groupBy("p").count().orderBy("count", "p").first().p
    )
    tomb = emb.where(
        F.pmod(F.xxhash64(F.col("vec_id").cast("bigint")), F.lit(4))
        == part
    ).select(F.col("vec_id").cast("bigint").alias("id"))
    n_present = tomb.count()
    assert n_present > 0
    # absent ids must be no-ops AND not counted as deletions
    ghost = spark.createDataFrame(
        [(900001,), (900002,)], "id long"
    )
    out = kg.knn_compact(
        spark, path, tomb.union(ghost), k=5, arrow=False
    )
    assert out["deleted"] == n_present
    dead = {r.id for r in tomb.collect()}
    adj = spark.read.parquet(f"{path}/adjacency")
    assert adj.where(F.col("a").isin(dead)).count() == 0
    assert adj.where(F.col("b").isin(dead)).count() == 0
    v = spark.read.parquet(f"{path}/vectors")
    assert v.where(F.col("id").isin(dead)).count() == 0
    lk = spark.read.parquet(f"{path}/links")
    assert lk.where(F.col("a").isin(dead)).count() == 0
    assert lk.where(F.col("b").isin(dead)).count() == 0
    # the emptied directories are physically gone — the old files
    # cannot resurface on any future read or repartition
    assert not os.path.exists(f"{path}/adjacency/pa={part}")
    assert not os.path.exists(f"{path}/vectors/pv={part}")
    assert not os.path.exists(f"{path}/links/pa={part}")
    # surviving queries still serve with zero dead endpoints
    q = emb.where(~F.col("vec_id").isin(dead)).limit(5).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    res = kg.knn_probe(
        spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
    )
    rows = [(r.a, r.b) for r in res.collect()]
    assert rows and all(b not in dead for _, b in rows)


def test_knn_repartition_static_under_dynamic_session(spark, tmp_path):
    """r13 ADVICE: a session that globally sets
    partitionOverwriteMode=dynamic must not corrupt a SHRINKING
    repartition (8 -> 4): without the explicit static pin, the old
    pa/pv >= 4 directories would survive the overwrite and duplicate
    every surviving row. Pins row-count and probe invariance under
    the hostile session config, and that the pin restores the
    caller's mode."""
    emb = _clustered_df(spark, n_clusters=6, per=15)
    knn = kg.nn_descent(emb, k=5, rounds=2, arrow=False)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    links = kg.permutation_init(e, 5)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=8, max_entries=8,
                long_links=links)
    counts = {
        rel: spark.read.parquet(f"{path}/{rel}").count()
        for rel in ("adjacency", "links", "vectors")
    }
    q = emb.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").cast("bigint").alias("a")
    )
    before = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
        ).collect()
    }
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic"
    )
    try:
        kg.knn_repartition(spark, path, 4)
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == "dynamic"
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev
        )
    for rel, n in counts.items():
        assert spark.read.parquet(f"{path}/{rel}").count() == n, rel
    after = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
        ).collect()
    }
    assert after == before and before


def test_knn_probe_corrupt_links_fails_loudly(spark, tmp_path):
    """r13 ADVICE: the links fallback exists for ABSENT links (old
    layout / no data files), not for broken ones — a corrupted links
    relation must fail the probe loudly instead of silently serving
    degraded results without long links."""
    import glob
    import os

    emb = _clustered_df(spark, n_clusters=4, per=10)
    knn = kg.nn_descent(emb, k=5, rounds=2, arrow=False)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    links = kg.permutation_init(e, 5)
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=4, max_entries=8,
                long_links=links)
    for f in glob.glob(f"{path}/links/pa=*/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"this is not a parquet file")
    q = emb.limit(3).select(F.col("vec_id").cast("bigint").alias("a"))
    with pytest.raises(Exception):
        kg.knn_probe(
            spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
        ).collect()
    # the absent-links fallback still works: remove links entirely
    import shutil

    shutil.rmtree(f"{path}/links")
    res = kg.knn_probe(
        spark, path, q, beam=6, hops=2, n_entries=3, arrow=False
    )
    assert res.count() > 0


def test_knn_probe_external_query_equals_beam_search(spark, tmp_path):
    """r13 VERDICT item 1: external-query serving — knn_probe with
    query_emb (vectors NOT in the index, the real ANN-serving shape)
    must equal beam_search with the same query_emb over the loaded
    graph: same entry pick, same hops, same cuts."""
    emb = _clustered_df(spark)
    knn = kg.nn_descent(emb, k=6, rounds=2, arrow=False)[-1]
    e = kg._normalize(emb, "vec_id", "embedding")
    links = kg.permutation_init(e, 6)
    graph = knn.select("a", "b").union(links.select("a", "b"))
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=8, max_entries=16,
                long_links=links)
    # external queries: ids far outside the corpus, vectors = wobbled
    # cluster centres (near but not equal to any member)
    ext = spark.createDataFrame(
        [
            (
                100000 + c,
                [
                    float(
                        (10.0 if d == c else 0.0)
                        + 0.5 * math.sin(0.9 * (c + 1) * (d + 1))
                        + 0.1 * math.cos(0.7 * (c + 2) * (d + 1))
                    )
                    for d in range(16)
                ],
            )
            for c in range(5)
        ],
        "vec_id long, embedding array<float>",
    )
    q = ext.select(F.col("vec_id").cast("bigint").alias("a"))
    beam = kg.beam_search(
        graph, emb, q, beam=8, hops=3, n_entries=4,
        query_emb=ext, arrow=False,
    )
    probe = kg.knn_probe(
        spark, path, q, beam=8, hops=3, n_entries=4,
        query_emb=ext, arrow=False,
    )
    b_rows = {(r.a, r.b, r.rk) for r in beam.collect()}
    p_rows = {(r.a, r.b, r.rk) for r in probe.collect()}
    assert b_rows and p_rows == b_rows
    # every external query resolved (none silently dropped)
    assert {r.a for r in probe.select("a").distinct().collect()} == {
        100000 + c for c in range(5)
    }


def test_knn_probe_int_typed_query_ids(spark, tmp_path):
    """r13 ADVICE: xxhash64 is type-sensitive (hash(int 5) !=
    hash(bigint 5)) and the index keys are bigint — an int-typed
    query column must still prune to the RIGHT partitions and return
    identical results, not silently empty ones."""
    emb = _clustered_df(spark, n_clusters=4, per=10)
    knn = kg.nn_descent(emb, k=5, rounds=2, arrow=False)[-1]
    path = str(tmp_path / "knn_idx")
    kg.knn_save(knn, emb, path, n_parts=4, max_entries=8)
    ids = [r.vec_id for r in emb.where(
        F.col("vec_id") % 9 == 0
    ).select("vec_id").collect()]
    q_big = spark.createDataFrame([(int(i),) for i in ids], "a long")
    q_int = spark.createDataFrame([(int(i),) for i in ids], "a int")
    got_big = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q_big, beam=6, hops=2, n_entries=3,
            arrow=False,
        ).collect()
    }
    got_int = {
        (r.a, r.b, r.rk)
        for r in kg.knn_probe(
            spark, path, q_int, beam=6, hops=2, n_entries=3,
            arrow=False,
        ).collect()
    }
    assert got_big and got_int == got_big
