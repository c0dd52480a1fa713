"""Property-based tests (SURVEY.md §5.3, hypothesis): the upsert
kernel's algebraic laws and parser totality — the invariants that make
the engine's loads idempotent, restartable, and order-free."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gsuites_gcp_graphdb_spark.graph.literal import edges_of, vertices_of
from gsuites_gcp_graphdb_spark.graph.loaders import parse_member_bindings
from gsuites_gcp_graphdb_spark.graph.upsert import (
    graph_diff,
    upsert_edges,
    upsert_vertices,
)

LABELS = ("user", "group", "role", "project")
KEYS = ("a@x", "b@x", "c@x", "roles/r1", "p-1")

vertex_strategy = st.lists(
    st.tuples(st.sampled_from(LABELS), st.sampled_from(KEYS)),
    min_size=1,
    max_size=8,
)

edge_strategy = st.lists(
    st.tuples(
        st.sampled_from(LABELS),
        st.sampled_from(KEYS),
        st.sampled_from(LABELS),
        st.sampled_from(KEYS),
    ),
    min_size=1,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(batch=vertex_strategy)
@_SETTINGS
def test_vertex_upsert_idempotent_and_order_free(spark, batch):
    """load(load(G,X),X) == load(G,X), and shuffling X changes nothing
    (SURVEY.md §2.3)."""
    v0 = vertices_of(spark, [("user", "seed@x")])
    b = vertices_of(spark, batch)
    once = upsert_vertices(v0, b)
    twice = upsert_vertices(once, b)
    rev = upsert_vertices(v0, vertices_of(spark, list(reversed(batch))))
    ids_once = sorted(r.id for r in once.collect())
    assert ids_once == sorted(r.id for r in twice.collect())
    assert ids_once == sorted(r.id for r in rev.collect())
    # uniqueness invariant
    assert len(ids_once) == len(set(ids_once))


@given(batch=edge_strategy)
@_SETTINGS
def test_edge_upsert_idempotent(spark, batch):
    e0 = edges_of(spark, [("user", "seed@x", "group", "g@x")])
    b = edges_of(spark, batch)
    once = upsert_edges(e0, b)
    twice = upsert_edges(once, b)
    k = lambda r: (r.src, r.dst, r.label)  # noqa: E731
    assert sorted(map(k, once.collect())) == sorted(map(k, twice.collect()))


@given(
    batch_a=vertex_strategy,
    batch_b=vertex_strategy,
)
@_SETTINGS
def test_vertex_batches_commute(spark, batch_a, batch_b):
    """Merging A then B == merging B then A (the property that kills
    the reference's strict load order, README.md:286-289)."""
    v0 = vertices_of(spark, [("user", "seed@x")])
    ab = upsert_vertices(upsert_vertices(v0, vertices_of(spark, batch_a)),
                         vertices_of(spark, batch_b))
    ba = upsert_vertices(upsert_vertices(v0, vertices_of(spark, batch_b)),
                         vertices_of(spark, batch_a))
    d = graph_diff(ab, ab.limit(0), ba, ba.limit(0))
    assert d["vertices_only_a"].count() == 0
    assert d["vertices_only_b"].count() == 0


@given(
    members=st.lists(
        st.one_of(
            st.sampled_from(["allUsers", "allAuthenticatedUsers"]),
            st.from_regex(r"(user|group|serviceAccount):[a-z]{1,8}@x\.com", fullmatch=True),
            st.from_regex(r"[a-z]{1,12}", fullmatch=True),  # junk, no colon
            st.from_regex(r"[a-z]{1,5}:[a-z]{1,5}:[a-z]{1,5}", fullmatch=True),
        ),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_member_parser_total(spark, members):
    """The parser never crashes and always yields a label+key — unlike
    main.go:563-564's unguarded split index."""
    df = spark.createDataFrame(
        [(m, "roles/r") for m in members], "member string, dst_key string"
    )
    rows = parse_member_bindings(df).collect()
    assert len(rows) == len(members)
    for r in rows:
        assert r.src_label in ("user", "group", "serviceAccount")
        assert r.src_key and isinstance(r.src_key, str)


@given(batch=vertex_strategy)
@_SETTINGS
def test_remove_inverts_upsert(spark, batch):
    """remove(upsert(G, X), X-ids) == G when X is disjoint from G —
    selective drop is the inverse of get-or-create for fresh rows."""
    from gsuites_gcp_graphdb_spark.graph.upsert import remove_vertices

    base = vertices_of(spark, [("serviceAccount", "seed-sa@x")])
    b = vertices_of(spark, batch)
    merged = upsert_vertices(base, b)
    restored, _ = remove_vertices(merged, edges_of(spark, []), b.select("id"))
    assert sorted(r.id for r in restored.collect()) == sorted(
        r.id for r in base.collect()
    )


@given(edges=edge_strategy)
@_SETTINGS
def test_all_paths_endpoints_match_reachability(spark, edges):
    """The set of vertices a path terminates at equals the reachable
    set restricted to targets (path enumeration invents nothing and
    misses nothing within the depth cap)."""
    from pyspark.sql import functions as F

    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        all_paths,
        reachable_from,
    )
    from gsuites_gcp_graphdb_spark.graph.traversal import Graph

    verts = {(sl, sk) for sl, sk, _, _ in edges} | {
        (dl, dk) for _, _, dl, dk in edges
    }
    g = Graph(vertices_of(spark, sorted(verts)), edges_of(spark, edges))
    src_label, src_key = sorted(verts)[0]
    src = g.vertices.filter(
        (F.col("label") == src_label)
        & (F.coalesce("email", "name", "projectid") == src_key)
    ).select("id")
    # every NON-source vertex is a target (reachable_from excludes the
    # sources; a cyclic path back to the source would otherwise count
    # as a path endpoint but not as "reachable")
    tgt = g.vertices.select("id").join(src, ["id"], "left_anti")
    # depth cap >= |V| makes the cap irrelevant on acyclic inputs;
    # cyclic random graphs would loop forever in path ENUMERATION, so
    # bound by vertex count (simple paths can't be longer without a
    # repeat, and repeats beyond |V| add no new endpoints)
    paths = all_paths(g, src, tgt, max_depth=len(verts))
    path_ends = {
        r.id for r in paths.select("id").dropDuplicates().collect()
    }
    reach = {
        r.id for r in reachable_from(g, src, max_iter=len(verts)).collect()
    }
    assert path_ends == reach


@given(edges=edge_strategy)
@_SETTINGS
def test_cc_star_equals_hashmin(spark, edges):
    """The two connected-components implementations agree on arbitrary
    random graphs — the cross-algorithm invariant that pins both."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        connected_components,
        connected_components_star,
    )
    from gsuites_gcp_graphdb_spark.graph.traversal import Graph

    verts = {(sl, sk) for sl, sk, _, _ in edges} | {
        (dl, dk) for _, _, dl, dk in edges
    }
    g = Graph(vertices_of(spark, sorted(verts)), edges_of(spark, edges))
    a = sorted(map(tuple, connected_components(g).collect()))
    b = sorted(map(tuple, connected_components_star(g).collect()))
    assert a == b


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_dedup_clusters_partition_pairs(spark, pairs):
    """Cluster census invariants: members sum to the number of paired
    doc ids, every cluster has >= 2 members, and each representative
    is the minimum of its component (so reps are distinct doc ids)."""
    from gsuites_gcp_graphdb_spark.operators.dedup import dedup_clusters

    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    df = spark.createDataFrame(canon, "id_a long, id_b long")
    out = dedup_clusters(df).collect()
    ids = {x for p in canon for x in p}
    assert sum(r.n_members for r in out) == len(ids)
    assert all(r.n_members >= 2 for r in out)
    assert all(r.cluster_rep in ids for r in out)


token_strategy = st.lists(
    st.sampled_from(("aa", "bb", "cc", "d")), min_size=1, max_size=12
)


@given(docs=st.lists(token_strategy, min_size=1, max_size=6))
@_SETTINGS
def test_repetition_stats_matches_python_model(spark, docs):
    """repetition_stats == a pure-Python model on arbitrary token
    streams: dup fraction, argmax 2-gram with (count desc, gram asc)
    tie-break, and char coverage."""
    from collections import Counter

    from gsuites_gcp_graphdb_spark.operators.text import repetition_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    out = {
        r.doc_id: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i, toks in enumerate(docs):
        text = " ".join(toks)
        grams = (
            [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
            if len(toks) > 1
            else [toks[0]]
        )
        counts = Counter(grams)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        r = out[i]
        assert r.n_tokens == len(toks)
        assert abs(r.dup_tok_frac - round(1 - len(set(toks)) / len(toks), 6)) < 1e-9
        assert (r.top2_gram, r.top2_count) == best
        assert (
            abs(
                r.top2_char_frac
                - round(best[1] * len(best[0]) / len(text), 6)
            )
            < 1e-9
        )


# ---- round-5 scrub operators vs pure-Python models ------------------

_text_strategy = st.lists(
    st.text(
        alphabet=st.characters(
            codec="ascii", categories=("L", "N", "P", "Z")
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@given(texts=_text_strategy)
@_SETTINGS
def test_normalize_text_matches_python_model(spark, texts):
    """normalize_text == the pure-Python lower/strip/collapse/trim
    model on arbitrary ASCII text (the oracle only pins fixture
    inputs; this pins the general contract)."""
    import hashlib
    import re

    from gsuites_gcp_graphdb_spark.operators.text import normalize_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    for i, t in rows:
        n = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()
        assert got[i].norm_hash == hashlib.md5(n.encode()).hexdigest()
        assert got[i].n_tokens_norm == (len(n.split(" ")) if n else 0)
        assert got[i].changed == (n != t)


@given(texts=_text_strategy)
@_SETTINGS
def test_pii_scrub_counts_match_python_model(spark, texts):
    """pii_scrub's match counts == Python re counts with the same
    patterns (regex dialect agreement on arbitrary ASCII input)."""
    import re

    from gsuites_gcp_graphdb_spark.operators.text import (
        PII_PATTERNS,
        pii_scrub,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    for i, t in rows:
        for name, pat in PII_PATTERNS:
            assert getattr(got[i], f"n_{name}") == len(re.findall(pat, t)), (
                name,
                t,
            )


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=14,
    )
)
@_SETTINGS
def test_skyline_equals_brute_force(spark, pts):
    """The banded prefix-max skyline equals the quadratic dominance
    definition on arbitrary small point sets (duplicates included)."""
    from gsuites_gcp_graphdb_spark.functions.ranking import skyline2d

    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = {r.id for r in skyline2d(df, "price", "size").collect()}
    want = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for (x2, y2) in pts
        )
    }
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=24,
    ),
    gaps=st.lists(
        st.integers(min_value=1, max_value=60 * 40),  # up to ~1.7 days
        min_size=24,
        max_size=24,
    ),
)
@_SETTINGS
def test_prefix_sum_property(spark, vals, gaps):
    """Two-pass chunked prefix sum == sequential running sum for any
    values and any (possibly multi-day-spanning) timestamp spacing."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gsuites_gcp_graphdb_spark.operators import timeseries as tss

    t = dt.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate(vals):
        t = t + dt.timedelta(minutes=gaps[i])
        rows.append((i, t, "s", v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, k string, v long"
    ).withColumn("v", F.col("v").cast(tss.DEC))
    got = {
        r.event_id: int(r.prefix)
        for r in tss.prefix_sum(df, "k", ["ts", "event_id"], "v").collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


@given(
    ids=st.sets(
        st.integers(min_value=1, max_value=10**9),
        min_size=8,
        max_size=18,
    )
)
@settings(
    max_examples=3,  # each example is a full build ladder (~50s)
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nn_descent_invariants_for_any_id_set(spark, ids):
    """NN-Descent structural laws hold for ANY id set — dense,
    sparse, or 1e9-offset (the axis the x4 replica fixture broke:
    the old init assumed dense ids). Vectors are a deterministic
    function of id, so hypothesis explores exactly the id-space
    geometry: per-stage degree <= k, no self loops, contiguous
    ranks, and monotone recall vs brute-force truth (the
    keep-best-k theorem)."""
    import math

    from pyspark.sql import functions as F

    from gsuites_gcp_graphdb_spark.operators import knngraph as kg

    rows = [
        (i, [float(math.sin(i * (d + 1))) for d in range(6)])
        for i in sorted(ids)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    k = 3
    ladder = kg.nn_descent(emb, k=k, rounds=2)
    q = emb.select(F.col("vec_id").cast("bigint").alias("a"))
    truth = kg.brute_force_topk(emb, q, k=k).select("a", "b")
    hits = [
        g.select("a", "b").join(truth, ["a", "b"], "left_semi").count()
        for g in ladder
    ]
    assert hits == sorted(hits)
    for g in ladder:
        rows_g = g.collect()
        assert all(r.a != r.b for r in rows_g)
        assert all(1 <= r.rk <= k for r in rows_g)
        per = {}
        for r in rows_g:
            per.setdefault(r.a, []).append(r.rk)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
