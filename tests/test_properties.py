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
