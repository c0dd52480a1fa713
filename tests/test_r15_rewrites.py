"""Round-15 optimization equivalence pins.

Each test pins an r15 rewrite to its pre-rewrite semantics:

- streaming trigger invariance (VERDICT r14 item 4): the two bench
  streaming entries' drained output must not depend on
  maxFilesPerTrigger — the receipt that lets the trigger be tuned as
  a pure throughput knob.
- hits sparse-loop rewrite: the per-round densify elimination must
  match the dense spelling (inlined here) on the same vertex set, to
  FP-reassociation precision: dropping exact-0.0 terms from a double
  SUM is a value no-op, but the rewrite changes partition layouts and
  hence the (already nondeterministic) reduction order of the
  remaining terms — 1-ulp wiggle, absorbed by the 6-decimal rounding
  the public query (g_hits_top) applies and the oracle hashes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_funnel_stream_trigger_invariant(spark):
    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        _events_funnel_stream,
    )

    outs = [
        _rows(_events_funnel_stream(spark, SF, _mfpt=m))
        for m in (1, 2, 4)
    ]
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.slow
def test_ingest_e2e_trigger_invariant(spark):
    from gsuites_gcp_graphdb_spark.plans.graph_queries import (
        _stream_ingest_e2e,
    )

    outs = [
        _rows(_stream_ingest_e2e(spark, SF, _mfpt=m)) for m in (1, 2, 4)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_broadcast_hint_side_is_role_bounded(spark):
    """The §3.1 broadcast hints in principals_with_access_g /
    who_can_access_min_bucket are safe only because the hinted side
    is bounded by the role universe — which in TPC-H-shaped data is
    the 25-value p_brand domain at EVERY scale factor. Pin both
    halves of that invariant: the role-vertex count equals the
    distinct-brand count, and it is tiny (far below any broadcast
    threshold)."""
    from gsuites_gcp_graphdb_spark.plans.graph_queries import _graph
    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

    g = _graph(spark, SF)
    n_roles = g.vertices.filter(F.col("label") == "role").count()
    n_brands = (
        load_table(spark, SF, "part").select("p_brand").distinct().count()
    )
    assert n_roles == n_brands
    assert n_roles <= 25


def test_ppr_sparse_loop_matches_dense_spelling(spark):
    """The r15 sparse personalized-pagerank loop must match the old
    dense spelling (per-round O(V) left-outer densify, inlined from
    the r14 code) — exact on the public 6-decimal surface, within
    reduction-order noise on raw doubles."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        _truncate,
        personalized_pagerank,
    )
    from gsuites_gcp_graphdb_spark.plans.graph_queries import _graph

    g = _graph(spark, SF)
    users = g.vertices.filter(F.col("label") == "user")
    source = users.orderBy(F.col("email").asc()).limit(1).select("id")
    new = personalized_pagerank(g, source, iterations=3)

    # --- old dense spelling, inlined ---
    damping = 0.85
    v = g.vertices.select("id")
    s = source.select("id").dropDuplicates()
    n_s = s.count()
    ind = _truncate(
        v.join(
            s.select("id", F.lit(1.0 / n_s).alias("__ind")),
            ["id"],
            "left_outer",
        ).select("id", F.coalesce("__ind", F.lit(0.0)).alias("__ind"))
    )
    edges = g.edges.select("src", "dst")
    outd = edges.groupBy("src").agg(F.count("*").alias("out_degree"))
    edges_d = _truncate(
        edges.join(outd, ["src"]).select("src", "dst", "out_degree")
    )
    dangling_ids = _truncate(
        v.join(
            edges_d.select("src").dropDuplicates(),
            v.id == F.col("src"),
            "left_anti",
        )
    )
    ranks = _truncate(ind.select("id", F.col("__ind").alias("rank")))
    for _ in range(3):
        contribs = (
            ranks.join(edges_d, ranks.id == edges_d.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
        )
        d_row = ranks.join(dangling_ids, ["id"], "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        ranks = _truncate(
            ind.join(contribs, ["id"], "left_outer")
            .crossJoin(F.broadcast(d_row))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("__ind")
                    + F.lit(damping)
                    * (
                        F.coalesce("in_sum", F.lit(0.0))
                        + F.col("__dangling") * F.col("__ind")
                    )
                ).alias("rank"),
            )
        )
    new_rows = _rows(new)
    old_rows = _rows(ranks)
    assert len(new_rows) == len(old_rows)
    for (nid, nr), (oid, orr) in zip(new_rows, old_rows):
        assert nid == oid
        assert round(nr, 6) == round(orr, 6)
        assert abs(nr - orr) <= 1e-12 + 1e-9 * abs(orr)
        # unreached vertices must stay EXACT zero in both spellings
        if orr == 0.0:
            assert nr == 0.0


def test_hits_sparse_loop_matches_dense_spelling(spark):
    """The r15 sparse HITS loop must produce bit-identical scores to
    the old dense spelling (per-half-round O(V) left-outer densify),
    inlined here verbatim from the r14 code."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import (
        _truncate,
        hits,
    )
    from gsuites_gcp_graphdb_spark.plans.graph_queries import _graph

    g = _graph(spark, SF)
    new = hits(g, iterations=3)

    # --- old dense spelling, inlined ---
    v = g.vertices.select("id")
    edges = g.edges.filter(F.col("label") == "in")
    edges = _truncate(edges.select("src", "dst"))
    hub = _truncate(v.select("id", F.lit(1.0).alias("hub")))
    auth = v.select("id", F.lit(1.0).alias("auth"))
    for _ in range(3):
        raw_a = _truncate(
            hub.join(edges, hub.id == edges.src)
            .groupBy("dst")
            .agg(F.sum("hub").alias("__raw"))
        )
        ta = raw_a.agg(
            F.coalesce(F.sum("__raw"), F.lit(0.0)).alias("__tot")
        )
        auth = _truncate(
            v.join(raw_a, v.id == F.col("dst"), "left_outer")
            .crossJoin(F.broadcast(ta))
            .select(
                "id",
                (
                    F.coalesce("__raw", F.lit(0.0)) / F.col("__tot")
                ).alias("auth"),
            )
        )
        raw_h = _truncate(
            auth.join(edges, auth.id == edges.dst)
            .groupBy("src")
            .agg(F.sum("auth").alias("__raw"))
        )
        th = raw_h.agg(
            F.coalesce(F.sum("__raw"), F.lit(0.0)).alias("__tot")
        )
        hub = _truncate(
            v.join(raw_h, v.id == F.col("src"), "left_outer")
            .crossJoin(F.broadcast(th))
            .select(
                "id",
                (
                    F.coalesce("__raw", F.lit(0.0)) / F.col("__tot")
                ).alias("hub"),
            )
        )
    old = hub.join(auth, ["id"])
    new_rows = _rows(new)
    old_rows = _rows(old)
    assert len(new_rows) == len(old_rows)
    for (nid, nh, na), (oid, oh, oa) in zip(new_rows, old_rows):
        assert nid == oid
        # exact on the public 6-decimal surface...
        assert round(nh, 6) == round(oh, 6)
        assert round(na, 6) == round(oa, 6)
        # ...and within reduction-order noise on the raw doubles
        assert abs(nh - oh) <= 1e-12 + 1e-9 * abs(oh)
        assert abs(na - oa) <= 1e-12 + 1e-9 * abs(oa)


def test_schema_cache_matches_inference_and_invalidates(spark, tmp_path):
    """r15 guide-§6 rewrite: load_table memoizes the INFERRED schema
    per fixture file signature. Pins (a) the cached-schema read is
    schema-identical to a fresh inference for every fixture table,
    (b) a changed file signature re-infers instead of serving the
    stale schema."""
    import shutil

    from gsuites_gcp_graphdb_spark.sources import fixtures as fx

    for t in fx.TABLES:
        cached = fx.load_table(spark, SF, t)  # fills or hits the cache
        fresh = spark.read.parquet(f"{SF}/{t}.parquet")
        if t == "events":
            fresh = fx.normalize_events_ts(fresh)
        assert cached.schema == fresh.schema, t
        assert f"{SF}/{t}.parquet" in fx._SCHEMA_CACHE

    # invalidation: copy a table, load (seeds cache), rewrite the file
    # with a DIFFERENT schema — the next load must see the new schema
    d = tmp_path / "fixdir"
    d.mkdir()
    shutil.copy(f"{SF}/region.parquet", d / "region.parquet")
    first = fx.load_table(spark, str(d), "region")
    assert first.schema.fieldNames() == ["r_regionkey", "r_name"]
    spark.range(3).selectExpr(
        "cast(id as int) as r_regionkey", "'x' as extra"
    ).toPandas().to_parquet(str(d / "region.parquet"))
    second = fx.load_table(spark, str(d), "region")
    assert second.schema.fieldNames() == ["r_regionkey", "extra"]
