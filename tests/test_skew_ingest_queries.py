"""Round-4 additions: the skew-join proof pair and the streaming
ingest end-to-end query must all agree with the plain batch
members-per-role derivation (they share one oracle)."""

from __future__ import annotations

from gsuites_gcp_graphdb_spark.plans import graph_queries as gq


def _rows(df):
    return sorted((r.role, r.n_members) for r in df.collect())


def test_salted_equals_plain(spark, sf_dir):
    assert _rows(gq.skew_membership_salted(spark, sf_dir)) == _rows(
        gq.skew_membership_plain(spark, sf_dir)
    )


def test_ingest_e2e_equals_batch(spark, sf_dir):
    assert _rows(gq.stream_ingest_e2e(spark, sf_dir)) == _rows(
        gq.skew_membership_plain(spark, sf_dir)
    )
