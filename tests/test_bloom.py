"""Bloom-filter join pruning (operators/bloom.py): the no-false-
negative guarantee, the FP-rate sanity band, the map-side plan shape,
and the exact-join equivalence the catalog oracle relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.operators import bloom as bl


def test_bloom_no_false_negatives_and_fp_band(spark):
    dim = spark.range(0, 500).select(
        (F.col("id") * 7 + 3).alias("k")
    )  # 500 keys
    fact = spark.range(0, 20_000).select(F.col("id").alias("k"))
    bf = bl.bloom_build(dim, "k")
    pruned = bl.bloom_prune(fact, bf, "k")
    kept = {r.k for r in pruned.collect()}
    true_keys = {r.k for r in dim.collect()}
    fact_keys = {r.k for r in fact.collect()}
    # every true match survives
    assert (true_keys & fact_keys) <= kept
    # FP rate: at m=2^18, n=500*3 set bits, h=3 the theoretical rate
    # is ~2e-7; allow a generous 1e-3 band
    fps = kept - true_keys
    assert len(fps) <= max(20, int(1e-3 * len(fact_keys))), len(fps)


def test_bloom_prejoin_equals_plain_join(spark):
    dim = spark.range(0, 200).select(
        (F.col("id") * 11).alias("dk"), F.lit("d").alias("tag")
    )
    fact = spark.range(0, 5_000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("v")
    )
    got = sorted(
        map(
            tuple,
            bl.bloom_prejoin(fact, dim, "fk", "dk")
            .select("fk", "v", "dk", "tag")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            fact.join(dim, fact.fk == dim.dk)
            .select("fk", "v", "dk", "tag")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_bloom_prune_is_map_side(spark):
    """The probe must not shuffle the fact side: h broadcast joins
    only — no Exchange hashpartitioning anywhere in the prune plan."""
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    fact = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bf = bl.bloom_build(dim, "k")
    plan = (
        bl.bloom_prune(fact, bf, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only hash exchanges allowed are the bloom BUILD's tiny
    # word_idx aggregations (dim side); the fact side never shuffles
    import re

    for m in re.finditer(r"Exchange hashpartitioning\((\w+)", plan):
        assert m.group(1).startswith("word_idx"), plan


def test_bloom_empty_dim_rejects_all(spark):
    dim = spark.range(0).select(F.col("id").alias("k"))
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    bf = bl.bloom_build(dim, "k")
    assert bl.bloom_prune(fact, bf, "k").count() == 0
