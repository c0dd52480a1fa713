"""Tests for the derived-partsupp relation and its four TPC-H-shaped
queries (Q2/Q9/Q11/Q20 adapted to the fixture — plans/partsupp_queries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.plans import partsupp_queries as psq
from gsuites_gcp_graphdb_spark.sources.fixtures import load_table


def test_derive_partsupp_key_unique_and_deterministic(spark, sf_dir):
    ps = psq.derive_partsupp(spark, sf_dir)
    total = ps.count()
    distinct_keys = ps.select("ps_partkey", "ps_suppkey").distinct().count()
    assert total == distinct_keys > 0
    # attributes are pure functions of the key: re-deriving yields the
    # identical relation (exceptAll both ways is empty)
    again = psq.derive_partsupp(spark, sf_dir)
    assert ps.exceptAll(again).isEmpty()
    assert again.exceptAll(ps).isEmpty()


def test_derive_partsupp_covers_lineitem_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    ps = psq.derive_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey"
    )
    assert li.join(ps, ["ps_partkey", "ps_suppkey"], "anti").isEmpty()


def test_derive_partsupp_attribute_ranges(spark, sf_dir):
    ps = psq.derive_partsupp(spark, sf_dir)
    bad = ps.filter(
        (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost_cents") < 100)
        | (F.col("ps_supplycost_cents") >= 100100)
    )
    assert bad.isEmpty()


def test_min_cost_supplier_is_min_per_part(spark, sf_dir):
    out = psq.min_cost_supplier(spark, sf_dir)
    assert out.columns == [
        "partkey",
        "part_name",
        "supplier",
        "supplycost_cents",
    ]
    rows = out.collect()
    assert rows
    # per partkey all reported costs equal the partkey's minimum
    by_part = {}
    for r in rows:
        by_part.setdefault(r.partkey, set()).add(r.supplycost_cents)
    for costs in by_part.values():
        assert len(costs) == 1


def test_important_stock_threshold(spark, sf_dir):
    # Recompute the scoped per-part values and total independently,
    # then check important_stock returns exactly the parts whose value
    # clears the 1/10000 threshold (may be zero parts at tiny SF).
    ps = psq.derive_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    min_nk = nation.agg(F.min("n_nationkey")).collect()[0][0]
    keep = {
        r.s_suppkey
        for r in supp.filter(F.col("s_nationkey") == min_nk).collect()
    }
    vals = {}
    for r in ps.collect():
        if r.ps_suppkey in keep:
            vals[r.ps_partkey] = vals.get(r.ps_partkey, 0) + (
                r.ps_supplycost_cents * r.ps_availqty
            )
    total = sum(vals.values())
    expected = {
        pk: v for pk, v in vals.items() if v * 10000 > total
    }
    got = {
        r.partkey: r.value_cents
        for r in psq.important_stock(spark, sf_dir).collect()
    }
    assert got == expected


def test_partsupp_entries_registered():
    from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG

    for name in (
        "rel_min_cost_supplier",
        "rel_profit_by_nation_year",
        "rel_important_stock",
        "rel_excess_availability",
    ):
        assert name in CATALOG
        assert CATALOG[name].sql is not None
