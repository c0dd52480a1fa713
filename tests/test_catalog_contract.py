"""Meta-tests on the driver contract: catalog integrity and the
__spark_entry__ surface shape."""

from __future__ import annotations

import inspect
import re

import __spark_entry__ as entrymod
from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG
from gsuites_gcp_graphdb_spark.sources.fixtures import TABLES


def test_entry_module_surface():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 50
    assert set(o) <= set(q)
    for fn in q.values():
        assert len(inspect.signature(fn).parameters) == 2


def test_oracles_reference_only_known_views():
    ident = re.compile(r"\b(FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)", re.I)
    known = set(TABLES)
    for name, qd in CATALOG.items():
        if qd.sql is None:
            continue
        ctes = set(
            re.findall(r"([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(", qd.sql)
        )
        for _kw, table in ident.findall(qd.sql):
            assert (
                table.lower() in known
                or table in ctes
                or table in ("(",)
            ), f"{name}: unknown relation {table!r}"


def test_rows_only_queries_are_the_documented_set():
    rows_only = {n for n, qd in CATALOG.items() if qd.sql is None}
    # xxhash64 and float-mean k-means are engine-specific by nature;
    # each is anchored by a unit test instead of an oracle. (HLL approx
    # counts graduated to a bounds-style oracle: exact counts + a
    # within-tolerance boolean both engines can agree on.)
    assert rows_only == {
        "ns_dedup_simhash",
        "ns_ivf_ann",
    }


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["email", "role", "projectid"]
