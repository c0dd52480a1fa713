"""Meta-tests on the driver contract: catalog integrity and the
__spark_entry__ surface shape."""

from __future__ import annotations

import inspect
import re
import sys

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
            re.findall(
                    r"([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([^)]*\))?"
                    r"\s+AS\s*(?:(?:NOT\s+)?MATERIALIZED\s*)?\(",
                    qd.sql,
                )
        )
        # `x IS [NOT] DISTINCT FROM y` is an operator, not a table
        # reference — strip it before scanning for FROM/JOIN targets.
        scannable = re.sub(
            r"IS\s+(?:NOT\s+)?DISTINCT\s+FROM", "IS_DISTINCT_OP",
            qd.sql, flags=re.I,
        )
        for _kw, table in ident.findall(scannable):
            assert (
                table.lower() in known
                or table in ctes
                or table in ("(",)
            ), f"{name}: unknown relation {table!r}"


def test_rows_only_queries_are_the_documented_set():
    # Every catalog query carries an oracle: engine-specific operators
    # (xxhash64 simhash, trained-quantizer IVF, HLL, GK sketches)
    # participate via bounds-style oracles or oracle-checked siblings,
    # and their raw-output demos live in bench.py, not the catalog —
    # so the driver's CORRECTNESS file carries no standing err rows.
    rows_only = {n for n, qd in CATALOG.items() if qd.sql is None}
    assert rows_only == set()


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["email", "role", "projectid"]


def test_catalog_output_dtypes_are_driver_safe(spark):
    """No catalog query may emit a driver-fragile output dtype
    (r10 VERDICT item 2). The external driver normalizes results in
    pandas; a DecimalType column holding ~2^61 values float64
    round-trips into a DIFFERENT integer on one engine only —
    exactly how `rel_ivm_join` shipped red in round 10 while every
    repo-side receipt was green. Gate the whole class: every Spark
    output field must be a scalar from the int64-or-narrower /
    float / string / bool / date / timestamp set, and every DuckDB
    oracle's DESCRIBE must bind to types free of DECIMAL/HUGEINT.
    Runs over the 0-row fixture so iterative builders converge
    instantly; schemas are scale-independent."""
    import duckdb
    from pyspark.sql import types as T

    sys.path.insert(0, "/root/repo/tools")
    from selfcheck import build_empty_fixture

    empty_dir = "/tmp/spark_graft_empty_fixture"
    build_empty_fixture(spark, empty_dir)

    allowed = (
        T.LongType, T.IntegerType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType, T.StringType, T.BooleanType,
        T.DateType, T.TimestampType, T.TimestampNTZType,
    )
    bad_spark = []
    for name, qd in CATALOG.items():
        df = qd.fn(spark, empty_dir)
        for f in df.schema.fields:
            if not isinstance(f.dataType, allowed):
                bad_spark.append(f"{name}.{f.name}: {f.dataType}")
    assert not bad_spark, f"driver-fragile Spark dtypes: {bad_spark}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet'"
        )
    bad_duck = []
    for name, qd in CATALOG.items():
        if qd.sql is None:
            continue
        desc = con.execute(f"DESCRIBE {qd.sql}").fetchall()
        for col, typ, *_ in desc:
            if "DECIMAL" in typ.upper() or "HUGEINT" in typ.upper():
                bad_duck.append(f"{name}.{col}: {typ}")
    assert not bad_duck, f"driver-fragile oracle dtypes: {bad_duck}"


def test_coverage_md_names_resolve():
    """Every backticked query name in COVERAGE.md resolves in the
    catalog (the round-5 verdict caught two stale names; this pins
    the doc to the code so it can't rot again). Bench-timed-only
    entries are written `bench:<name>` and must instead appear in
    bench.py."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    md = open(os.path.join(root, "COVERAGE.md")).read()
    plain = set(re.findall(r"`((?:g|ns|rel|etl)_[a-z0-9_]+)`", md))
    missing = sorted(plain - set(CATALOG))
    assert not missing, f"COVERAGE.md names not in catalog: {missing}"
    bench_src = open(os.path.join(root, "bench.py")).read()
    bench_only = set(re.findall(r"`bench:([a-z0-9_]+)`", md))
    stale = sorted(n for n in bench_only if f'"{n}"' not in bench_src)
    assert not stale, f"COVERAGE.md bench-only names not in bench.py: {stale}"
