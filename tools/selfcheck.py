"""Local stand-in for the driver's t2 correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB over
the same fixture dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows hashed as
normalized tuples).

Usage: python tools/selfcheck.py [sf_dir] [query ...] [--empty]

--empty (round-8, VERDICT r7 item 7): run the sweep against a
synthesized 0-ROW fixture dir (same schemas as sf0.001, no rows) —
the regression gate for the NULL-on-empty-aggregate bug class that
recurred three rounds running (audit_metrics r6, members_consistent
r7, cycle_census's empty-DAG path). Both engines must agree on every
query over nothing.
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    import datetime

    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), normalize_cell(x)) for k, x in v.items())
        return "m:{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    return "s:" + str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    row_hashes = sorted(
        hashlib.md5(
            "|".join(normalize_cell(r[i]) for i in order).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(row_hashes).encode()).hexdigest()


def build_empty_fixture(spark, out_dir: str) -> None:
    """Write 0-row copies of every fixture table (schemas inherited
    from sf0.001) — single parquet FILES via pyarrow, matching the
    real fixtures' layout so DuckDB's view glob works; idempotent via
    a marker file."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from gsuites_gcp_graphdb_spark.sources.fixtures import TABLES

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(
            schema.empty_table(), f"{out_dir}/{t}.parquet"
        )
    open(marker, "w").close()


def main():
    args = [a for a in sys.argv[1:]]
    empty = "--empty" in args
    args = [a for a in args if a != "--empty"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]

    import duckdb

    from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG
    from gsuites_gcp_graphdb_spark.session import get_spark
    from gsuites_gcp_graphdb_spark.sources.fixtures import TABLES

    spark = get_spark("selfcheck")
    if empty:
        sf_dir = "/tmp/spark_graft_empty_fixture"
        build_empty_fixture(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    todo = names or list(CATALOG)
    failures = 0
    for name in todo:
        qd = CATALOG[name]
        try:
            sdf = qd.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if qd.sql is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows)")
            continue
        # The driver canonicalizes results in pandas (sort_values over
        # every column), which raises on list/map/struct cells — an
        # oracle-checked query must emit only scalar columns.
        from pyspark.sql import types as T

        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            print(
                f"FAIL {name}: driver-incompatible complex columns "
                f"{complex_cols} (flatten to string for comparison)"
            )
            failures += 1
            continue
        try:
            cur = con.execute(qd.sql)
            dcols = [d[0] for d in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            hs = table_hash(scols, srows)
            hd = table_hash(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                sset = {
                    tuple(normalize_cell(c) for c in r) for r in srows
                }
                dset = {
                    tuple(normalize_cell(c) for c in r) for r in drows
                }
                so = list(sset - dset)[:3]
                do = list(dset - sset)[:3]
                problems.append(f"spark-only={so} duck-only={do}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(todo) - failures}/{len(todo)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
