"""Round-8 drift probe (VERDICT r7 item 2): time g_hits_top and
g_connected_components_star in ISOLATION — fresh session, 5 reps,
same box — to split environment drift from code drift and from
suite-position effects (checkpoint-dir pressure late in the 66-query
headline run). Run it on HEAD and on the r6 commit; compare medians
against the BENCH_DETAIL spreads of both rounds.

Usage: python tools/drift_probe.py [names...]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from gsuites_gcp_graphdb_spark.session import get_spark  # noqa: E402
from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG  # noqa: E402
from gsuites_gcp_graphdb_spark.sources.fixtures import (  # noqa: E402
    load_table,
)

REPS = 5
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    names = sys.argv[1:] or [
        "g_hits_top",
        "g_connected_components_star",
    ]
    spark = get_spark("drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    load_table(spark, SF_DIR, "region").count()
    # Bench-only scale-path entries (the *_fast family + ns_ivf_ann)
    # live in bench.py's registry, not the catalog (r8 VERDICT item
    # 3) — resolve names against BOTH. fast_registry wins on a name
    # collision: COMMON66 names refer to what bench.py TIMES under
    # that key, and r9's catalog re-entry 'ns_ivf_ann' (invariant
    # census) would otherwise shadow the raw ivf_ann probe the frozen
    # metric was pinned to (r9 ADVICE).
    import bench

    fast = bench.fast_registry(spark, SF_DIR)
    from gsuites_gcp_graphdb_spark.operators import dedup as dd

    out = {}
    for name in names:
        if name in fast:
            action = fast[name]
        elif name == "g_bucketed_layout_write":
            # Bench-inline write-heavy entry (r13 drift controls):
            # replicate bench.py's exact state — a FIXTURE-built
            # cached graph, store absent — then time only the
            # materialize (the write). The reset must drop the store
            # tables and the cache BEFORE rebuilding: a store-backed
            # cached graph would otherwise overwrite the very files
            # it reads from (FAILED_READ_FILE).
            from gsuites_gcp_graphdb_spark.plans import (
                graph_queries as gq,
            )

            def setup(gq=gq):
                prefix = gq.graph_store_prefix(SF_DIR)
                for sfx in ("vertices", "edges", "edges_by_dst"):
                    spark.sql(
                        f"DROP TABLE IF EXISTS {prefix}_{sfx}"
                    )
                gq._GRAPH_CACHE.pop(
                    (id(spark.sparkContext), SF_DIR), None
                )
                gq._graph(spark, SF_DIR).counts()

            action = (
                setup,
                lambda gq=gq: gq.materialize_graph_store(
                    spark, SF_DIR
                ),
            )
        elif name == "g_flagship_bucketed":
            # Bench-inline entry: flagship traversal over the
            # materialized bucketed store (bench.py's preamble builds
            # the store off the timed path; mirror that here).
            from gsuites_gcp_graphdb_spark.plans import (
                graph_queries as gq,
            )

            gq.materialize_graph_store(spark, SF_DIR)
            gb = gq._graph(spark, SF_DIR)
            action = lambda gb=gb: gq.principals_with_access_g(
                gb
            ).collect()
        else:
            fn = CATALOG[name].fn
            action = lambda fn=fn: fn(spark, SF_DIR).collect()
        setup_fn, timed_fn = (
            action if isinstance(action, tuple) else (None, action)
        )
        reps = []
        for _ in range(REPS):
            dd.release_scratch()
            if setup_fn is not None:
                setup_fn()
            t0 = time.perf_counter()
            timed_fn()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": round(statistics.median(reps), 3),
            "reps": reps,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
