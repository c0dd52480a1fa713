"""Scale-step benchmark: measure how the headline queries scale one
step UP from the largest driver fixture.

No sf1 fixture exists (TESTDATA.md stops at sf0.1 and is read-only),
so this tool synthesizes a ~4x scale step in /tmp by replicating the
sf0.1 FACT tables with disjoint key spaces while keeping the dimension
tables fixed — the realistic big-data profile (facts grow, dims
don't). Key handling per table:

- customer/orders/lineitem/part/supplier: integer keys offset by
  replica * 10^9 so joins stay consistent within a replica and never
  collide across replicas; natural-key strings (c_name, s_name,
  p_name, p_brand) get a '#k' suffix so the derived graph grows too.
- region/nation: kept single-copy (dimensions).
- events: event_id/user_id offset (more users, same time range ->
  denser windows, more sessions — the scale profile of a busier
  stream, ts untouched).
- documents: doc_id offset, text suffixed with a replica token (docs
  across replicas become NEAR-duplicates — exercising dedup at scale
  rather than degenerating it into exact clones).
- embeddings: vec_id offset, vectors unchanged (ANN bucket occupancy
  grows 4x).

Then the bench HEADLINE suite runs at sf0.1 and at the scaled dir and
prints per-query (t_small, t_big, ratio) JSON. Row volume grows ~4x,
so a query scaling linearly should show ratio ~<=4 (less where the
cost is dominated by fixed-size dims or setup); anything well above
the row ratio is flagged superlinear.

Usage: python tools/scalebench.py [--replicas 4] [--out SCALING.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OFF = 1_000_000_000
BASE = "/root/testdata/sf0.1"

FACT_KEYS = {
    "customer": (["c_custkey"], ["c_name"]),
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "part": (["p_partkey"], ["p_name", "p_brand"]),
    "supplier": (["s_suppkey"], ["s_name"]),
    "events": (["event_id", "user_id"], []),
    "documents": (["doc_id"], []),
    "embeddings": (["vec_id"], []),
}
DIMS = ("region", "nation")


def build_scaled(
    spark, out_dir: str, replicas: int, hub: bool = False
) -> None:
    from pyspark.sql import functions as F

    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        load_table(spark, BASE, t).write.parquet(
            f"{out_dir}/{t}.parquet", mode="overwrite"
        )
    for t, (int_keys, str_keys) in FACT_KEYS.items():
        if hub and t == "part":
            # HUB-HEAVY mode: keep p_brand (the role natural key)
            # IDENTICAL across replicas, so every replica's users all
            # join the SAME ~25 hot roles — per-role membership grows
            # `replicas`x instead of the role space growing. This is
            # the profile the salted skew join exists for; the default
            # suffixing grows the key space and keeps per-key skew
            # constant, which AQE handles without salting.
            str_keys = [c for c in str_keys if c != "p_brand"]
        df = load_table(spark, BASE, t)
        parts = []
        for k in range(replicas):
            rep = df
            for c in int_keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(k * OFF))
            for c in str_keys:
                rep = rep.withColumn(
                    c,
                    F.concat(F.col(c), F.lit(f"#{k}")) if k else F.col(c),
                )
            if t == "documents":
                rep = rep.withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" rep{k}"))
                    if k
                    else F.col("text"),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.parquet(f"{out_dir}/{t}.parquet", mode="overwrite")


def time_suite(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    import gsuites_gcp_graphdb_spark.plans.graph_queries as gq
    from gsuites_gcp_graphdb_spark.operators import dedup as dd
    from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    g = gq._graph(spark, sf_dir)
    g.counts()
    timings["graph_build"] = round(time.perf_counter() - t0, 3)
    for name in names:
        dd.release_scratch()
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    replicas = 4
    out_md = None
    only = None
    append = False
    args = sys.argv[1:]
    if "--replicas" in args:
        replicas = int(args[args.index("--replicas") + 1])
    if "--out" in args:
        out_md = args[args.index("--out") + 1]
    if "--names" in args:
        only = args[args.index("--names") + 1].split(",")
    if "--append" in args:
        append = True
    hub = "--hub" in args

    from gsuites_gcp_graphdb_spark.session import get_spark

    # scale-sensitive subset of bench.HEADLINE (sub-100ms entries are
    # noise at this granularity and excluded)
    names = [
        "g_principals_with_access",
        "g_reachable_from_user",
        "g_connected_components",
        "g_connected_components_star",
        "g_triangle_count",
        "g_top_roles",
        "g_skew_membership_plain",
        "g_skew_membership_salted",
        "rel_pricing_summary",
        "rel_top_order_per_customer",
        "ns_dedup_exact",
        "ns_dedup_minhash_lsh",
        "ns_dedup_ngram_jaccard",
        "ns_dedup_clusters",
        "ns_topk_cosine",
        "ns_events_tumbling",
        "ns_events_sessions",
        "ns_events_asof_join",
        # round-4 operators
        "ns_pipeline_e2e",
        "ns_dedup_incremental",
        "ns_text_repetition",
        "g_label_propagation",
        # round-5 operators (ns_semantic_dedup is excluded: the
        # catalog entry is the deliberately-quadratic exact anchor;
        # its scale path is benched as ns_semantic_dedup_fast)
        "g_weighted_distances",
        "ns_media_features",
    ]

    if only:
        # --names may name ANY catalog query, not just the default
        # subset — unknown names fail loudly rather than silently
        # shrinking the run.
        from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG

        unknown = [n for n in only if n not in CATALOG]
        assert not unknown, f"--names not in catalog: {unknown}"
        names = list(only)
    spark = get_spark("scalebench")
    spark.sparkContext.setLogLevel("ERROR")
    suffix = "_hub" if hub else ""
    scaled_dir = f"/tmp/spark_graft_scaled_x{replicas}{suffix}"
    marker = os.path.join(scaled_dir, "_DONE")
    if not os.path.exists(marker):
        build_scaled(spark, scaled_dir, replicas, hub=hub)
        open(marker, "w").close()

    small = time_suite(spark, BASE, names)
    big = time_suite(spark, scaled_dir, names)
    report = {
        "replicas": replicas,
        "row_ratio": replicas,
        "queries": {
            n: {
                "sf0.1_s": small[n],
                "scaled_s": big[n],
                "ratio": round(big[n] / small[n], 2) if small[n] else None,
            }
            for n in small
        },
    }
    print(json.dumps(report))
    if out_md:
        if append:
            lines = [
                "",
                "## x%d step (--names subset)%s"
                % (replicas, " — HUB-HEAVY" if hub else ""),
                "",
                "| query | sf0.1 (s) | x%d (s) | ratio |" % replicas,
                "| --- | --- | --- | --- |",
            ]
        else:
            lines = [
                "# SCALING — one scale step up (synthesized, facts x%d)" % replicas,
                "",
                "Generated by tools/scalebench.py: sf0.1 fact tables",
                "replicated %dx with disjoint key spaces (dims fixed, see" % replicas,
                "the tool docstring), headline subset timed at both scales.",
                "Row volume grows ~%dx; ratio <= ~%d means at-worst-linear" % (replicas, replicas),
                "scaling. Sub-second small-side entries carry ~30% noise;",
                "near-1.0 ratios mean the query is overhead-dominated at",
                "this absolute size (headroom), not that work was skipped.",
                "",
                "| query | sf0.1 (s) | x%d (s) | ratio |" % replicas,
                "| --- | --- | --- | --- |",
            ]
        for n, r in report["queries"].items():
            lines.append(
                f"| {n} | {r['sf0.1_s']} | {r['scaled_s']} | {r['ratio']} |"
            )
        with open(out_md, "a" if append else "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
