"""Capture .explain("formatted") for named catalog queries into
plans/r14/<name>_{before,after}.txt — the optimization-round evidence
trail (guide §1: capture the plan shape before and after each change).

Usage: python tools/plan_capture.py before|after name [name ...]
       python tools/plan_capture.py before|after @bench-top   (preset)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

OUT_DIR = os.environ.get("PLAN_OUT_DIR", "/root/repo/plans/r15")

PRESETS = {
    # the suite entries this round targets, by r13 BENCH_DETAIL cost
    "@bench-top": [
        "g_principals_with_access",
        "ns_split_leakage_safe",
        "ns_dedup_ngram_jaccard",
        "ns_dedup_minhash_calibration",
        "ns_dedup_clusters",
        "ns_dedup_minhash_lsh",
        "ns_dedup_incremental",
        "g_hits_top",
        "g_weighted_distances",
        "g_clustering_coefficient",
        "g_triangle_count",
        "g_community_quality",
        "ns_text_ngram_novelty",
        "ns_text_bpe_train",
        "ns_vec_pca_centered",
        "g_role_redundancy",
    ],
}


def main() -> None:
    phase = sys.argv[1]
    assert phase in ("before", "after"), phase
    names: list[str] = []
    for a in sys.argv[2:]:
        names.extend(PRESETS[a] if a.startswith("@") else [a])

    from gsuites_gcp_graphdb_spark.plans.catalog import CATALOG
    from gsuites_gcp_graphdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = os.path.join(OUT_DIR, f"{name}_{phase}.txt")
        with open(out, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(
            f"{name}: {len(txt)} chars, Exchange x{n_ex}, "
            f"SMJ x{txt.count('SortMergeJoin')}, "
            f"BHJ x{txt.count('BroadcastHashJoin')} -> {out}",
            flush=True,
        )


if __name__ == "__main__":
    main()
