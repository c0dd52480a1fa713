"""Isolated bench-replica timing for the saved-index serving path
(bench.py's ns_knn_index_save / ns_knn_probe_serve entries): build the
NN-Descent graph once OFF the timed path, knn_save once, then time
knn_probe REPS times — the A/B instrument for knn_probe optimizations
(run it on two trees in alternation; compare medians, guide §1).

Usage: python tools/knn_serve_probe.py [reps]
Prints one JSON line {"knn_probe_serve": [...], "median": ...}.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    """With KNN_AB_DIR set, the saved index is built once into that
    directory and REUSED by later invocations (the build path —
    nn_descent/knn_save — is identical on both A/B trees, so sharing
    it removes the biggest per-run noise source and each run times
    ONLY knn_probe)."""
    import os

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import pyspark.sql.functions as F

    from gsuites_gcp_graphdb_spark.operators import knngraph as kg
    from gsuites_gcp_graphdb_spark.session import get_spark
    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table

    spark = get_spark("knn-serve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg(F.sum("id")).collect()

    emb_t = load_table(spark, SF_DIR, "embeddings")
    knn_dir = os.environ.get("KNN_AB_DIR")
    ephemeral = knn_dir is None
    if ephemeral:
        knn_dir = tempfile.mkdtemp(prefix="spark_graft_knn_ab_")
    if not os.path.isdir(f"{knn_dir}/idx/meta"):
        knn_g = kg.nn_descent(emb_t, k=10, rounds=3, arrow=True)[-1]
        knn_g = knn_g.localCheckpoint()
        knn_links = kg.permutation_init(
            kg._normalize(emb_t, "vec_id", "embedding"), 10
        ).localCheckpoint()
        kg.knn_save(
            knn_g, emb_t, f"{knn_dir}/idx", n_parts=16,
            max_entries=64, long_links=knn_links,
        )
    knn_q = (
        emb_t.where(F.col("vec_id") % 20 == 0)
        .select(F.col("vec_id").cast("bigint").alias("a"))
        .localCheckpoint()
    )
    # untimed warmup probe: parquet footer caches, Arrow worker spin-up
    kg.knn_probe(
        spark, f"{knn_dir}/idx", knn_q, beam=16, hops=6,
        n_entries=4, arrow=True,
    ).collect()
    samples = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription("ns_knn_probe_serve[ab]")
        t0 = time.perf_counter()
        kg.knn_probe(
            spark, f"{knn_dir}/idx", knn_q, beam=16, hops=6,
            n_entries=4, arrow=True,
        ).collect()
        samples.append(round(time.perf_counter() - t0, 3))
    if ephemeral:
        import shutil

        shutil.rmtree(knn_dir, ignore_errors=True)
    print(json.dumps({
        "knn_probe_serve": samples,
        "median": round(statistics.median(samples), 3),
    }))


if __name__ == "__main__":
    main()
