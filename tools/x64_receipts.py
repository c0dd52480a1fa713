"""r15 x64 scale receipts (VERDICT r14 item 8): paired A/B of the
three wave-kept structural claims at a 64-replica fixture —

- hits: r13 dense per-half-round densify (+ double E-join) vs the
  current sparse loop (r14 halving + r15 sparse rounds),
- bpe_train: per-round paired-relation checkpoint vs the unpersisted
  r13 spelling (the window+sort executed twice per round),
- flagship: explicit role-side broadcast vs planner-chosen join.

Each variant pair runs interleaved (A, B, A, B) in ONE session at the
x64 dir; prints one JSON line per claim. Build the fixture first:
  python tools/scalebench.py --replicas 64 --build-only  (or let this
  script build it into $X64_DIR, default /tmp/spark_graft_x64).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REPS = int(os.environ.get("X64_REPS", "3"))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def hits_dense(g, iterations=5):
    """The r13 spelling: dense per-half-round densify joins."""
    from gsuites_gcp_graphdb_spark.graph.algorithms import _truncate

    v = g.vertices.select("id")
    edges = _truncate(
        g.edges.filter(F.col("label") == "in").select("src", "dst")
    )
    hub = _truncate(v.select("id", F.lit(1.0).alias("hub")))
    auth = v.select("id", F.lit(1.0).alias("auth"))
    for _ in range(iterations):
        raw_a = _truncate(
            hub.join(edges, hub.id == edges.src)
            .groupBy("dst")
            .agg(F.sum("hub").alias("__raw"))
        )
        ta = raw_a.agg(
            F.coalesce(F.sum("__raw"), F.lit(0.0)).alias("__tot")
        )
        auth = _truncate(
            v.join(raw_a, v.id == F.col("dst"), "left_outer")
            .crossJoin(F.broadcast(ta))
            .select(
                "id",
                (
                    F.coalesce("__raw", F.lit(0.0)) / F.col("__tot")
                ).alias("auth"),
            )
        )
        raw_h = _truncate(
            auth.join(edges, auth.id == edges.dst)
            .groupBy("src")
            .agg(F.sum("auth").alias("__raw"))
        )
        th = raw_h.agg(
            F.coalesce(F.sum("__raw"), F.lit(0.0)).alias("__tot")
        )
        hub = _truncate(
            v.join(raw_h, v.id == F.col("src"), "left_outer")
            .crossJoin(F.broadcast(th))
            .select(
                "id",
                (
                    F.coalesce("__raw", F.lit(0.0)) / F.col("__tot")
                ).alias("hub"),
            )
        )
    return hub.join(auth, ["id"])


def bpe_train_nockpt(df, rounds=8, text_col="text"):
    """The r13 spelling: `paired` left lazy (window+sort 2x/round)."""
    words = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    state = words.select(
        "w",
        "freq",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            )
        ).alias("pos", "tok"),
    ).localCheckpoint(eager=True)
    wspec = Window.partitionBy("w").orderBy("pos")
    merges = []
    for r in range(1, rounds + 1):
        paired = state.withColumn("nxt", F.lead("tok").over(wspec))
        best = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy("tok", "nxt")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "tok", "nxt")
            .limit(1)
            .first()
        )
        if best is None:
            break
        a, b, n = best["tok"], best["nxt"], int(best["n"])
        merges.append((r, a, b, a + b, n))
        cand = (F.col("tok") == F.lit(a)) & (F.col("nxt") == F.lit(b))
        if a != b:
            marked = paired.withColumn("start", cand)
        else:
            cum_a = F.sum(
                F.when(F.col("tok") == F.lit(a), 1).otherwise(0)
            ).over(wspec.rowsBetween(Window.unboundedPreceding, 0))
            isl = F.when(
                F.col("tok") == F.lit(a), F.col("pos") - cum_a
            ).otherwise(-F.col("pos") - 1)
            with_isl = paired.withColumn("isl", isl)
            rk = F.row_number().over(
                Window.partitionBy("w", "isl").orderBy("pos")
            )
            marked = with_isl.withColumn(
                "start", cand & (rk % 2 == 1)
            ).drop("isl")
        consumed = F.coalesce(F.lag("start").over(wspec), F.lit(False))
        rebuilt = (
            marked.withColumn("consumed", consumed)
            .filter(~F.col("consumed"))
            .select(
                "w",
                "freq",
                "pos",
                F.when(F.col("start"), F.lit(a + b))
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .withColumn(
                "pos",
                F.row_number().over(Window.partitionBy("w").orderBy("pos")),
            )
        )
        state = rebuilt.localCheckpoint(eager=True)
    return merges


def flagship_nohint(g):
    """The r13 spelling: planner-chosen join for the role side."""
    projects = g.V().hasLabel("project").toDF()
    target = projects.agg(F.min("projectid").alias("projectid"))
    project_v = projects.join(target, ["projectid"], "left_semi").select(
        "id", "projectid"
    )
    e = g.edges.select("src", "dst")
    role_edge = e.join(project_v, e.dst == project_v.id).select(
        F.col("src").alias("role_id"), "projectid"
    )
    roles = g.vertices.filter(F.col("label") == "role").select(
        F.col("id").alias("role_id"), F.col("name").alias("role")
    )
    role_on_p = role_edge.join(roles, ["role_id"])
    user_edge = e.join(role_on_p, e.dst == role_on_p.role_id).select(
        F.col("src").alias("user_id"), "role", "projectid"
    )
    users = g.vertices.filter(F.col("label") == "user").select(
        F.col("id").alias("user_id"), "email"
    )
    return (
        user_edge.join(users, ["user_id"])
        .select("email", "role", "projectid")
        .dropDuplicates()
        .orderBy("email", "role")
    )


def main() -> None:
    from gsuites_gcp_graphdb_spark.graph.algorithms import hits
    from gsuites_gcp_graphdb_spark.operators.text import bpe_train
    from gsuites_gcp_graphdb_spark.plans import graph_queries as gq
    from gsuites_gcp_graphdb_spark.session import get_spark
    from gsuites_gcp_graphdb_spark.sources.fixtures import load_table
    from tools.scalebench import build_scaled

    x64 = os.environ.get("X64_DIR", "/tmp/spark_graft_x64")
    spark = get_spark("x64-receipts")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{x64}/lineitem.parquet"):
        print("building x64 fixture...", file=sys.stderr)
        build_scaled(spark, x64, 64)

    g = gq._graph(spark, x64)
    g.counts()  # build+cache the graph off the timed path
    docs = load_table(spark, x64, "documents")

    claims = {
        "hits_sparse_vs_dense": (
            lambda: hits(g, iterations=5).count(),
            lambda: hits_dense(g, iterations=5).count(),
        ),
        "bpe_ckpt_vs_nockpt": (
            lambda: bpe_train(docs, rounds=8),
            lambda: bpe_train_nockpt(docs, rounds=8),
        ),
        "flagship_hint_vs_nohint": (
            lambda: gq.principals_with_access_g(g).collect(),
            lambda: flagship_nohint(g).collect(),
        ),
    }
    only = sys.argv[1:] or list(claims)
    for name in only:
        new_fn, old_fn = claims[name]
        new_s, old_s = [], []
        for _ in range(REPS):
            new_s.append(_timed(new_fn))
            old_s.append(_timed(old_fn))
        print(
            json.dumps(
                {
                    "claim": name,
                    "new": new_s,
                    "old": old_s,
                    "new_median": round(statistics.median(new_s), 3),
                    "old_median": round(statistics.median(old_s), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
