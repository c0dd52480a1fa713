"""Vector math over array<float> embedding columns — built-in
higher-order functions only (zip_with/aggregate run in the JVM; no
Python round-trip, no UDF).

Fold order is strictly left-to-right with a 0.0 double seed; the
DuckDB oracle twin folds the same way, so cosine scores are
bit-identical across engines (IEEE doubles, same operand order):

  list_reduce(list_transform(range(1, len(a)+1),
              i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)),
              (x, y) -> x + y)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(u: Column, v: Column) -> Column:
    prods = F.zip_with(
        u, v, lambda a, b: a.cast("double") * b.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(u: Column) -> Column:
    return F.sqrt(dot(u, u))


def cosine_similarity(u: Column, v: Column) -> Column:
    return dot(u, v) / (l2_norm(u) * l2_norm(v))


def hyperplane_sketch(u: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH sketch: bit b = sign(u . plane_b), packed
    into a BIGINT. Vectors with equal sketches are cosine-similar
    candidates — the bucketed ANN path: group/join on the sketch
    instead of an all-pairs cross join (O(n) shuffles vs O(n^2)).
    Planes must be generated deterministically by the caller."""
    bits = [
        F.when(
            dot(u, F.array(*[F.lit(float(x)) for x in p])) > 0, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        * F.lit(1 << i).cast("long")
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
