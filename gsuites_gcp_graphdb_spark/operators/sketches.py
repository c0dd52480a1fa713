"""Count-min sketch: mergeable frequency summaries for heavy-hitter
queries over unbounded key cardinality (Cormode & Muthukrishnan 2005).

The exact top-k path (operators/text.top_ngrams) needs a full
(key -> count) hash aggregate — fine while the key space fits a
shuffle, the wrong shape when it doesn't (e.g. all n-grams of a
100 TB corpus). The sketch caps state at depth x width counters
REGARDLESS of cardinality, counters are map-side-combinable (a CMS is
a sum over rows, so partial sketches merge by addition — exactly what
Spark's partial aggregation does with the (row, bucket) hash-agg
below), and the guarantee is one-sided: est >= true always;
est <= true + (e/width)*N with probability 1 - (1/e)^depth per the
standard analysis.

Everything is built-in expressions (xxhash64 / pmod / explode /
hash-agg) — no UDFs, no driver-side loops; the sketch itself is the
only small thing, and broadcasting it is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (row, bucket, count) counter table: each key hashes
    into one bucket per row via xxhash64(key, row) — the row index
    acts as the hash seed. One explode (xdepth rows, cheap) + one
    hash-agg with map-side partial combine; output is depth*width
    rows at most, broadcastable by construction."""
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r"),
    ).select(
        "r",
        F.pmod(F.xxhash64(F.col("__k"), F.col("r")), F.lit(width)).alias(
            "b"
        ),
    )
    return rows.groupBy("r", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate key: recompute the
    key's depth buckets, broadcast-join the counter table, take the
    min across rows (the CMS estimator). Adds ``cms_est`` to the
    candidate frame. Missing counters (bucket never hit) read as 0."""
    probes = candidates.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r"),
    ).select(
        key_col,
        "r",
        F.pmod(F.xxhash64(F.col(key_col), F.col("r")), F.lit(width)).alias(
            "b"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "b"], "left_outer")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("c", F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
