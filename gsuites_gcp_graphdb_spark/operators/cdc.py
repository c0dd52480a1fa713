"""Change-data-capture table diff: row-level classification between
two versions of a table (the snapshot-diff operator every warehouse
sync / incremental-materialization pipeline needs; the graph twin is
graph/upsert + g_snapshot_diff).

Scale shape: ONE key-equi full-outer join — co-partitioned
sort-merge at scale (bucket both versions by key and the Exchange
disappears, same layout argument as the graph store); classification
and the changed-column mask are map-side expressions after the join;
output is census-sized. Nothing here is quadratic and nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """Row-level diff of two table versions sharing a key: returns
    one row per key present in either version with ``change_type``
    (inserted | deleted | updated | unchanged) and ``changed_cols``
    (comma-joined sorted names of compared columns whose values are
    DISTINCT between versions — the CDC column mask; '' when none).

    Null-safe throughout: presence is tracked by explicit marker
    columns (a version whose compared columns are all NULL is still
    present), and per-column change uses IS DISTINCT FROM semantics
    so NULL -> value and value -> NULL both count as changes."""
    o = old.select(
        *keys,
        F.lit(True).alias("__op"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__np"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, keys, "full_outer")
    changed = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in sorted(cols)
    ]
    mask = F.concat_ws(
        ",", F.array_compact(F.array(*changed))
    )
    ctype = (
        F.when(F.col("__op").isNull(), F.lit("inserted"))
        .when(F.col("__np").isNull(), F.lit("deleted"))
        .when(mask != "", F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        ctype.alias("change_type"),
        F.when(
            F.col("__op").isNull() | F.col("__np").isNull(), F.lit("")
        )
        .otherwise(mask)
        .alias("changed_cols"),
        *[F.col(f"__o_{c}").alias(f"old_{c}") for c in cols],
        *[F.col(f"__n_{c}").alias(f"new_{c}") for c in cols],
    )
