"""Incremental view maintenance for algebraic aggregates: keep a
MATERIALIZED partial-aggregate table and fold each new batch into it
with a merge, never re-reading history. count/sum/min/max are
algebraic (partials merge losslessly); avg derives from (sum, count);
distinct counts cascade as HLL sketches (operators/sketches,
ns_events_hll_rollup) — the same decomposition DESIGN.md #16 uses for
the hypertable rollup, applied along TIME-OF-ARRIVAL instead of
granularity.

Scale shape: a day's delta batch aggregates with one map-side-
combinable hash-agg; the merge re-aggregates partials keyed by the
group key — at 100 TB the partial table is orders of magnitude
smaller than raw history, so maintaining a year-long rollup costs
O(day) per day instead of O(year). Sums travel as exact integer
micro-units (floor(value*1e6) BIGINT) so merge order can never drift
the result — merged partials are bit-identical to a full recompute,
which is exactly what the catalog oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_value_aggs(
    df: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Partial (mergeable) aggregate state for one batch:
    (keys..., n_events, sum_value_micro, min_value_micro,
    max_value_micro). Safe to merge with merge_partials any number of
    times, in any order."""
    mu = F.floor(F.col(value_col) * 1e6).cast("bigint")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(mu).alias("sum_value_micro"),
        F.min(mu).alias("min_value_micro"),
        F.max(mu).alias("max_value_micro"),
    )


def merge_partials(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta partial table into the base: count/sum add,
    min/max fold — associative and commutative, so batches may merge
    in any order or grouping. NOT idempotent: a replayed batch would
    double-count, so at-least-once delivery needs exactly-once batch
    tracking around this merge (the manifest-seq pattern
    streaming/ingest.py uses)."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_micro").alias("sum_value_micro"),
            F.min("min_value_micro").alias("min_value_micro"),
            F.max("max_value_micro").alias("max_value_micro"),
        )
    )
