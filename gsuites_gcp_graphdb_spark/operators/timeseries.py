"""Sequential-scan time-series operators, built on the DISTRIBUTED
two-pass prefix pattern.

A cumulative aggregate (running sum/max) over a long series is the
one shape a naive Spark plan gets catastrophically wrong: a window
ordered by time with no partition key is a global WindowExec — the
entire series sorts into ONE task. The scalable spelling is the
classic parallel prefix scan, in DataFrame form:

  pass 1: window PARTITIONED by (series, time-chunk) — each chunk
          computes its local prefix independently, full parallelism;
  pass 2: per-chunk totals (a hash-agg, one row per chunk) get their
          cross-chunk running offset via a window partitioned by
          SERIES over the tiny chunk table;
  pass 3: row prefix = local prefix + broadcast chunk offset.

Exactness discipline (DESIGN.md #8): all sums are decimal(38,0)
integers (values in micro-units, deviations pre-scaled by n to avoid
any division), so the two-pass result is BIT-identical to the
sequential definition — decimal addition is associative — and DuckDB
reproduces it with HUGEINT windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEC = "decimal(38,0)"


def prefix_sum(
    df: DataFrame,
    series_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "prefix",
    chunk: str = "day",
) -> DataFrame:
    """Running sum of ``val_col`` per ``series_col`` in
    ``order_cols`` order (first of which must be a timestamp),
    computed by the two-pass chunked scan above — no global window,
    no single-task sort. Exact for integer/decimal ``val_col``."""
    ts = order_cols[0]
    c = F.date_trunc(chunk, F.col(ts)).alias("__chunk")
    d = df.withColumn("__chunk", c)
    wl = (
        Window.partitionBy(series_col, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__local", F.sum(val_col).over(wl))
    totals = d.groupBy(series_col, "__chunk").agg(
        F.sum(val_col).alias("__ct")
    )
    wo = (
        Window.partitionBy(series_col)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.withColumn(
        "__off", F.coalesce(F.sum("__ct").over(wo), F.lit(0).cast(DEC))
    ).select(series_col, "__chunk", "__off")
    return (
        local.join(F.broadcast(offs), [series_col, "__chunk"])
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__chunk", "__local", "__off")
    )


def cusum_change_points(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM change-point detection per series (Page 1954): the
    cumulative sum of deviations from the series mean peaks (in
    absolute value) at the most likely single change point of the
    mean. Returns (series, n_events, change_ts, peak_dev) where
    peak_dev = |S|/n in original value units.

    Exact-integer spelling: with y_i = floor(value * 1e6) and
    S_i = sum_{j<=i} (n*y_j - sum(y)) — deviations pre-scaled by n so
    the mean never divides — every S_i is a decimal(38) integer both
    engines agree on bit-for-bit; the one division and double cast
    happen once, at the very end, identically. Headroom: |n*y_j| <=
    n * 1e6 * max|value|, summed over n rows — safe through ~1e12
    micro-unit event-rows per series against the 1e38 ceiling.

    Scale shape: one per-series hash-agg for (n, sum), a broadcast
    join of that tiny table, the two-pass :func:`prefix_sum` scan
    (day-chunked — no global sort), and a struct-min argmax (hash
    aggregate, no ranking window). Ties on |S| break to the earliest
    (ts, id)."""
    y = F.floor(F.col(value_col) * 1e6).cast(DEC)
    base = events.select(
        F.col(series_col),
        F.col(ts_col),
        F.col(id_col),
        y.alias("__y"),
    )
    m = base.groupBy(series_col).agg(
        F.count(F.lit(1)).cast(DEC).alias("__n"),
        F.sum("__y").alias("__sy"),
    )
    dev = base.join(F.broadcast(m), [series_col]).withColumn(
        "__dev", F.col("__n") * F.col("__y") - F.col("__sy")
    )
    s = prefix_sum(
        dev, series_col, [ts_col, id_col], "__dev", out_col="__s"
    )
    best = (
        s.withColumn("__abs", F.abs(F.col("__s")))
        .groupBy(series_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("__abs")).alias("na"),
                    F.col(ts_col).alias("ts"),
                    F.col(id_col).alias("id"),
                    F.col("__n").alias("n"),
                )
            ).alias("__b")
        )
    )
    return best.select(
        F.col(series_col),
        F.col("__b.n").cast("bigint").alias("n_events"),
        F.col("__b.ts").alias("change_ts"),
        F.round(
            (-F.col("__b.na")).cast("double")
            / (F.col("__b.n").cast("double") * F.lit(1e6)),
            6,
        ).alias("peak_dev"),
    )


def gapfill_locf(
    sparse: DataFrame,
    series_col: str,
    slot_col: str,
    val_cols: list[str],
    chunk_slots: int = 96,
) -> DataFrame:
    """Dense-grid gap fill with last-observation-carried-forward —
    the hypertable `time_bucket_gapfill(...) + locf(...)` shape
    (TimescaleDB / InfluxDB parity; the reference's README graphs are
    snapshots over exactly this kind of regularized series). Input is
    one row per OBSERVED (series, slot); output is one row per slot
    on each series' dense [min_slot, max_slot] grid, with every
    column in ``val_cols`` carried forward across gaps and an
    ``observed`` flag marking real rows.

    Scale shape — both classic pitfalls avoided:

    * grid generation never builds a whole series in one array: a
      two-level explode emits chunk ids first (``chunk_slots`` apart),
      then at most ``chunk_slots`` slots per chunk row, so task input
      stays bounded no matter how long a series runs;
    * the carry-forward is NOT a per-series global window (one task
      per series = the skew trap): it is the repo's banded two-pass
      scan — local LOCF inside each (series, chunk) band, then the
      cross-chunk carry computed on the tiny one-row-per-chunk table
      and broadcast back. last() is associativity-safe across the
      band boundary because a band's carry-out is by definition its
      last non-null value.

    Leading gaps stay NULL (nothing to carry yet) — callers coalesce
    if they grid from each series' first observation, where no
    leading NULL can exist."""
    b = sparse.groupBy(series_col).agg(
        F.min(slot_col).alias("__s0"), F.max(slot_col).alias("__s1")
    )
    n = F.lit(int(chunk_slots))
    chunks = b.select(
        series_col,
        "__s0",
        "__s1",
        F.explode(
            F.sequence(
                (F.col("__s0") / n).cast("bigint"),
                (F.col("__s1") / n).cast("bigint"),
            )
        ).alias("__chunk"),
    )
    grid = chunks.select(
        series_col,
        "__chunk",
        F.explode(
            F.sequence(
                F.greatest(F.col("__s0"), F.col("__chunk") * n),
                F.least(
                    F.col("__s1"), F.col("__chunk") * n + (n - F.lit(1))
                ),
            )
        ).alias(slot_col),
    )
    j = (
        grid.join(
            sparse.withColumn("__obs", F.lit(True)),
            [series_col, slot_col],
            "left",
        )
        .withColumn("observed", F.coalesce(F.col("__obs"), F.lit(False)))
        .drop("__obs")
    )
    wl = (
        Window.partitionBy(series_col, "__chunk")
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = j
    for v in val_cols:
        local = local.withColumn(
            f"__l_{v}", F.last(v, ignorenulls=True).over(wl)
        )
    carry_out = local.groupBy(series_col, "__chunk").agg(
        *[F.max_by(f"__l_{v}", slot_col).alias(f"__co_{v}") for v in val_cols]
    )
    wc = (
        Window.partitionBy(series_col)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = carry_out.select(
        series_col,
        "__chunk",
        *[
            F.last(f"__co_{v}", ignorenulls=True)
            .over(wc)
            .alias(f"__ci_{v}")
            for v in val_cols
        ],
    )
    out = local.join(
        F.broadcast(carry_in), [series_col, "__chunk"]
    ).select(
        series_col,
        slot_col,
        *[
            F.coalesce(F.col(f"__l_{v}"), F.col(f"__ci_{v}")).alias(v)
            for v in val_cols
        ],
        "observed",
    )
    return out


def out_of_order_lateness(
    events: DataFrame,
    series_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event out-of-orderness in exact integer microseconds: how
    far each event's event-time lags behind the maximum event-time
    already seen in ITS SERIES' arrival order (arrival order =
    `order_col`, the ingestion sequence). lateness_us = max(0,
    running_prior_max_us - ts_us); an in-order event scores 0.

    This is THE statistic that sizes a streaming watermark: a
    watermark of W drops exactly the events whose lateness exceeds
    W, so the lateness distribution is the drop-rate curve. Scale:
    one window PARTITIONED by series ordered by arrival (never a
    global scan), all-integer arithmetic."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros(F.col(ts_col))
    prior = F.max(F.unix_micros(F.col(ts_col))).over(w)
    return events.withColumn(
        "lateness_us",
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.coalesce(prior, ts_us) - ts_us).cast("bigint"),
        ),
    )
