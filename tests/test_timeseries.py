"""Two-pass prefix scan + CUSUM change-point semantics (the
distributed-scan discipline of operators/timeseries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.operators import timeseries as tss


def _rows(vals, start_day=1):
    """One event per hour, rolling into later days (forces the scan
    across chunk boundaries)."""
    out = []
    for i, v in enumerate(vals):
        ts = dt.datetime(2024, 1, start_day) + dt.timedelta(hours=i * 7)
        out.append((i, ts, "a", float(v)))
    return out


def test_prefix_sum_two_pass_equals_sequential(spark):
    """The chunked two-pass scan must be BIT-identical to the naive
    sequential prefix sum — including across day-chunk boundaries."""
    rows = _rows([5, -3, 2, 2, -10, 4, 4, 1, -1, 7, 0, -6])
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).withColumn("v", F.col("value").cast(tss.DEC))
    got = {
        r.event_id: int(r.prefix)
        for r in tss.prefix_sum(
            df, "event_type", ["ts", "event_id"], "v"
        ).collect()
    }
    acc, want = 0, {}
    for i, (eid, _, _, v) in enumerate(rows):
        acc += int(v)
        want[eid] = acc
    assert got == want
    # multiple days were actually involved (the two-pass path ran)
    n_days = df.select(
        F.count_distinct(F.date_trunc("day", "ts"))
    ).collect()[0][0]
    assert n_days >= 3


def test_cusum_finds_mean_shift(spark):
    """A series that jumps from mean 0 to mean 10 halfway peaks its
    |CUSUM| exactly at the last pre-shift point; a flat series peaks
    trivially with peak_dev ~ 0."""
    shift = [0.0] * 6 + [10.0] * 6
    flat = [4.0] * 8
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i * 9), "shift", v)
        for i, v in enumerate(shift)
    ] + [
        (100 + i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i * 9),
         "flat", v)
        for i, v in enumerate(flat)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_type: r for r in tss.cusum_change_points(df).collect()}
    # deviations are (v - 5) scaled: prefix is most negative right
    # before the shift -> change_ts = ts of event_id 5
    assert out["shift"].change_ts == dt.datetime(2024, 1, 1) + dt.timedelta(
        hours=5 * 9
    )
    assert out["shift"].peak_dev > 0
    assert out["flat"].peak_dev == 0.0
    assert out["flat"].n_events == 8


def test_gapfill_locf_dense_grid_and_carry(spark):
    """Gap fill must emit every slot on [min, max] per series, carry
    the last observed value across gaps — INCLUDING across band
    boundaries (chunk_slots=4 forces multi-band series) — and flag
    observed rows. A second series checks grids are per-series."""
    sparse = spark.createDataFrame(
        [
            ("a", 0, 10),
            ("a", 1, 20),
            # gap 2..8 spans two full bands at chunk_slots=4
            ("a", 9, 90),
            ("b", 100, 5),
            ("b", 102, 7),
        ],
        "s string, slot long, v long",
    )
    rows = tss.gapfill_locf(
        sparse, "s", "slot", ["v"], chunk_slots=4
    ).collect()
    got = {(r.s, r.slot): (r.v, r.observed) for r in rows}
    assert len(got) == len(rows)  # no duplicate slots
    assert {k for k in got if k[0] == "a"} == {("a", i) for i in range(10)}
    assert {k for k in got if k[0] == "b"} == {("b", i) for i in (100, 101, 102)}
    assert got[("a", 0)] == (10, True)
    assert got[("a", 1)] == (20, True)
    for i in range(2, 9):  # carried across band boundaries 4 and 8
        assert got[("a", i)] == (20, False)
    assert got[("a", 9)] == (90, True)
    assert got[("b", 101)] == (5, False)
    assert got[("b", 102)] == (7, True)


def test_events_attribution_journeys(spark, tmp_path):
    """Journeys reset at each purchase: touches between purchases
    attribute to the NEXT purchase only; a purchase with no preceding
    touch in its journey is 'direct'."""
    import os

    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        events_attribution,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
        (2, "2024-01-01 10:01:00", 7, "click", 0.0, "{}"),
        (3, "2024-01-01 10:02:00", 7, "purchase", 10.0, "{}"),
        (4, "2024-01-01 10:03:00", 7, "purchase", 5.0, "{}"),
        (5, "2024-01-01 10:04:00", 7, "click", 0.0, "{}"),
        (6, "2024-01-01 10:05:00", 7, "purchase", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/events.parquet", mode="overwrite")
    out = {
        (r.first_touch, r.last_touch): (
            r.n_conversions,
            r.n_touches,
            r.revenue,
        )
        for r in events_attribution(spark, d).collect()
    }
    assert out == {
        ("view", "click"): (1, 2, 10.0),
        ("direct", "direct"): (1, 0, 5.0),
        ("click", "click"): (1, 1, 2.0),
    }


def test_events_pit_lookup_boundaries(spark, tmp_path):
    """Containment is half-open [valid_from, valid_to): a purchase at
    exactly a state-change tick attributes to the NEW state; a
    purchase before the user's first state event is 'none'; episodes
    tile disjointly so no purchase double-counts."""
    import os

    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        events_pit_lookup,
    )

    rows = [
        (1, "2024-01-01 09:00:00", 7, "purchase", 1.0, "{}"),
        (2, "2024-01-01 10:00:00", 7, "view", 0.0, "{}"),
        (3, "2024-01-01 11:00:00", 7, "purchase", 2.0, "{}"),
        (4, "2024-01-01 12:00:00", 7, "click", 0.0, "{}"),
        (5, "2024-01-01 12:00:00", 7, "purchase", 4.0, "{}"),
        (6, "2024-01-01 13:00:00", 7, "purchase", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/events.parquet", mode="overwrite")
    out = {
        r.state_type: (r.n_purchases, r.revenue)
        for r in events_pit_lookup(spark, d).collect()
    }
    assert out == {
        "none": (1, 1.0),   # 09:00 purchase precedes any state
        "view": (1, 2.0),   # 11:00 inside [10:00, 12:00)
        "click": (2, 12.0), # 12:00 tick attributes to the NEW state
    }


def test_out_of_order_lateness_hand_computed(spark):
    """Lateness vs per-user running max in arrival (event_id) order:
    user 1 gets one in-order event, one exactly-equal (0), one 2h
    late; user 2's single event is trivially 0; series never mix."""
    from gsuites_gcp_graphdb_spark.operators.timeseries import (
        out_of_order_lateness,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 12:00:00", 1),  # in order
        (3, "2024-01-01 12:00:00", 1),  # ties prior max -> 0
        (4, "2024-01-01 10:00:00", 1),  # 2h behind the 12:00 max
        (5, "2024-01-01 09:00:00", 2),  # other series, first -> 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.event_id: r.lateness_us
        for r in out_of_order_lateness(df).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 7200 * 1000000, 5: 0}
