"""Structured Streaming semantics: micro-batch file source, watermark
late-data drop, session windows, custom stateful op (SURVEY.md §5.4)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from gsuites_gcp_graphdb_spark.streaming import windows as win


@pytest.fixture()
def event_rows(spark):
    def mk(ts, user, typ, val):
        return (ts, user, typ, val)

    return [
        mk("2024-01-01 00:01:00", 1, "click", 1.0),
        mk("2024-01-01 00:04:00", 1, "click", 2.0),
        mk("2024-01-01 00:12:00", 2, "view", 3.0),
        mk("2024-01-01 01:00:00", 1, "click", 4.0),
    ]


def _to_df(spark, rows):
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_type string, value double"
    )
    return df.select(
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.monotonically_increasing_id().alias("event_id"),
    )


def test_batch_window_functions(spark, event_rows):
    e = _to_df(spark, event_rows)
    t = {
        (r.bucket.hour, r.bucket.minute, r.event_type): r.n
        for r in win.tumbling_counts(e).collect()
    }
    assert t[(0, 0, "click")] == 2
    s = win.session_counts_batch(e, gap_minutes=30).collect()
    by_user = {r.user_id: r for r in s}
    assert by_user[1].n_sessions == 2  # 00:01/00:04 then 01:00
    assert by_user[1].max_session_events == 2
    sw = win.session_window_streaming_agg(e, gap="30 minutes").collect()
    assert len(sw) == 3


def test_streaming_watermark_drops_late(spark, tmp_path, event_rows):
    """Two runs sharing one checkpoint (so watermark state persists):
    run 2 delivers an event far older than the carried watermark — the
    stateful aggregation must drop it, not resurrect a closed window."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    on_time = _to_df(spark, event_rows)
    on_time.write.parquet(src, mode="overwrite")

    def run_once():
        stream = (
            spark.readStream.schema(on_time.schema)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
        )
        q = (
            win.windowed_stream_counts(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(sink).collect()
    closed = {(r.bucket.hour, r.bucket.minute, r.event_type) for r in first}
    # watermark advanced to 00:50: the 00:00 and 00:10 windows closed
    assert (0, 0, "click") in closed
    assert (0, 10, "view") in closed
    # the 01:00 window is still open (not past watermark), not emitted
    assert not any(r.bucket.hour == 1 for r in first)

    # a very-late event (00:02 « watermark 00:50) arrives in run 2
    _to_df(spark, [("2024-01-01 00:02:00", 9, "late", 9.0)]).write.parquet(
        src, mode="append"
    )
    run_once()
    second = spark.read.parquet(sink).collect()
    # the late event was dropped: no 'late'-typed window ever emitted,
    # and the closed 00:00 window was not re-emitted with a new count
    assert not any(r.event_type == "late" for r in second)
    counts = [
        r.n for r in second
        if (r.bucket.hour, r.bucket.minute, r.event_type) == (0, 0, "click")
    ]
    assert counts == [2]


def test_stream_stream_join(spark, tmp_path, event_rows):
    """Stream-stream inner join with watermarks: clicks joined to
    same-user views within 30 minutes — state-store-backed windowed
    join, the streaming analog of the range join."""
    src = str(tmp_path / "ss_src")
    e = _to_df(spark, event_rows)
    e.write.parquet(src, mode="overwrite")

    def stream():
        return (
            spark.readStream.schema(e.schema)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
        )

    clicks = stream().filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    views = stream().filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = clicks.join(
        views,
        F.expr(
            """
            c_user = v_user AND
            v_ts BETWEEN c_ts - INTERVAL 30 MINUTES
                     AND c_ts + INTERVAL 30 MINUTES
            """
        ),
    )
    name = "ssj_" + str(abs(hash(str(tmp_path))) % 10**8)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ss_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select * from {name}").collect()
    # user 2's view at 00:12 has no same-user click within 30m;
    # user 1 clicks at 00:01/00:04/01:00 but has no views -> empty
    assert rows == []

    # add a user-2 click at 00:20 -> joins the 00:12 view
    _to_df(spark, [("2024-01-01 00:20:00", 2, "click", 1.0)]).write.parquet(
        src, mode="append"
    )
    # memory sink can't recover a checkpoint: fresh checkpoint, full
    # replay (availableNow reprocesses all files)
    q2 = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name + "b")
        .option("checkpointLocation", str(tmp_path / "ss_ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = spark.sql(f"select * from {name}b").collect()
    assert len(rows2) == 1 and rows2[0].c_user == 2


def test_stateful_running_counts(spark, tmp_path, event_rows):
    """Custom stateful streaming op: per-user running event counter via
    applyInPandasWithState — the reference has no streaming surface;
    this is the north-star custom-stateful-operator row."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "src2")
    _to_df(spark, event_rows).write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema(_to_df(spark, event_rows).schema)
        .parquet(src)
    )

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n long",
        "count long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    name = "state_out_" + str(abs(hash(str(tmp_path))) % 10**8)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r.n for r in spark.sql(f"select * from {name}").collect()}
    assert rows == {1: 3, 2: 1}


def test_stream_left_outer_emits_nulls(spark, sf_dir):
    """The outer rows in ns_events_stream_left_join must come from the
    STREAMING engine's watermark-eviction path: the drained result has
    signups with zero clicks, which an inner stream join can never
    produce."""
    from gsuites_gcp_graphdb_spark.plans.pipeline_queries import (
        events_stream_left_join,
    )

    out = events_stream_left_join(spark, sf_dir)
    rows = out.collect()
    zero = [r for r in rows if r.n_clicks == 0]
    assert zero, "no zero-click signups emitted — outer path untested"
    # matched signups flow through the same join too
    assert any(r.n_clicks > 0 for r in rows)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """The bounded-state dedup variant: within the watermark horizon,
    re-deliveries of the same event_id are dropped exactly like
    unbounded dropDuplicates; the catalog's exact-dedup entry
    documents why the within-watermark form can't be oracle-checked
    (eviction timing vs file->batch assignment), so its contract is
    pinned here with a single deterministic batch instead."""
    rows = [
        ("2024-01-01 00:01:00", 1, "click", 1.0, 10),
        ("2024-01-01 00:01:00", 1, "click", 1.0, 10),   # dup, same batch
        ("2024-01-01 00:05:00", 2, "view", 2.0, 11),
        ("2024-01-01 00:05:00", 2, "view", 2.0, 11),    # dup
        ("2024-01-01 00:30:00", 3, "click", 3.0, 12),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_type string, value double,"
        " event_id long"
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type",
             "value", "event_id")
    src = str(tmp_path / "src")
    df.write.parquet(src, mode="overwrite")
    stream = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ddww").select("event_id").collect()
    assert sorted(r.event_id for r in got) == [10, 11, 12]
