"""Run finite Structured Streaming queries to completion — the bridge
that lets REAL streaming plans (state store, watermarks, stream-stream
join state) participate in the batch correctness catalog.

The reference is batch-only; this is north-star surface (SURVEY.md
§2C streaming row). The pattern: a file-source stream over the fixture
parquet, ``Trigger.AvailableNow`` so the query drains every file and
stops, a memory sink holding the final result, and a batch read of
that sink returned to the caller. On a real cluster the same plans run
unbounded with kafka/file sources and parquet/Delta sinks — only the
source/sink bindings change, the stateful middle is identical.

Determinism note: AvailableNow processes all available input then
stops; complete-mode aggregations and inner stream-stream joins emit
every result row regardless of watermark progress, so the final table
equals the batch answer and is oracle-checkable. (Append-mode
aggregations would withhold windows newer than the final watermark —
deliberately not used here.)
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MEM_COUNTER = itertools.count()
_STAGED_DIRS: dict[str, str] = {}

# Observability: run_to_memory stashes each drained query's final
# progress here under its logical name — stateOperators carries
# numRowsTotal / stateMemory (HDFS store) or rocksdb custom metrics,
# which is how the state-store scale receipts in SCALING.md are
# measured without changing any query code.
LAST_PROGRESS: dict[str, dict] = {}


def _cleanup_staged() -> None:
    # session-cached scratch dirs must not accumulate across repeated
    # bench/selfcheck runs (same hygiene as the ingest-e2e scratch)
    for d in (*_STAGED_DIRS.values(), *_SORTED_STAGED.values()):
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_staged)


def stage_events_dir(sf_dir: str) -> str:
    """Spark's file streaming source lists a DIRECTORY; the fixture is
    a single parquet file inside a dir of other tables. Stage a temp
    dir holding a symlink to just the events file (cached per sf_dir,
    zero data copied)."""
    d = _STAGED_DIRS.get(sf_dir)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="spark_graft_events_")
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(d, "events.parquet"),
        )
        _STAGED_DIRS[sf_dir] = d
    return d


def read_events_stream(
    spark: SparkSession, sf_dir: str, watermark: str | None = None
) -> DataFrame:
    """Streaming scan of the events fixture with the same ts-type
    normalization as the batch loader (sources/fixtures.py
    normalize_events_ts — handles nanos-as-long, NTZ-micros, and
    tz-aware fixture generations)."""
    from ..sources.fixtures import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    s = normalize_events_ts(
        spark.readStream.schema(schema).parquet(stage_events_dir(sf_dir))
    )
    if watermark is not None:
        s = s.withWatermark("ts", watermark)
    return s


def run_to_memory(
    df: DataFrame, name: str, output_mode: str, timeout_sec: int = 300
) -> DataFrame:
    """Execute a streaming DataFrame with AvailableNow into a memory
    sink, await termination, and return the final table as a batch
    DataFrame. Table names are uniquified per run so repeated catalog
    sweeps in one session never read a stale sink."""
    spark = df.sparkSession
    qname = f"{name}_{next(_MEM_COUNTER)}"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(
                f"streaming query {qname} did not drain in {timeout_sec}s"
            )
    finally:
        try:
            lp = q.lastProgress
            if lp:
                LAST_PROGRESS[name] = lp
        except Exception:
            pass
        if q.isActive:
            q.stop()
    return spark.table(qname)


_SORTED_STAGED: dict[tuple[str, int], str] = {}


def stage_events_sorted_split(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """Stage the events fixture as ``n_files`` ts-ordered quartile
    files with strictly increasing mtimes — a deterministic ARRIVAL
    ORDER for multi-batch streaming runs (maxFilesPerTrigger=1 then
    drains them oldest-quartile-first, so the watermark advances
    monotonically batch over batch, which outer-join null emission
    and state eviction need; one big unordered batch would jump the
    watermark to max-ts immediately and stop).

    The quartile assignment is ntile(n) over (ts, event_id) — the
    same ANSI ntile the oracle can reproduce — and this is fixture
    staging (simulating a source that delivers in event-time order),
    not part of any query plan, so the total-order sort here is not a
    scale concern. Files are written NORMALIZED (fixtures.
    normalize_events_ts) so the streaming read needs no further
    coercion. Cached per (sf_dir, n_files)."""
    import time as _time

    from pyspark.sql.window import Window

    from ..sources.fixtures import load_table

    key = (sf_dir, n_files)
    d = _SORTED_STAGED.get(key)
    if d is not None and os.path.isdir(d):
        return d
    d = tempfile.mkdtemp(prefix="spark_graft_events_sorted_")
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    bucketed = ev.withColumn("__q", F.ntile(n_files).over(w))
    for i in range(1, n_files + 1):
        part = bucketed.filter(F.col("__q") == i).drop("__q")
        out = os.path.join(d, f"q{i}")
        part.coalesce(1).write.parquet(out, mode="overwrite")
        # one visible parquet file per quartile, mtime-ordered
        files = [
            f
            for f in os.listdir(out)
            if f.endswith(".parquet") and not f.startswith("_")
        ]
        assert len(files) == 1
        src = os.path.join(out, files[0])
        dst = os.path.join(d, f"w{i}.parquet")
        os.rename(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return _SORTED_STAGED.setdefault(key, d)


def read_staged_stream(
    spark: SparkSession,
    staged_dir: str,
    watermark: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming scan of a stage_events_sorted_split dir: one file per
    micro-batch in mtime order."""
    schema = spark.read.parquet(
        os.path.join(staged_dir, "w1.parquet")
    ).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staged_dir)
        .withWatermark("ts", watermark)
    )
