"""Stateful streaming sessionization via ``applyInPandasWithState``.

Streaming twin of the batch sessionizer (``gate.q_sessionize``, lag+cumsum
windows).  The reference has no streaming surface (SURVEY §2.5/§2.9 — this
is the scale extension); the contract here is *stream == batch*: running
the stateful operator over any time-ordered micro-batch split of the events
table yields exactly the batch result.

Design (100 TB lens):

- state is keyed by ``user_id`` and holds ONLY the open session (5 scalars
  per user) — memory is O(active users), not O(events); closed sessions are
  emitted once and dropped from state immediately.
- events are processed strictly in event-time order per user (the standard
  in-order/watermark contract of a session operator; the batch twin defines
  the semantics under disorder and is the backfill path).
- output mode is ``update``: a closed session is emitted exactly once with
  its final values; the open session is re-emitted as a growing snapshot
  each batch it changes.  Because ``n_events``/``duration_us`` only grow
  within a session, the FINAL value of each ``(user_id, session_id)`` is
  the row with max ``(n_events, duration_us)`` — deterministic regardless
  of sink ordering; ``finalize_sessions`` applies that reduction.

Reference parity: the reference (anton-podoinikov/SearchEngine) has no
event/session concept; this extends the engine the way SURVEY §7 prescribes
for streaming state (services/StatisticsServiceImpl.java is the closest
batch-stats analog).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from collections.abc import Iterator

    from pyspark.sql import DataFrame, SparkSession

SESSION_GAP_MIN = 30  # same constant as gate.SESSION_GAP_MIN

# (user_id, session_id, n_events, duration_us, total_value) — identical to
# the batch q_sessionize output schema (total_value left unrounded here;
# callers round Spark-side so batch and stream use the same HALF_UP).
OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "duration_us bigint, total_value double"
)
# open session only: (session_id, start_us, last_us, n, total)
STATE_SCHEMA = "session_id bigint, start_us bigint, last_us bigint, n bigint, total double"


def _session_fn(gap_us: int):
    """Build the per-group stateful function (closure over the gap)."""

    def fn(key: tuple, pdfs: Iterator[Any], state: Any) -> Iterator[Any]:
        import pandas as pd

        user_id = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        # within-batch disorder is fine; cross-batch order is the contract
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")

        if state.exists:
            sid, start, last, n, total = state.get
        else:
            sid, start, last, n, total = 0, None, None, 0, 0.0

        out: list[tuple] = []
        for ts_us, value in zip(batch["ts_us"].to_numpy(),
                                batch["value"].to_numpy()):
            ts_us = int(ts_us)
            if last is None or ts_us - last > gap_us:
                if last is not None:  # close the previous session: final emit
                    out.append((user_id, sid, n, last - start, total))
                sid += 1
                start = ts_us
                n = 0
                total = 0.0
            last = ts_us
            n += 1
            total += float(value)
        if last is not None:  # snapshot of the (still open) current session
            out.append((user_id, sid, n, last - start, total))

        state.update((sid, start, last, n, total))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "duration_us",
                     "total_value"],
        )

    return fn


def sessionize_stream(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Stateful sessionizer over a STREAMING events DataFrame.

    ``events`` needs (event_id, ts, user_id, value); emits update-mode rows
    per OUTPUT_SCHEMA (reduce with :func:`finalize_sessions`).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_min * 60 * 1_000_000),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def finalize_sessions(updates: DataFrame) -> DataFrame:
    """Reduce update-mode emissions to the final row per (user_id, session_id).

    Within a session n_events/duration only grow, so max() of every measure
    picks the last snapshot — no sink-order assumption.  total_value is
    rounded HALF_UP to 4 dp here (same place the batch twin rounds).
    """
    return (
        updates.groupBy("user_id", "session_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("duration_us").alias("duration_us"),
            F.round(F.max_by("total_value", "n_events"), 4).alias("total_value"),
        )
    )


def stage_time_ordered(events_parquet: str, out_dir: str, n_slices: int = 3) -> list[str]:
    """Split one events parquet into ``n_slices`` time-ordered files with
    strictly increasing mtimes, so the file-stream source replays them as
    ordered micro-batches (``maxFilesPerTrigger=1``)."""
    import os
    import time

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(events_parquet).sort_by(
        [("ts", "ascending"), ("event_id", "ascending")]
    )
    n = t.num_rows
    paths = []
    base = time.time() - n_slices * 10
    for i in range(n_slices):
        lo = i * n // n_slices
        hi = (i + 1) * n // n_slices
        p = os.path.join(out_dir, f"slice-{i:03d}.parquet")
        pq.write_table(t.slice(lo, hi - lo), p)
        os.utime(p, (base + i * 10, base + i * 10))
        paths.append(p)
    return paths


def run_sessionize_stream(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    gap_min: int = SESSION_GAP_MIN,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Run the stateful sessionizer over a staged directory to completion
    (availableNow) and return the finalized batch DataFrame."""
    import uuid

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    updates = sessionize_stream(stream, gap_min=gap_min)
    name = f"sessions_{uuid.uuid4().hex[:12]}"
    q = (
        updates.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    out = finalize_sessions(spark.table(name))
    # stash for callers that want to assert multi-batch execution
    out._sessionize_batches = n_batches  # noqa: SLF001 (test introspection)
    return out
