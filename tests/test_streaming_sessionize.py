"""Stateful streaming sessionization (applyInPandasWithState):
stream == batch, with sessions deliberately cut across micro-batches."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _batch_sessions(spark, src):
    """Batch reference: the gate's lag+cumsum sessionizer over the same rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ep - F.lag(ep).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("_new", new_s).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(ep) - F.min(ep)).alias("duration_us"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def _dense_bursts(out_dir: str) -> int:
    """3 users x 4 bursts of 10 events (5-min steps, 2-h gaps between
    bursts), sliced so every burst straddles a micro-batch boundary.
    Returns the number of slices written."""
    import time

    base_us = 1_700_000_000_000_000  # fixed epoch, tz-free
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = base_us + user * 37_000_000
        for _burst in range(4):
            for _ in range(10):
                rows.append((eid, t, user, 0.25 + (eid % 7) * 0.125))
                eid += 1
                t += 5 * 60 * 1_000_000  # 5 min: same session
            t += 2 * 60 * 60 * 1_000_000  # 2 h: new session

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    ).sort_by([("ts", "ascending"), ("event_id", "ascending")])

    os.makedirs(out_dir, exist_ok=True)
    # 5 slices of 24 rows: burst length 10 never divides 24, so every slice
    # boundary lands mid-session for at least one user
    n_slices, n = 5, table.num_rows
    now = time.time() - 100
    for i in range(n_slices):
        lo, hi = i * n // n_slices, (i + 1) * n // n_slices
        p = os.path.join(out_dir, f"slice-{i:03d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), p)
        os.utime(p, (now + i * 10, now + i * 10))
    return n_slices


def test_sessions_stitch_across_microbatches(spark, tmp_path):
    from searchengine_spark.streaming.sessionize import run_sessionize_stream

    src = str(tmp_path / "src")
    n_slices = _dense_bursts(src)

    got_df = run_sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), files_per_trigger=1
    )
    assert got_df._sessionize_batches == n_slices  # genuinely multi-batch

    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us, r.total_value)
        for r in got_df.collect()
    }
    want = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us, r.total_value)
        for r in _batch_sessions(spark, src).collect()
    }
    assert got == want
    # shape sanity: 3 users x 4 bursts; each 10-event burst is ONE session
    # even though it arrived split across micro-batches
    assert len(got) == 12
    assert all(v[0] == 10 for v in got.values())


def test_stream_matches_batch_on_real_events(spark, tmp_path):
    from searchengine_spark.gate import q_sessionize
    from searchengine_spark.streaming.sessionize import (
        run_sessionize_stream,
        stage_time_ordered,
    )

    src = str(tmp_path / "src")
    stage_time_ordered("/root/testdata/sf0.001/events.parquet", src, n_slices=3)
    got_df = run_sessionize_stream(spark, src, str(tmp_path / "ckpt"))
    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us, r.total_value)
        for r in got_df.collect()
    }
    want = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us, r.total_value)
        for r in q_sessionize(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want
    assert len(got) > 100
