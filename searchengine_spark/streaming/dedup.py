"""Streaming exact dedup with BOUNDED state: at-least-once sources
re-deliver rows, and the sink must see each key once.

Spark-first shape: ``withWatermark`` + ``dropDuplicatesWithinWatermark``
— the state store keeps a key only until the event-time watermark passes
its timestamp + delay, so state is O(keys inside the watermark horizon),
not O(all keys ever seen).  Plain ``dropDuplicates`` on a stream grows
state forever — the 100 TB scale-killer this module exists to avoid.

The replay harness plants the at-least-once failure mode deterministically:
each staged micro-batch file is prefixed with the TAIL of the previous
slice (a redelivery of just-seen rows — the duplicates any offset-reset /
retry produces).  Tail rows sit at the event-time boundary between
slices, so their dedup state is provably alive when the duplicate
arrives, for ANY watermark delay — the parity contract
(stream == batch distinct == SQL) does not depend on tuning.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def dedup_stream(events: DataFrame, key_cols: tuple[str, ...] = ("event_id",),
                 ts_col: str = "ts", watermark: str = "30 minutes") -> DataFrame:
    """Streaming DataFrame -> exactly-once rows per key within the
    watermark horizon.  The watermark column must be TIMESTAMP (not NTZ),
    so the event time is cast onto a scratch column and dropped after —
    the caller's schema passes through unchanged."""
    return (
        events.withColumn("_wts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_wts", watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
        .drop("_wts")
    )


def stage_with_duplicates(events_parquet: str, out_dir: str,
                          n_slices: int = 3,
                          dup_fraction: float = 0.2) -> list[str]:
    """Split one events parquet into ``n_slices`` time-ordered files with
    increasing mtimes; every slice after the first is PREFIXED with the
    last ``dup_fraction`` of the previous slice's rows (deterministic
    redelivery of just-seen rows)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(events_parquet).sort_by(
        [("ts", "ascending"), ("event_id", "ascending")]
    )
    n = t.num_rows
    paths = []
    base = time.time() - n_slices * 10
    prev_tail = None
    for i in range(n_slices):
        lo = i * n // n_slices
        hi = (i + 1) * n // n_slices
        sl = t.slice(lo, hi - lo)
        out = sl if prev_tail is None else pa.concat_tables([prev_tail, sl])
        k = max(1, int(sl.num_rows * dup_fraction))
        prev_tail = sl.slice(sl.num_rows - k, k)
        p = os.path.join(out_dir, f"slice-{i:03d}.parquet")
        pq.write_table(out, p)
        os.utime(p, (base + i * 10, base + i * 10))
        paths.append(p)
    return paths


def run_dedup_stream(spark: SparkSession, src_dir: str, checkpoint_dir: str,
                     key_cols: tuple[str, ...] = ("event_id",),
                     watermark: str = "30 minutes",
                     files_per_trigger: int = 1) -> DataFrame:
    """Run the streaming dedup over a staged directory to completion
    (availableNow, append mode) and return the collected batch DataFrame."""
    import uuid

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    deduped = dedup_stream(stream, key_cols=key_cols, watermark=watermark)
    name = f"dedup_{uuid.uuid4().hex[:12]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    out = spark.table(name)
    out._dedup_batches = n_batches  # noqa: SLF001 (test introspection)
    return out
