"""Streaming exact dedup (dropDuplicatesWithinWatermark): planted
redeliveries across micro-batch boundaries are dropped, state is bounded
by the watermark, and the output equals the batch distinct exactly."""

from __future__ import annotations


def test_stream_dedup_drops_cross_batch_redeliveries(spark, tmp_path):
    from searchengine_spark.streaming.dedup import (
        run_dedup_stream,
        stage_with_duplicates,
    )

    src = str(tmp_path / "src")
    stage_with_duplicates("/root/testdata/sf0.001/events.parquet", src,
                          n_slices=3, dup_fraction=0.3)
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    staged = spark.read.parquet(src)
    n_base, n_staged = base.count(), staged.count()
    assert n_staged > n_base  # the redeliveries really are in the input

    out = run_dedup_stream(spark, src, str(tmp_path / "ckpt"))
    assert out._dedup_batches >= 2  # genuinely multi-batch
    assert out.count() == n_base
    got = sorted(r["event_id"] for r in out.select("event_id").collect())
    want = sorted(r["event_id"] for r in base.select("event_id").collect())
    assert got == want
