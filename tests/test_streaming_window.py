"""Structured Streaming windowed aggregation with watermark: streaming
result == batch result (the §2.9 streaming-extension contract)."""

from __future__ import annotations


def test_streaming_hourly_window_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    import shutil

    # file-stream sources need a DIRECTORY; stage the single parquet file
    src_dir = str(tmp_path / "events_src")
    (tmp_path / "events_src").mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir)
    src = src_dir
    # watermarks need TIMESTAMP (not NTZ); session tz is UTC so the cast is
    # a consistent relabel on both the batch and streaming sides
    batch = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
        .collect()
    }

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )
    (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM hourly").collect()
    }
    assert got == want
    assert len(got) > 0
