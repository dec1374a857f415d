"""Multimodal plumbing (stubbed decode, real schema/batching) + table IO."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.multimodal import (
    decode_images,
    media_stats,
    sample_frames,
    synthesize_media,
)
from searchengine_spark.sources.tables import (
    delete_repo,
    load_docs,
    point_lookup,
    repo_scan,
    write_docs,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthesize_media(docs, kind="image").cache()


def test_decode_images_deterministic_features(spark, media):
    a = {r["media_id"]: r["features"] for r in decode_images(media).collect()}
    b = {r["media_id"]: r["features"] for r in decode_images(media.repartition(7)).collect()}
    assert a == b  # partitioning-independent (Arrow batch boundaries differ)
    one = next(iter(a.values()))
    assert len(one) == 3 + 64  # channel means + histogram
    assert abs(sum(one[3:]) - 1.0) < 1e-5  # histogram normalized


def test_decode_real_impl_is_stubbed(spark, media):
    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        decode_images(media.limit(1), impl="pil").collect()


def test_frame_sampling(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vids = synthesize_media(docs, kind="video")
    frames = sample_frames(vids, every_n=30)
    rows = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in vids.collect()}
    for r in rows:
        expect = (meta[r["media_id"]] - 1) // 30 + 1
        assert r["count"] == expect


def test_media_stats_and_binary_pruning(spark, media, tmp_path):
    stats = media_stats(media).collect()
    assert stats and stats[0]["n"] > 0
    # metadata-only projection over the STORED table must not read the
    # binary payload: the parquet scan's ReadSchema excludes it
    p = str(tmp_path / "media")
    media.write.parquet(p)
    stored = spark.read.parquet(p)
    plan = (
        stored.select("media_id", "meta.width")
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("payload" not in ln for ln in scan_lines)


def test_docs_io_roundtrip_and_partition_ops(spark, tmp_path, corpus_rows):
    from searchengine_spark.schema import DOCS_SCHEMA

    store = str(tmp_path / "store")
    docs = spark.createDataFrame(corpus_rows[:50], DOCS_SCHEMA)
    write_docs(docs, store, mode="overwrite")
    back = load_docs(spark, store)
    assert back.count() == 50

    one = corpus_rows[0]
    hit = point_lookup(back, one[0], one[1]).collect()
    assert len(hit) == 1 and hit[0]["content"] == one[4]

    repo = one[0]
    n_repo = repo_scan(back, repo).count()
    assert n_repo >= 1
    delete_repo(spark, store, repo)
    back2 = load_docs(spark, store)
    assert back2.filter(f"repo = '{repo}'").count() == 0
    assert back2.count() == 50 - n_repo


def test_iceberg_fallback(spark, tmp_path, corpus_rows):
    from searchengine_spark.schema import DOCS_SCHEMA

    p = str(tmp_path / "iceb")
    spark.createDataFrame(corpus_rows[:10], DOCS_SCHEMA).write.parquet(p)
    df = load_docs(spark, p, fmt="iceberg")  # falls back to parquet contract
    assert df.count() == 10


def test_audio_features_deterministic_fixed_dim(spark):
    from searchengine_spark.operators.multimodal import extract_audio_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    audio = synthesize_media(docs, kind="audio").cache()
    a = {r["media_id"]: r["features"]
         for r in extract_audio_features(audio).collect()}
    b = {r["media_id"]: r["features"]
         for r in extract_audio_features(audio.repartition(5)).collect()}
    assert a == b  # partitioning/batch-boundary independent
    dims = {len(v) for v in a.values()}
    assert dims == {4 + 32}  # rms/zcr mean+std, then 32 log-spectrum bands
    assert len(a) == audio.count()
    # features land as array<float> directly usable by operators/ann.py
    assert all(isinstance(v[0], float) for v in a.values())
    audio.unpersist()


def test_audio_real_impl_is_stubbed(spark):
    from searchengine_spark.operators.multimodal import extract_audio_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    audio = synthesize_media(docs.limit(1), kind="audio")
    with pytest.raises(Exception, match="audio library|NotImplemented"):
        extract_audio_features(audio, impl="librosa").collect()


def test_resize_images_roundtrip_contract(spark):
    from searchengine_spark.operators.multimodal import resize_images

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synthesize_media(docs.limit(20), kind="image").cache()
    out = {r["media_id"]: r for r in resize_images(media, target=(16, 12)).collect()}
    assert len(out) == 20
    # every thumbnail is exactly the target raw-RGB byte size and dims
    assert all(r["width"] == 16 and r["height"] == 12 for r in out.values())
    assert all(len(bytes(r["payload"])) == 16 * 12 * 3 for r in out.values())
    # deterministic + partitioning independent
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media.repartition(7), target=(16, 12)).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in out.items()}
    # resize output chains back into decode_images' input shape
    rechained = resize_images(media, target=(16, 12)).select(
        "media_id", "payload",
        F.struct("width", "height").alias("meta"))
    assert {f.name for f in rechained.schema} == {"media_id", "payload", "meta"}
    media.unpersist()


def test_resize_real_impl_is_stubbed(spark):
    from searchengine_spark.operators.multimodal import resize_images

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synthesize_media(docs.limit(1), kind="image")
    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        resize_images(media, impl="pil").collect()
